"""Dynamic int8 post-training quantization for serving.

Int8 halves the HBM bytes per matmul operand — a serving lever the
reference never had (its inference runs fp32/fp16 torch,
gan-model/inference.py:261-274). The v5e datasheet also lists 2× MXU
int8 throughput, but **measured on this chip/stack it does not
materialize**: XLA lowers int8×int8→int32 matmul/conv at ≈ the bf16 rate
(156 vs 165 TFLOP/s matmul, 154 vs 223 conv), and a Pallas int8 kernel
ties its bf16 twin (119 vs 119) — see scripts/microbench_int8*.py and
BENCH_NOTES.md. So this is an opt-in capability for weight-memory /
HBM-bound regimes, not a compute-throughput claim.

This module quantizes MXU-bound ops *at apply time* with no checkpoint
changes and no calibration pass:

- **Weights**: per-output-channel symmetric int8 (no zero point). Scales
  come from the weights themselves; under ``jit`` the quantization of a
  constant params tree folds into the compiled program.
- **Activations**: dynamic per-tensor symmetric int8 — one ``max(|x|)``
  reduction per op, fused by XLA into the surrounding elementwise work.
  Symmetric quantization maps 0 → 0 exactly, so conv zero-padding stays
  exact in the integer domain.
- **Accumulation**: int32 (``preferred_element_type``), dequantized by the
  product of the two scales. Bias adds after dequant in float.

Integration is a Flax method interceptor (``quantized_apply``): every
``nn.Conv`` / ``nn.Dense`` call inside a wrapped ``model.apply`` routes
through the int8 path using the module's own bound params — the model
definition, param tree, and checkpoints are untouched. Models whose convs
feed GroupNorm (the GAN family here) are robust to this: per-channel scale
error is absorbed by the norm's own affine.

Use ``GanConfig.serve_int8`` / ``infer-lipsync --int8`` for the production
hook (pipelines/inference.py).
"""
from __future__ import annotations

import contextlib
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_channelwise(w: jax.Array, axis: int = -1) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-channel int8: returns (w_q int8, scale f32) where
    ``scale`` keeps ``axis`` and reduces every other dim. w ≈ w_q * scale."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def _dynamic_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-tensor symmetric int8 with a runtime max-abs scale."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return x_q, s


def int8_conv(
    x: jax.Array,
    kernel: jax.Array,           # (kh, kw, Cin, Cout) float
    bias,                        # (Cout,) float or None
    strides,
    padding,
    out_dtype=None,
) -> jax.Array:
    """NHWC conv with dynamically-quantized int8 operands and an int32 MXU
    accumulator; numerically ``conv(x, kernel) + bias`` to within the two
    quantization roundings."""
    out_dtype = out_dtype or x.dtype
    w_q, w_scale = quantize_channelwise(kernel, axis=-1)      # (1,1,1,Cout)
    x_q, x_scale = _dynamic_quantize(x)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * w_scale.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def int8_dense(x: jax.Array, kernel: jax.Array, bias, out_dtype=None) -> jax.Array:
    """``x @ kernel + bias`` with int8 operands / int32 accumulation;
    kernel scales per output feature."""
    out_dtype = out_dtype or x.dtype
    w_q, w_scale = quantize_channelwise(kernel, axis=-1)      # (1, out)
    x_q, x_scale = _dynamic_quantize(x)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * w_scale.reshape(
        (1,) * (x.ndim - 1) + (-1,)))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def _int8_interceptor(next_fun, args, kwargs, context):
    """Flax method interceptor: reroute bound nn.Conv / nn.Dense calls
    through the int8 ops. Anything else (norms, resize, Pallas attention)
    passes through untouched. Init passes through so param shapes/dtypes
    stay canonical."""
    mod = context.module
    if context.method_name != "__call__" or mod.is_initializing():
        return next_fun(*args, **kwargs)
    if type(mod) is nn.Conv:
        # grouped/dilated/masked convs, 1-D/3-D convs, and exotic padding
        # are not worth an int8 path here; keep the fast path narrow and
        # fall back to the float op otherwise (int8_conv is NHWC/HWIO-only).
        pad = mod.padding
        pad_ok = (pad in ("SAME", "VALID")) or (
            not isinstance(pad, (str, int))
            and all(isinstance(p, (tuple, list)) and len(p) == 2 for p in pad))
        params = mod.variables["params"]
        kernel = params["kernel"]
        strides = mod.strides
        if strides is None:
            strides = (1, 1)
        elif isinstance(strides, int):
            strides = (strides, strides)
        else:
            strides = tuple(int(s) for s in strides)
        if (kernel.ndim == 4                 # 2-D conv only
                and len(strides) == 2
                and getattr(mod, "feature_group_count", 1) == 1
                and not mod.mask
                and pad_ok
                and all(d == 1 for d in _tuple_or(mod.kernel_dilation, 1))
                and all(d == 1 for d in _tuple_or(mod.input_dilation, 1))):
            x = args[0]
            return int8_conv(
                x, kernel, params.get("bias"),
                strides, pad if isinstance(pad, str) else tuple(
                    (int(p[0]), int(p[1])) for p in pad),
                out_dtype=mod.dtype or x.dtype)
    if type(mod) is nn.Dense:
        params = mod.variables["params"]
        x = args[0]
        return int8_dense(x, params["kernel"], params.get("bias"),
                          out_dtype=mod.dtype or x.dtype)
    return next_fun(*args, **kwargs)


def _tuple_or(v, default):
    if v is None:
        return (default,)
    if isinstance(v, int):
        return (v,)
    return tuple(v)


@contextlib.contextmanager
def int8_serving():
    """Context manager: every ``model.apply`` inside routes its Conv/Dense
    matmuls through dynamic-int8 MXU ops.

    >>> with int8_serving():
    ...     out = gen.apply({"params": params}, mel, faces)
    """
    with nn.intercept_methods(_int8_interceptor):
        yield


def quantized_apply(model: nn.Module, variables, *args, **kwargs):
    """``model.apply`` with Conv/Dense routed through int8 (see
    ``int8_serving``)."""
    with int8_serving():
        return model.apply(variables, *args, **kwargs)
