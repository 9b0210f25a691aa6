"""Int8 post-training quantization for serving (dynamic + static modes).

Int8 halves the HBM bytes per matmul operand, and (round-4 correction —
see BENCH_NOTES.md "Int8 on the MXU") the v5e's 2× int8 MXU mode IS real
through plain XLA: ~1.9× bf16 on both matmul and conv
(scripts/microbench_int8_v2.py; the round-3 "int8 ties bf16" was a
measurement artifact). What ate the kernel win end-to-end was the
dynamic-quantization overhead: a per-call ``max(|x|)`` reduction and the
int8↔float casts around every op. Hence two modes:

- **dynamic** (round 3): no calibration pass, activation scale computed
  per call. Robust, zero setup; pays the reduction every op.
- **static** (round 4): a one-time calibration pass records each
  Conv/Dense's max-|activation| over sample batches
  (``calibrate_activation_scales``); serving then uses those fixed
  scales, dropping the runtime reductions entirely. Scales are keyed by
  Flax module path and ride along as a plain dict.

Shared mechanics:

- **Weights**: per-output-channel symmetric int8 (no zero point). Scales
  come from the weights themselves; under ``jit`` the quantization of a
  constant params tree folds into the compiled program.
- **Activations**: per-tensor symmetric int8 (dynamic max or calibrated
  static scale). Symmetric quantization maps 0 → 0 exactly, so conv
  zero-padding stays exact in the integer domain.
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


def _quantize_with_scale(x: jax.Array, s) -> Tuple[jax.Array, jax.Array]:
    """Per-tensor symmetric int8 with a FIXED (calibrated) scale."""
    s = jnp.asarray(s, jnp.float32)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return x_q, s


def int8_conv(
    x: jax.Array,
    kernel: jax.Array,           # (kh, kw, Cin, Cout) float
    bias,                        # (Cout,) float or None
    strides,
    padding,
    out_dtype=None,
    act_scale=None,              # calibrated static scale; None = dynamic
) -> jax.Array:
    """NHWC conv with int8 operands and an int32 MXU accumulator;
    numerically ``conv(x, kernel) + bias`` to within the two quantization
    roundings (plus clipping to the calibrated range in static mode)."""
    out_dtype = out_dtype or x.dtype
    w_q, w_scale = quantize_channelwise(kernel, axis=-1)      # (1,1,1,Cout)
    x_q, x_scale = (_quantize_with_scale(x, act_scale) if act_scale is not None
                    else _dynamic_quantize(x))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * w_scale.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def int8_dense(x: jax.Array, kernel: jax.Array, bias, out_dtype=None,
               act_scale=None) -> jax.Array:
    """``x @ kernel + bias`` with int8 operands / int32 accumulation;
    kernel scales per output feature."""
    out_dtype = out_dtype or x.dtype
    w_q, w_scale = quantize_channelwise(kernel, axis=-1)      # (1, out)
    x_q, x_scale = (_quantize_with_scale(x, act_scale) if act_scale is not None
                    else _dynamic_quantize(x))
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * w_scale.reshape(
        (1,) * (x.ndim - 1) + (-1,)))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def _module_key(mod) -> str:
    return "/".join(str(p) for p in mod.path)


def _make_int8_interceptor(act_scales=None):
    def interceptor(next_fun, args, kwargs, context):
        return _int8_interceptor(next_fun, args, kwargs, context,
                                 act_scales=act_scales)
    return interceptor


def _int8_interceptor(next_fun, args, kwargs, context, act_scales=None):
    """Flax method interceptor: reroute bound nn.Conv / nn.Dense calls
    through the int8 ops. Anything else (norms, resize, Pallas attention)
    passes through untouched. Init passes through so param shapes/dtypes
    stay canonical. ``act_scales`` (module path → float) switches a module
    to the static calibrated scale; paths absent from the dict stay
    dynamic."""
    mod = context.module
    if context.method_name != "__call__" or mod.is_initializing():
        return next_fun(*args, **kwargs)
    act_scale = None if act_scales is None else act_scales.get(_module_key(mod))
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
                out_dtype=mod.dtype or x.dtype, act_scale=act_scale)
    if type(mod) is nn.Dense:
        params = mod.variables["params"]
        x = args[0]
        return int8_dense(x, params["kernel"], params.get("bias"),
                          out_dtype=mod.dtype or x.dtype, act_scale=act_scale)
    return next_fun(*args, **kwargs)


def _tuple_or(v, default):
    if v is None:
        return (default,)
    if isinstance(v, int):
        return (v,)
    return tuple(v)


@contextlib.contextmanager
def int8_serving(act_scales=None):
    """Context manager: every ``model.apply`` inside routes its Conv/Dense
    matmuls through int8 MXU ops — dynamic activation scales by default,
    calibrated static scales where ``act_scales`` (module path → float,
    from ``calibrate_activation_scales``) provides one.

    >>> with int8_serving():
    ...     out = gen.apply({"params": params}, mel, faces)
    """
    with nn.intercept_methods(_make_int8_interceptor(act_scales)):
        yield


def quantized_apply(model: nn.Module, variables, *args,
                    act_scales=None, **kwargs):
    """``model.apply`` with Conv/Dense routed through int8 (see
    ``int8_serving``)."""
    with int8_serving(act_scales):
        return model.apply(variables, *args, **kwargs)


def calibrate_activation_scales(apply_fn, batches) -> dict:
    """One-time static calibration: run ``apply_fn(*batch)`` eagerly over
    ``batches`` while recording each Conv/Dense input's max-|x|; returns
    {module path: scale} for ``int8_serving(act_scales=...)``.

    Runs OUTSIDE jit so the recorded maxima are concrete; a few batches
    suffice (per-tensor symmetric scales saturate quickly). Serving then
    pays zero runtime reductions — the round-4 lever that lets the ~1.9×
    int8 MXU rate (microbench_int8_v2) reach end-to-end programs."""
    import numpy as np

    amax: dict = {}

    def recorder(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name == "__call__" and not mod.is_initializing()
                and type(mod) in (nn.Conv, nn.Dense)):
            key = _module_key(mod)
            m = float(np.max(np.abs(np.asarray(args[0], np.float32))))
            amax[key] = max(amax.get(key, 0.0), m)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(recorder):
        for batch in batches:
            apply_fn(*batch)
    return {k: max(v, 1e-8) / 127.0 for k, v in amax.items()}
