"""DEPRECATED (round 4): this harness is INVALID — the fori_loop body's
operand never depends on the carry, so XLA hoists the single matmul out
of the loop and every dtype measures fixed dispatch cost. Its round-3
conclusion ("int8 ties bf16") was an artifact. Use
scripts/microbench_int8_v2.py (output-chained, full-output-consuming,
two-K differencing): int8 is ~1.9x bf16 on this chip through plain XLA.
Kept for the record.

Original question: is int8 actually ~2x bf16 on this chip's MXU through XLA?

The v5e MXU has double int8 throughput (394 int8 TOPS vs 197 bf16). This
microbench answers whether XLA:TPU lowers jnp.int8 matmul and
conv_general_dilated (with preferred_element_type=int32) onto that path —
the go/no-go gate for the serving quantization work (ops/quant.py).

Relay-proof timing: K in-jit chained repetitions + one host fetch.
Run: python scripts/microbench_int8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache_tpu"),
    min_compile_secs=1.0,
)

K = 30


def timed(name, fn, *args, flops=None):
    @jax.jit
    def rep(*args):
        def body(i, carry):
            acc = fn(*args)
            # data dependency across iterations via a scalar fold
            return carry + jnp.sum(acc[:1, :1].astype(jnp.float32))

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    _ = float(rep(*args))  # compile + warm
    t0 = time.perf_counter()
    _ = float(rep(*args))
    dt = (time.perf_counter() - t0) / K
    tflops = (flops / dt / 1e12) if flops else float("nan")
    print(f"{name}: {dt * 1e3:.3f} ms/op  {tflops:.1f} TFLOP/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # --- matmul 4096^3 ---
    m = n = k = 4096
    fl = 2 * m * n * k
    a16 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

    timed("matmul bf16 4096^3", lambda a, b: jnp.dot(a, b), a16, b16, flops=fl)
    timed(
        "matmul int8 4096^3",
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ),
        a8,
        b8,
        flops=fl,
    )

    # --- conv 3x3, generator-like shape: b256 48x48x128 -> 128 ---
    B, H, W, C = 256, 48, 48, 128
    fl = 2 * B * H * W * C * C * 9
    x16 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)

    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv16(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn)

    def conv8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    timed("conv3x3 bf16 b256 48x48x128", conv16, x16, w16, flops=fl)
    timed("conv3x3 int8 b256 48x48x128", conv8, x8, w8, flops=fl)

    # --- end-to-end dynamic-quant matmul (quantize acts on the fly) ---
    def dq_matmul(a_f, b_q, b_scale):
        s = jnp.max(jnp.abs(a_f)) / 127.0
        a_q = jnp.clip(jnp.round(a_f / s), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            a_q, b_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (s * b_scale)

    bscale = jnp.float32(0.01)
    af = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    timed("matmul dyn-int8 (quant+dequant fused) 4096^3",
          lambda a, b, s: dq_matmul(a, b, s), af, b8, bscale,
          flops=2 * m * n * k)


if __name__ == "__main__":
    main()
