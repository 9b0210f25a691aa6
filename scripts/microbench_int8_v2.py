"""Round-4 REDO of the int8-vs-bf16 MXU microbench with true chaining.

The round-3 harness (microbench_int8.py) repeated `fn(*args)` inside a
fori_loop whose carry only consumed the output — the operand never
depended on the carry, so XLA hoisted the single matmul out of the loop
and both dtypes measured fixed dispatch overhead. That invalidates the
round-3 conclusion ("int8 ties bf16"). This version uses the canonical
chained/two-K harness (scripts/bench_harness.py).

Measured round 4 (v5e): matmul 4096³ bf16 204.9 TFLOP/s vs int8 391.5
TOP/s (1.91×); conv3×3 b256 48²×128 1.95× — the datasheet 2× int8 MXU
mode IS real through plain XLA.

Run: python scripts/microbench_int8_v2.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from bench_harness import timed_chained

K1, K2 = 8, 40


def timed(name, fn, a, b, flops):
    dt_ms = timed_chained(name, fn, a, b, k1=K1, k2=K2, verbose=False)
    print(f"{name}: {dt_ms:.3f} ms/op  {flops / (dt_ms / 1e3) / 1e12:.1f} "
          f"T(FL)OP/s", flush=True)
    return dt_ms


def _f(carry, dtype):
    return (carry.astype(jnp.int32) % 2).astype(dtype)


def main():
    rng = np.random.default_rng(0)
    m = n = k = 4096
    fl = 2 * m * n * k
    a16 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

    t_bf16 = timed(
        "matmul bf16 4096^3",
        lambda a, b, c: jax.lax.dot_general(
            a + _f(c, jnp.bfloat16), b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32),
        a16, b16, fl)
    t_int8 = timed(
        "matmul int8->int32 4096^3",
        lambda a, b, c: jax.lax.dot_general(
            a ^ _f(c, jnp.int8), b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32),
        a8, b8, fl)
    print(f"int8 speedup over bf16: {t_bf16 / t_int8:.2f}x", flush=True)

    # conv, generator-like shape
    B, H, W, C = 256, 48, 48, 128
    flc = 2 * B * H * W * C * C * 9
    x16 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)

    tc16 = timed(
        "conv3x3 bf16 b256 48x48x128",
        lambda x, w, c: jax.lax.conv_general_dilated(
            x + _f(c, jnp.bfloat16), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32),
        x16, w16, flc)
    tc8 = timed(
        "conv3x3 int8->int32 b256 48x48x128",
        lambda x, w, c: jax.lax.conv_general_dilated(
            x ^ _f(c, jnp.int8), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32),
        x8, w8, flc)
    print(f"conv int8 speedup over bf16: {tc16 / tc8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
