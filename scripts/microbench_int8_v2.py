"""Round-4 REDO of the int8-vs-bf16 MXU microbench with true chaining.

The round-3 harness (microbench_int8.py) repeated `fn(*args)` inside a
fori_loop whose carry only consumed the output — the operand never
depended on the carry, so XLA hoisted the single matmul out of the loop
and both dtypes measured fixed dispatch overhead. That invalidates the
round-3 conclusion ("int8 ties bf16"). Here every iteration's operand is
perturbed by the previous iteration's result, forcing K real executions.

Run: python scripts/microbench_int8_v2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

K1, K2 = 8, 40


def timed(name, fn, a, b, perturb, flops):
    """(t_K2 - t_K1)/(K2 - K1): differencing cancels dispatch/RTT;
    `perturb(a, carry)` must make iteration i+1's operand depend on
    iteration i's output."""
    def make(K):
        @jax.jit
        def rep(karg, a, b):
            def body(i, carry):
                out = fn(perturb(a, carry), b)
                # consume EVERY output element (a single-element read lets
                # XLA DCE the rest of the matmul into one dot product)
                s = jnp.sum(out.astype(jnp.float32))
                return (jnp.isfinite(s) & (s != 1.2345)).astype(jnp.int32)
            return jax.lax.fori_loop(0, K, body, karg)
        return rep

    r1, r2 = make(K1), make(K2)
    _ = int(r1(jnp.int32(0), a, b)); _ = int(r2(jnp.int32(0), a, b))
    ts = []
    for rep in (r1, r2):
        best = 1e9
        for it in range(3):
            t0 = time.perf_counter()
            _ = int(rep(jnp.int32(it + 1), a, b))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    dt = (ts[1] - ts[0]) / (K2 - K1)
    print(f"{name}: {dt * 1e3:.3f} ms/op  {flops / dt / 1e12:.1f} T(FL)OP/s",
          flush=True)
    return dt


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
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32),
        a16, b16,
        perturb=lambda a, c: a + (c % 2).astype(jnp.bfloat16),
        flops=fl)
    t_int8 = timed(
        "matmul int8->int32 4096^3",
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32),
        a8, b8,
        perturb=lambda a, c: a ^ (c % 2).astype(jnp.int8),
        flops=fl)
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
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32),
        x16, w16,
        perturb=lambda x, c: x + (c % 2).astype(jnp.bfloat16),
        flops=flc)
    tc8 = timed(
        "conv3x3 int8->int32 b256 48x48x128",
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32),
        x8, w8,
        perturb=lambda x, c: x ^ (c % 2).astype(jnp.int8),
        flops=flc)
    print(f"conv int8 speedup over bf16: {tc16 / tc8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
