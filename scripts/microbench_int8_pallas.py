"""Can Pallas/Mosaic hit the v5e MXU's 2x int8 mode?

ROUND-4 CONTEXT: the premise from round 3 ("XLA lowers int8 at ~bf16
rate") was a harness artifact — scripts/microbench_int8_v2.py shows XLA
int8 matmul/conv at ~1.9x bf16. THIS script's chaining is sound (the
operand folds in the previous output), but its single-K timing carries
the ~20 ms relay dispatch cost divided by K on every row, compressing
dtype ratios toward 1; treat its absolute numbers as upper bounds on
latency, and use microbench_int8_v2's two-K differencing for ratios.

Run: python scripts/microbench_int8_pallas.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from lipreading_video_generation_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache_tpu"),
    min_compile_secs=1.0,
)

K = 20
M = N = Kdim = 4096
BM = BN = 512


BK = 512


def mm_kernel(a_ref, b_ref, o_ref, acc_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)


def make_mm(dtype, acc_dtype):
    return pl.pallas_call(
        functools.partial(mm_kernel, acc_dtype=acc_dtype),
        grid=(M // BM, N // BN, Kdim // BK),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
    )


def timed(name, fn, a, b, fold):
    """Chained: each iteration's input folds in the previous output."""

    @jax.jit
    def rep(a, b):
        def body(i, carry):
            a_cur, s = carry
            out = fn(a_cur, b)
            s2 = out[0, 0]
            return fold(a_cur, s2), s + s2.astype(jnp.float32)

        _, s = jax.lax.fori_loop(0, K, body, (a, jnp.float32(0.0)))
        return s

    _ = float(rep(a, b))
    t0 = time.perf_counter()
    _ = float(rep(a, b))
    dt = (time.perf_counter() - t0) / K
    fl = 2 * M * N * Kdim
    print(f"{name}: {dt * 1e3:.3f} ms/op  {fl / dt / 1e12:.1f} TFLOP/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    a16 = jnp.asarray(rng.standard_normal((M, Kdim)) * 0.1, jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((Kdim, N)) * 0.1, jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-4, 5, (M, Kdim)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-4, 5, (Kdim, N)), jnp.int8)

    mm16 = make_mm(jnp.bfloat16, jnp.float32)
    mm8 = make_mm(jnp.int8, jnp.int32)

    # correctness spot check (tiny slice vs XLA)
    want = (a16.astype(jnp.float32) @ b16.astype(jnp.float32))[:4, :4]
    got = mm16(a16, b16)[:4, :4]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=1.0)
    want8 = jax.lax.dot_general(
        a8, b8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )[:4, :4]
    np.testing.assert_array_equal(np.asarray(mm8(a8, b8)[:4, :4]),
                                  np.asarray(want8))

    timed("pallas matmul bf16 4096^3", mm16, a16, b16,
          lambda a, s: a + s.astype(a.dtype) * jnp.bfloat16(1e-6))
    timed("pallas matmul int8 4096^3", mm8, a8, b8,
          lambda a, s: jnp.bitwise_xor(a, (s % 2).astype(jnp.int8)))

    # XLA baselines under the SAME chained harness
    timed("xla matmul bf16 4096^3",
          lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
          a16, b16, lambda a, s: a + s.astype(a.dtype) * jnp.bfloat16(1e-6))
    timed("xla matmul int8 4096^3",
          lambda a, b: jax.lax.dot_general(
              a, b, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.int32),
          a8, b8, lambda a, s: jnp.bitwise_xor(a, (s % 2).astype(jnp.int8)))


if __name__ == "__main__":
    main()
