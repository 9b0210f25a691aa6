"""Canonical relay-proof kernel-timing harness (round 4).

Three rules, each learned from a harness that silently lied (see
BENCH_NOTES.md "Int8 on the MXU" and VERDICT r3):

1. CHAIN THROUGH THE OUTPUT. `x + i*0` inside a fori_loop is constant-
   folded, the op becomes loop-invariant, and XLA hoists it — K
   "repetitions" execute once. Every iteration's operand must depend on
   the previous iteration's result: ``fn`` receives a carry scalar that
   it MUST fold into its operand (e.g. ``q + carry.astype(q.dtype)``, or
   ``a ^ (carry.astype(jnp.int32) % 2).astype(jnp.int8)`` for ints).
2. CONSUME THE FULL OUTPUT. Reading one element lets XLA dead-code-
   eliminate the rest of a matmul into a single dot product. The harness
   reduces over the whole output (max-abs) to form the next carry.
3. DIFFERENCE TWO K VALUES. A single timing carries the ~20 ms relay
   dispatch/fetch cost; (t_K2 − t_K1)/(K2 − K1) cancels it.

Usage:
    from bench_harness import timed_chained
    dt_ms = timed_chained("name", lambda q, carry: op(q + carry.astype(q.dtype)), q)
"""
import time

import jax
import jax.numpy as jnp

K1, K2 = 4, 24


def timed_chained(name, fn, *args, k1=K1, k2=K2, tries=3, verbose=True):
    """Time ``fn(*args, carry)`` (carry: f32 scalar the fn must fold into
    its operand). Returns the per-op time in milliseconds."""
    def make(K):
        @jax.jit
        def rep(karg, *args):
            def body(i, carry):
                out = fn(*args, carry)
                return carry * 0.5 + jnp.max(
                    jnp.abs(out.astype(jnp.float32))) * 1e-9
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0) + karg * 0.0)
        return rep

    r1, r2 = make(k1), make(k2)
    _ = float(r1(jnp.int32(0), *args))
    _ = float(r2(jnp.int32(0), *args))
    ts = []
    for rep in (r1, r2):
        best = 1e9
        for it in range(tries):
            t0 = time.perf_counter()
            _ = float(rep(jnp.int32(it + 1), *args))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    dt = (ts[1] - ts[0]) / (k2 - k1) * 1000
    if verbose:
        print(f"{name}: {dt:.3f} ms  (t{k1}={ts[0]*1e3:.1f} "
              f"t{k2}={ts[1]*1e3:.1f})", flush=True)
    return dt
