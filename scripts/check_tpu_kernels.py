"""On-device (real TPU) numerics check for the Pallas flash-attention
kernels — forward AND backward vs the dense XLA reference (VERDICT r1 #10:
the CPU suite runs interpret mode only; this validates the compiled
Mosaic kernels on hardware).

Values are fetched to host (the axon relay fakes block_until_ready, so
comparisons — not timers — are the completion signal).

Usage: python scripts/check_tpu_kernels.py
Prints one PASS/FAIL line per case and exits nonzero on failure.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp

# TPU matmuls default to bf16 passes for f32 inputs; pin full precision so
# the comparison measures kernel correctness, not reference truncation.
jax.config.update("jax_default_matmul_precision", "highest")

from lipreading_video_generation_tpu.ops.attention import (
    attention_reference,
    flash_attention,
)


def check(name, got, want, rtol, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.max(np.abs(got - want) / (atol + rtol * np.abs(want)))
    ok = bool(err <= 1.0)
    print(f"{'PASS' if ok else 'FAIL'} {name}: max rel err unit {err:.3f}")
    return ok


def main() -> int:
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()}, not tpu")
        return 0
    rng = np.random.default_rng(0)
    ok = True

    for name, (b, h, s, d), causal, dtype in [
        ("fwd f32 s=512", (2, 4, 512, 64), False, jnp.float32),
        ("fwd f32 causal s=384", (1, 4, 384, 64), True, jnp.float32),
        ("fwd bf16 s=1024", (1, 8, 1024, 64), False, jnp.bfloat16),
        ("fwd f32 ragged s=300", (1, 2, 300, 48), False, jnp.float32),
    ]:
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
        got = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, causal=causal,
                                                       interpret=False))(q, k, v)
        want = attention_reference(q, k, v, causal=causal)
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-3
        ok &= check(name, got, want, tol, tol)

    # round-4 production boundary: the diffusion ds=1 shape routes to
    # block_q=block_k=1024 tiles with d_pad=64 (no lane padding) — both
    # new paths must compile AND match on hardware UNDER JIT. The dense
    # reference at 16384² would materialize a 1 GB score matrix, so the
    # oracle is the checkpointed blockwise-XLA implementation.
    from lipreading_video_generation_tpu.ops.attention import (
        _blockwise_attention_xla,
    )

    for name, (b, h, s, d), dtype in [
        ("fwd bf16 s=16384 d=64 (block1024/dpad64)", (1, 1, 16384, 64), jnp.bfloat16),
        ("fwd f32 s=8192 d=64 (block1024/dpad64)", (1, 1, 8192, 64), jnp.float32),
    ]:
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
        got = jax.jit(lambda a, b_, c: flash_attention(a, b_, c,
                                                       interpret=False))(q, k, v)
        want = _blockwise_attention_xla(q, k, v, False, d ** -0.5)
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-3
        ok &= check(name, got, want, tol, tol)

    # backward: compiled Pallas dq/dk/dv vs dense-reference autodiff
    for name, (b, h, s, d), causal in [
        ("bwd f32 s=512", (1, 4, 512, 64), False),
        ("bwd f32 causal s=384", (1, 2, 384, 64), True),
        ("bwd f32 ragged s=300", (1, 2, 300, 48), False),
    ]:
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

        g1 = jax.jit(jax.grad(
            lambda a, b_, c: jnp.sum(w * flash_attention(a, b_, c, causal=causal,
                                                         interpret=False)),
            argnums=(0, 1, 2)))(q, k, v)
        g2 = jax.jit(jax.grad(
            lambda a, b_, c: jnp.sum(w * attention_reference(a, b_, c, causal=causal)),
            argnums=(0, 1, 2)))(q, k, v)
        for gi, (a_, b_) in zip("qkv", zip(g1, g2)):
            ok &= check(f"{name} d{gi}", a_, b_, 2e-3, 2e-3)

    # backward at the round-4 tile config (1024-token blocks, d_pad=64):
    # memory-bounded oracle = autodiff through the checkpointed blockwise
    # XLA scan (identical math, no 16k² score matrix)
    q = jnp.asarray(rng.standard_normal((1, 1, 4096, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 4096, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, 4096, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 1, 4096, 64)), jnp.float32)
    g1 = jax.jit(jax.grad(
        lambda a, b_, c: jnp.sum(w * flash_attention(
            a, b_, c, block_q=1024, block_k=1024, interpret=False)),
        argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(
        lambda a, b_, c: jnp.sum(w * _blockwise_attention_xla(
            a, b_, c, False, 64 ** -0.5)),
        argnums=(0, 1, 2)))(q, k, v)
    for gi, (a_, b_) in zip("qkv", zip(g1, g2)):
        ok &= check(f"bwd f32 s=4096 block1024/dpad64 d{gi}", a_, b_, 2e-3, 2e-3)

    # CLAHE: the compiled Mosaic kernel vs the XLA blended-LUT reference.
    # Interpret mode can't catch lowering-legality bugs (a float iota once
    # verified on CPU but failed tpu.iota's integer-only constraint here).
    from lipreading_video_generation_tpu.ops.clahe_pallas import clahe_pallas
    from lipreading_video_generation_tpu.ops.image import clahe_xla

    # 48x48 is the bench shape; 112x112 is exactly _MAX_PIXELS — the
    # routing boundary clahe_supported admits must compile on hardware,
    # and it must compile UNDER JIT (the production context): 128x128
    # once passed standalone-eager but OOM'd scoped VMEM when jit fused
    # the operand constants into the kernel's scoped allocation
    for hw in (48, 112):
        img = jnp.asarray(rng.integers(0, 256, (4, hw, hw)), jnp.uint8)
        got = np.asarray(jax.jit(
            lambda x: clahe_pallas(x, interpret=False))(img)).astype(np.int32)
        want = np.asarray(clahe_xla(img)).astype(np.int32)
        diff = int(np.abs(got - want).max())
        clahe_ok = diff <= 2  # rounding-path differences only
        print(f"{'PASS' if clahe_ok else 'FAIL'} clahe pallas-vs-xla @{hw}²: "
              f"max abs diff {diff} gray levels")
        ok &= clahe_ok

    # fused small-MHA: compiled Mosaic (block-diag heads, grid=(batch,))
    # vs the einsum path — under jit, the production context
    from lipreading_video_generation_tpu.ops import attention as att

    for name, (b, s, e, h), causal, dtype in [
        ("small-mha vivit s=81 h=8", (8, 81, 256, 8), False, jnp.float32),
        ("small-mha bf16 s=81 h=8", (8, 81, 256, 8), False, jnp.bfloat16),
        ("small-mha causal s=33 h=4", (4, 33, 64, 4), True, jnp.float32),
        ("small-mha h=1 s=16", (2, 16, 32, 1), False, jnp.float32),
    ]:
        q = jnp.asarray(rng.standard_normal((b, s, e)), dtype)
        k = jnp.asarray(rng.standard_normal((b, s, e)), dtype)
        v = jnp.asarray(rng.standard_normal((b, s, e)), dtype)
        got = jax.jit(lambda a, b_, c: att._small_mha(a, b_, c, h, causal,
                                                      False))(q, k, v)
        want = att._mha_einsum(q, k, v, h, causal)
        tol = 3e-2 if dtype == jnp.bfloat16 else 2e-3
        ok &= check(name, got, want, tol, tol)

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
