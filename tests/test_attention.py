"""Flash-attention kernel vs XLA reference (kernel runs in Pallas interpret
mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.ops.attention import (
    attention_reference,
    flash_attention,
    mha,
)


def _qkv(rng, b=2, h=2, s=256, d=32, dtype=np.float32):
    q = rng.standard_normal((b, h, s, d)).astype(dtype)
    k = rng.standard_normal((b, h, s, d)).astype(dtype)
    v = rng.standard_normal((b, h, s, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_matches_reference(rng):
    q, k, v = _qkv(rng)
    got = flash_attention(q, k, v, interpret=True)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


def test_flash_causal(rng):
    q, k, v = _qkv(rng, s=192)
    got = flash_attention(q, k, v, causal=True, interpret=True)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


def test_flash_ragged_seq_len(rng):
    # sequence not a multiple of block size → padding + key masking path
    q, k, v = _qkv(rng, s=200)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


def test_flash_cross_attention(rng):
    q = jnp.asarray(rng.standard_normal((1, 4, 160, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 4, 320, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 4, 320, 32)).astype(np.float32))
    got = flash_attention(q, k, v, interpret=True)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


def test_flash_large_blocks(rng):
    # the big-tile configuration used for long sequences
    q, k, v = _qkv(rng, b=1, h=1, s=640, d=16)
    got = flash_attention(q, k, v, block_q=256, block_k=256, interpret=True)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


def test_flash_gradients_match(rng):
    q, k, v = _qkv(rng, b=1, h=1, s=160, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_small_seq_dispatches_to_reference(rng):
    # 80-token ViViT case: exact equality with reference (same code path)
    q, k, v = _qkv(rng, s=80)
    got = flash_attention(q, k, v)
    want = attention_reference(q, k, v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mha_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 80, 256)).astype(np.float32))
    out = mha(x, x, x, num_heads=8)
    assert out.shape == (2, 80, 256)


def test_flash_bf16(rng):
    q, k, v = _qkv(rng, s=256, dtype=np.float32)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    got = flash_attention(q, k, v, interpret=True)
    want = attention_reference(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want, dtype=np.float32), rtol=5e-2, atol=5e-2
    )


def test_blockwise_xla_matches_reference(rng):
    from lipreading_video_generation_tpu.ops.attention import _blockwise_attention_xla

    q, k, v = _qkv(rng, b=1, h=2, s=300, d=16)
    got = _blockwise_attention_xla(q, k, v, False, 1.0 / 4.0, block_k=128)
    want = attention_reference(q, k, v, sm_scale=1.0 / 4.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


def test_blockwise_xla_gradients_match(rng):
    from lipreading_video_generation_tpu.ops.attention import _blockwise_attention_xla

    q, k, v = _qkv(rng, b=1, h=1, s=256, d=16)
    g1 = jax.grad(lambda a, b_, c: jnp.sum(
        _blockwise_attention_xla(a, b_, c, False, 0.25, block_k=64) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda a, b_, c: jnp.sum(
        attention_reference(a, b_, c, sm_scale=0.25) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3)


def test_causal_cross_length_bottom_right_alignment(rng):
    """causal with s_q != s_k must bottom-right align (tril k = s_k − s_q)
    in ALL paths: Pallas kernel, blockwise-XLA recompute, and reference."""
    from lipreading_video_generation_tpu.ops.attention import _blockwise_attention_xla

    q = jnp.asarray(rng.standard_normal((1, 2, 160, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 320, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 320, 32)).astype(np.float32))
    want = attention_reference(q, k, v, causal=True)
    got_kernel = flash_attention(q, k, v, causal=True, block_q=64, block_k=64,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got_kernel), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
    got_blockwise = _blockwise_attention_xla(q, k, v, True, 32 ** -0.5, block_k=64)
    np.testing.assert_allclose(np.asarray(got_blockwise), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def _grad_pair(loss_a, loss_b, *args, rtol=2e-3, atol=2e-3):
    g1 = jax.grad(loss_a, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss_b, argnums=(0, 1, 2))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


def test_flash_gradients_causal(rng):
    q, k, v = _qkv(rng, b=1, h=2, s=192, d=16)
    _grad_pair(
        lambda a, b, c: jnp.sum(flash_attention(a, b, c, causal=True, interpret=True) ** 2),
        lambda a, b, c: jnp.sum(attention_reference(a, b, c, causal=True) ** 2),
        q, k, v,
    )


def test_flash_gradients_ragged_and_blocked(rng):
    # sequence not a multiple of the block → padded rows/cols must carry
    # ZERO gradient contributions in the Pallas backward
    q, k, v = _qkv(rng, b=1, h=1, s=200, d=16)
    _grad_pair(
        lambda a, b, c: jnp.sum(
            flash_attention(a, b, c, block_q=128, block_k=128, interpret=True) ** 2),
        lambda a, b, c: jnp.sum(attention_reference(a, b, c) ** 2),
        q, k, v,
    )


def test_flash_gradients_cross_length_causal(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 160, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 256, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 256, 16)).astype(np.float32))
    _grad_pair(
        lambda a, b, c: jnp.sum(
            flash_attention(a, b, c, causal=True, block_q=64, block_k=64,
                            interpret=True) ** 2),
        lambda a, b, c: jnp.sum(attention_reference(a, b, c, causal=True) ** 2),
        q, k, v,
    )


def test_flash_gradients_weighted_cotangent(rng):
    # non-uniform upstream gradient exercises the Δ = Σ dO·O term properly
    q, k, v = _qkv(rng, b=2, h=2, s=160, d=32)
    w = jnp.asarray(rng.standard_normal((2, 2, 160, 32)).astype(np.float32))
    _grad_pair(
        lambda a, b, c: jnp.sum(w * flash_attention(a, b, c, interpret=True)),
        lambda a, b, c: jnp.sum(w * attention_reference(a, b, c)),
        q, k, v,
    )


# ---------------------------------------------------------------------------
# fused small-MHA kernel (interpret mode; compiled Mosaic is gated on real
# hardware by scripts/check_tpu_kernels.py)
# ---------------------------------------------------------------------------

def _bse(rng, b, s, e, dtype=np.float32):
    q = jnp.asarray(rng.standard_normal((b, s, e)).astype(dtype))
    k = jnp.asarray(rng.standard_normal((b, s, e)).astype(dtype))
    v = jnp.asarray(rng.standard_normal((b, s, e)).astype(dtype))
    return q, k, v


@pytest.mark.parametrize("b,s,e,h,causal", [
    (3, 81, 256, 8, False),   # the ViViT shape
    (2, 81, 256, 8, True),
    (2, 33, 64, 4, False),    # odd length, fewer heads
    (1, 16, 32, 1, True),     # single head pads s to 128
])
def test_small_mha_matches_einsum(rng, b, s, e, h, causal):
    from lipreading_video_generation_tpu.ops import attention as att

    q, k, v = _bse(rng, b, s, e)
    assert att.small_mha_viable(h, s, s, e)
    got = att._small_mha(q, k, v, h, causal, True)
    want = att._mha_einsum(q, k, v, h, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_small_mha_bf16_matches_einsum(rng):
    from lipreading_video_generation_tpu.ops import attention as att

    q, k, v = _bse(rng, 2, 81, 256, dtype=np.float32)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    got = att._small_mha(q, k, v, 8, False, True)
    want = att._mha_einsum(q, k, v, 8, False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2)


def test_small_mha_gradients_match_einsum(rng):
    """The custom VJP's backward is the einsum path; check the composite
    (pallas fwd, einsum bwd) against einsum-everywhere grads."""
    from lipreading_video_generation_tpu.ops import attention as att

    q, k, v = _bse(rng, 2, 33, 64)
    cot = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(att._small_mha(q, k, v, 4, False, True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(att._mha_einsum(q, k, v, 4, False) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_mha_default_dispatch_is_einsum(rng, monkeypatch):
    """Round-4 policy: the fused small-MHA kernel regressed the end-to-end
    headline bench 1.7x at the flagship shape (VERDICT r3), so ``mha``
    must NOT route to it unless the caller opts in with
    ``use_fused_small=True``."""
    from lipreading_video_generation_tpu.ops import attention as att

    calls = {"fused": 0}
    real = att._small_mha

    def spy(*a, **k):
        calls["fused"] += 1
        return real(*a, **k)

    monkeypatch.setattr(att, "_small_mha", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    q, k, v = _bse(rng, 2, 81, 256)
    try:
        att.mha(q, k, v, num_heads=8)          # default: einsum, no kernel
    except Exception:
        pass  # pallas would fail on CPU with interpret=False; count is what matters
    assert calls["fused"] == 0
    try:
        # opt-in routes to the kernel (may fail to lower on CPU backend with
        # interpret=False — reaching the spy is what's being tested)
        att.mha(q, k, v, num_heads=8, use_fused_small=True)
    except Exception:
        pass
    assert calls["fused"] == 1


def test_small_mha_viability_gate():
    from lipreading_video_generation_tpu.ops import attention as att

    assert att.small_mha_viable(8, 81, 81, 256)
    assert not att.small_mha_viable(8, 81, 120, 256)   # cross-attention
    assert not att.small_mha_viable(8, 200, 200, 256)  # hs 1600 > VMEM cap
    assert not att.small_mha_viable(3, 81, 81, 256)    # e % h != 0
    # padded per-head length keeps h*s_pad a lane multiple
    assert (8 * att._small_mha_pad(8, 81)) % 128 == 0
    assert (4 * att._small_mha_pad(4, 33)) % 128 == 0
    assert (1 * att._small_mha_pad(1, 16)) % 128 == 0
