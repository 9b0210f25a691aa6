"""Flash attention as a Pallas TPU kernel.

The shared attention primitive for the ViViT lipreader (SURVEY.md §7.5) and
the diffusion U-Net's AttentionBlocks (reference:
video-generation/diffusion/unet.py:271-406, which materializes the full
(S, S) score matrix per head — QKVAttention). Here scores never hit HBM:
the kernel streams K/V blocks through VMEM with an online-softmax
accumulator, so memory is O(S·D) instead of O(S²) and the matmuls stay on
the MXU in fp32 accumulation.

Block-wise softmax also makes a future ring/sequence-parallel extension a
mesh-axis change rather than a rewrite (SURVEY.md §5 long-context note).

Gradients: ``flash_attention`` carries a custom VJP with Pallas
FlashAttention-2-style backward kernels — the forward saves the per-row
logsumexp, a cheap XLA pass forms Δ = Σ dO·O, then a dK/dV kernel
(sequential over q blocks) and a dQ kernel (sequential over kv blocks)
recompute probabilities blockwise so scores never hit HBM in the backward
either. ``_blockwise_attention_xla`` remains as a pure-XLA oracle for
gradient-parity tests.

On non-TPU backends the same kernel runs in Pallas interpret mode (used by
the CPU test suite); numerics match the XLA reference implementation.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["attention_reference", "flash_attention", "mha"]

_NEG_INF = float(np.finfo(np.float32).min) / 2


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Plain-XLA softmax attention. q,k,v: (B, H, S, D). The numerics oracle
    for the Pallas kernel and the fallback for tiny sequences."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    if causal:
        s_q, s_k = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((s_q, s_k), dtype=bool), k=s_k - s_q)
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------

def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, sm_scale, block_q, block_k, q_len, kv_len, causal,
):
    """Grid (batch·head, q-blocks, kv-blocks); the kv axis is sequential,
    with the online-softmax state carried in VMEM scratch across kv steps.
    Only one (block_q, D) Q tile and one (block_k, D) K/V tile live in VMEM
    at a time, so sequence length is bounded by HBM, not VMEM."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * sm_scale            # (block_q, D)
    kblk = k_ref[0].astype(jnp.float32)                    # (block_k, D)
    vblk = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # (block_q, block_k)
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
    mask = k_pos < kv_len
    if causal:
        # bottom-right alignment for s_q != s_k, matching
        # attention_reference's tril(k = s_k − s_q)
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
        mask = mask & (k_pos <= q_pos + (kv_len - q_len))
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)
        # per-row logsumexp, saved for the Pallas backward
        lse_ref[0] = m_ref[:] + jnp.log(jnp.maximum(l_ref[:], 1e-30))


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _head_dim_pad(d: int) -> int:
    """Lane padding for the head dim: 64 stays 64 — padding d=64 to 128
    doubles the QK^T and P·V MXU work for zeros (measured on-chip r4:
    1.03 → 0.906 ms at the diffusion ds=1 shape S=16384; the U-Net's
    single-head d=64 attention is the repo's FLOP-heaviest op). Mosaic
    handles 64-lane tiles natively; anything >64 rounds to a 128
    multiple."""
    return 64 if d <= 64 else ((d + 127) // 128) * 128


def _flash_forward(
    q, k, v, causal, sm_scale, block_q, block_k, interpret
):
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    out_dtype = q.dtype

    block_q = min(block_q, max(8, 1 << (s_q - 1).bit_length()))
    block_k = min(block_k, max(8, 1 << (s_k - 1).bit_length()))

    # MXU-friendly padding: lanes (last dim) to 64/128 multiples, sequence
    # to block size
    d_pad = _head_dim_pad(d)
    qp = _pad_to(_pad_to(q, 3, d_pad), 2, block_q).reshape(b * h, -1, d_pad)
    kp = _pad_to(_pad_to(k, 3, d_pad), 2, block_k).reshape(b * h, -1, d_pad)
    vp = _pad_to(_pad_to(v, 3, d_pad), 2, block_k).reshape(b * h, -1, d_pad)
    sq_pad = qp.shape[1]
    sk_pad = kp.shape[1]

    grid = (b * h, sq_pad // block_q, sk_pad // block_k)
    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        q_len=s_q,
        kv_len=s_k,
        causal=causal,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi, ki: (bh, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), out_dtype),
            jax.ShapeDtypeStruct((b * h, sq_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        # logical dims encoded for utils/flops.py's jaxpr-walk FLOP counter
        # (the operand avals only show the padded shapes)
        name=f"flash_fwd_sq{s_q}_sk{s_k}_d{d}",
    )(qp, kp, vp)
    return out.reshape(b, h, sq_pad, d_pad)[:, :, :s_q, :d], lse.reshape(b, h, sq_pad)


# ---------------------------------------------------------------------------
# custom VJP: Pallas forward AND Pallas backward (FlashAttention-2 style
# dq/dk/dv kernels over the saved per-row logsumexp)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, causal, sm_scale, block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, causal, sm_scale, block_q, block_k, interpret)
    return out


def _flash_fwd(q, k, v, causal, sm_scale, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, causal, sm_scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, sm_scale, block_q, block_k, q_len, kv_len, causal,
):
    """Grid (batch·head, kv-blocks, q-blocks): the q axis is sequential,
    accumulating this kv-block's dK/dV in VMEM scratch (FlashAttention-2
    backward, dK/dV pass)."""
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    # causal: skip fully-masked (q, k) block pairs
    off = kv_len - q_len
    live = (not causal) or (ki * block_k <= qi * block_q + block_q - 1 + off)

    @pl.when(live)
    def _accumulate():
        q = q_ref[0].astype(jnp.float32)
        kblk = k_ref[0].astype(jnp.float32)
        vblk = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0].astype(jnp.float32)        # (block_q, 1)
        delta = delta_ref[0].astype(jnp.float32)    # (block_q, 1)

        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale                                 # (block_q, block_k)
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        mask = (k_pos < kv_len) & (q_pos < q_len)
        if causal:
            mask = mask & (k_pos <= q_pos + off)
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp(s - lse)                         # exact fwd probabilities
        dv_acc[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                            # pᵀ·dO (block_k, D)
        dp = jax.lax.dot_general(
            do, vblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                            # dO·Vᵀ (block_q, block_k)
        ds = p * (dp - delta) * sm_scale
        dk_acc[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                            # dsᵀ·Q (block_k, D)

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    dq_acc, *, sm_scale, block_q, block_k, q_len, kv_len, causal,
):
    """Grid (batch·head, q-blocks, kv-blocks): the kv axis is sequential,
    accumulating this q-block's dQ in VMEM scratch."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    off = kv_len - q_len
    live = (not causal) or (ki * block_k <= qi * block_q + block_q - 1 + off)

    @pl.when(live)
    def _accumulate():
        q = q_ref[0].astype(jnp.float32)
        kblk = k_ref[0].astype(jnp.float32)
        vblk = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0].astype(jnp.float32)
        delta = delta_ref[0].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        mask = (k_pos < kv_len) & (q_pos < q_len)
        if causal:
            mask = mask & (k_pos <= q_pos + off)
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, vblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        dq_acc[:] += jax.lax.dot_general(
            ds, kblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                            # ds·K (block_q, D)

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_backward_pallas(
    q, k, v, out, lse, g, causal, sm_scale, block_q, block_k, interpret
):
    """dq/dk/dv via the two Pallas kernels above. ``lse`` is (B, H, sq_pad)
    from the forward."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    block_q = min(block_q, max(8, 1 << (s_q - 1).bit_length()))
    block_k = min(block_k, max(8, 1 << (s_k - 1).bit_length()))
    d_pad = _head_dim_pad(d)

    qp = _pad_to(_pad_to(q, 3, d_pad), 2, block_q).reshape(b * h, -1, d_pad)
    kp = _pad_to(_pad_to(k, 3, d_pad), 2, block_k).reshape(b * h, -1, d_pad)
    vp = _pad_to(_pad_to(v, 3, d_pad), 2, block_k).reshape(b * h, -1, d_pad)
    dop = _pad_to(_pad_to(g, 3, d_pad), 2, block_q).reshape(b * h, -1, d_pad)
    sq_pad = qp.shape[1]
    sk_pad = kp.shape[1]

    # delta_i = Σ_d dO_i · O_i (the FA2 D vector) — cheap XLA elementwise
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = _pad_to(delta, 2, block_q).reshape(b * h, sq_pad, 1)
    lsep = lse.reshape(b * h, -1, 1)
    if lsep.shape[1] != sq_pad:  # defensive: lse padded with a different bq
        lsep = _pad_to(lse.reshape(b, h, -1)[:, :, :s_q], 2, block_q).reshape(
            b * h, sq_pad, 1)

    kwargs = dict(sm_scale=sm_scale, block_q=block_q, block_k=block_k,
                  q_len=s_q, kv_len=s_k, causal=causal)
    q_spec3 = pl.BlockSpec((1, block_q, d_pad), lambda bh, ki, qi: (bh, qi, 0))
    k_spec3 = pl.BlockSpec((1, block_k, d_pad), lambda bh, ki, qi: (bh, ki, 0))
    qrow3 = pl.BlockSpec((1, block_q, 1), lambda bh, ki, qi: (bh, qi, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kwargs),
        grid=(b * h, sk_pad // block_k, sq_pad // block_q),
        in_specs=[q_spec3, k_spec3, k_spec3, q_spec3, qrow3, qrow3],
        out_specs=[
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ki, qi: (bh, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk_pad, d_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        name=f"flash_dkv_sq{s_q}_sk{s_k}_d{d}",
    )(qp, kp, vp, dop, lsep, delta)

    q_spec2 = pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0))
    k_spec2 = pl.BlockSpec((1, block_k, d_pad), lambda bh, qi, ki: (bh, ki, 0))
    qrow2 = pl.BlockSpec((1, block_q, 1), lambda bh, qi, ki: (bh, qi, 0))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kwargs),
        grid=(b * h, sq_pad // block_q, sk_pad // block_k),
        in_specs=[q_spec2, k_spec2, k_spec2, q_spec2, qrow2, qrow2],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        name=f"flash_dq_sq{s_q}_sk{s_k}_d{d}",
    )(qp, kp, vp, dop, lsep, delta)

    dq = dq.reshape(b, h, sq_pad, d_pad)[:, :, :s_q, :d]
    dk = dk.reshape(b, h, sk_pad, d_pad)[:, :, :s_k, :d]
    dv = dv.reshape(b, h, sk_pad, d_pad)[:, :, :s_k, :d]
    return dq, dk, dv


def _blockwise_attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool,
    sm_scale: float,
    block_k: int = 2048,
) -> jax.Array:
    """Online-softmax attention as a checkpointed ``lax.scan`` over K/V
    blocks — pure XLA, O(S·block) memory, numerically identical to the
    dense reference. Used as the autodiff target for the flash backward:
    differentiating through the (rematerialized) scan keeps the backward
    pass memory-bounded instead of materializing the (S, S) score matrix.
    """
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    bk = min(block_k, max(8, 1 << (s_k - 1).bit_length()))
    pad = (-s_k) % bk
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    nb = kp.shape[2] // bk
    kb = kp.reshape(b, h, nb, bk, d).transpose(2, 0, 1, 3, 4)   # (nb, B, H, bk, D)
    vb = vp.reshape(b, h, nb, bk, d).transpose(2, 0, 1, 3, 4)
    qf = q.astype(jnp.float32) * sm_scale
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (s_q, 1), 0)

    @jax.checkpoint
    def body(carry, blk):
        acc, m, l = carry
        k_cur, v_cur, blk_idx = blk
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        k_pos = blk_idx * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        mask = k_pos < s_k
        if causal:
            # bottom-right alignment, matching attention_reference
            mask = mask & (k_pos <= q_pos + (s_k - s_q))
        s = jnp.where(mask, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return (acc_new, m_new, l_new), None

    acc0 = jnp.zeros((b, h, s_q, d), jnp.float32)
    m0 = jnp.full((b, h, s_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_q, 1), jnp.float32)
    (acc, m, l), _ = jax.lax.scan(
        body, (acc0, m0, l0), (kb, vb, jnp.arange(nb))
    )
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def _flash_bwd(causal, sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    return _flash_backward_pallas(
        q, k, v, out, lse, g, causal, sm_scale, block_q, block_k, interpret
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over (B, H, S, D) tensors.

    Uses the Pallas TPU kernel when S is large enough to benefit; for tiny
    sequences (the 80-token ViViT case) the XLA reference path is faster
    than kernel launch + padding overhead, so we dispatch on size.
    Block sizes default adaptively: long sequences get larger tiles so the
    grid (and per-iteration overhead) shrinks ~16× at 16k tokens.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s_q, s_k = q.shape[2], k.shape[2]
    if s_q * s_k <= 128 * 128:
        return attention_reference(q, k, v, causal, sm_scale)
    # On-chip block sweep at S=16384 (r4, scripts/profile_diffusion_b1.py):
    # 128→7.9 ms, 512→1.8 ms, 1024→1.03 ms (2048-row q blocks fail to
    # compile on the v5e) — bigger tiles shrink the sequential kv grid and
    # its per-iteration overhead.
    if block_q is None:
        block_q = 1024 if s_q >= 8192 else (512 if s_q >= 4096 else 128)
    if block_k is None:
        block_k = 1024 if s_k >= 8192 else (512 if s_k >= 4096 else 128)
    return _flash(q, k, v, causal, sm_scale, block_q, block_k, interpret)


def _mha_einsum(q, k, v, num_heads, causal):
    """Transpose-free XLA einsum attention on the (B, S, H, D) layout — the
    short-sequence fallback and the numerics oracle / backward for the
    fused small-MHA kernel."""
    b, s_q, e = q.shape
    s_k = k.shape[1]
    hd = e // num_heads
    qh = q.reshape(b, s_q, num_heads, hd)
    kh = k.reshape(b, s_k, num_heads, hd)
    vh = v.reshape(b, s_k, num_heads, hd)
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        mask = jnp.tril(jnp.ones((s_q, s_k), dtype=bool), k=s_k - s_q)
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return out.reshape(b, s_q, e)


# ---------------------------------------------------------------------------
# fused small-sequence MHA: all heads of one batch element in one program
# ---------------------------------------------------------------------------
#
# At ViViT scale (S=81, 8 heads of d=32, b=256) attention is bound by
# neither HBM nor FLOPs but by per-grid-iteration overhead: both the
# einsum path (a 2048-batch tiny-K batched matmul) and the flash kernel
# (grid 2048×1×1) cost ~2 µs per (batch·head) iteration — measured
# identical at ~4.3 ms, half the 12-layer forward, for 5% of its FLOPs.
# This kernel cuts the grid to (batch,) by folding the head axis into the
# token axis: Q/K/V become (H·S_pad, D) per program, ONE (H·S_pad, H·S_pad)
# logits matmul computes every head's scores (cross-head entries too — 8×
# extra MXU work), a block-diagonal mask kills the cross-head terms before
# softmax, and ONE P·V matmul (K = H·S_pad, large, MXU-efficient) finishes.
# The (H·S_pad)² logits never leave VMEM — the same formulation in XLA
# loses 5× because 430 MB/layer of masked scores round-trip HBM
# (scripts/profile_vivit_variants.py records all variants).
#
# PRODUCTION VERDICT (round 4): the kernel wins its microbench in
# isolation but LOSES 1.7× end-to-end inside the fused preprocess+ViViT
# program at the flagship shape (b=256, h=8, s=81 → hs=768): driver
# BENCH_r03 measured 58.5k frames/s with it vs 99.6k with the einsum path
# (VERDICT.md round 3, reproduced on-chip round 4: 58.1k vs einsum).
# Inside the full program XLA overlaps/fuses the batched-einsum attention
# with neighboring layers, while the pallas_call is an opaque barrier
# doing 8× the MXU work — the microbench never sees that context. This is
# the same microbench-vs-production trap the CLAHE kernel hit. So the
# fused kernel is OPT-IN (``mha(..., use_fused_small=True)``), kept for
# shapes/programs where a caller has measured an end-to-end win, and the
# default small-sequence path is the einsum. ``scripts/bench_gate.py``
# pins the end-to-end floor so a dispatch-policy regression fails loudly.

_SMALL_MHA_MAX_HS = 768  # largest hs verified on hardware (h=8, s=81→96 pad);
                         # logits (hs, hs) f32 = 2.25 MB VMEM. ADVICE r3:
                         # hs=1024 admits ~2× that with temporaries +
                         # double-buffered operands — unverified, so gated out.


def _small_mha_pad(num_heads: int, s: int) -> int:
    """Per-head padded sequence: smallest multiple of 8 with
    num_heads·s_pad a multiple of 128 (clean lane tiling for the fused
    (H·S_pad)² logits)."""
    step = 128 // math.gcd(num_heads, 128)
    step *= 8 // math.gcd(step, 8)
    return -(-s // step) * step


def _small_mha_kernel(q_ref, k_ref, v_ref, rh_ref, ch_ref, cp_ref, rp_ref,
                      o_ref, *, sm_scale, s, causal):
    q = q_ref[0].astype(jnp.float32) * sm_scale          # (hs, d)
    k = k_ref[0].astype(jnp.float32)
    # QK^T operands are f32 here, so HIGHEST is Mosaic-legal and keeps the
    # kernel's numerics aligned with the einsum oracle even under a global
    # jax_default_matmul_precision=highest (ADVICE r3). Only the bf16 P·V
    # matmul must stay DEFAULT — fp32 contract precision on bf16 operands
    # is what Mosaic rejects ('Bad lhs type', the CLAHE-era constraint).
    # Under the DEFAULT global precision the einsum path contracts QK^T at
    # bf16-grade precision while this kernel stays HIGHEST — i.e. the fused
    # path is deliberately the *more* precise of the two there (pinning it
    # to DEFAULT would re-diverge it under global-highest instead); the
    # parity tests' tolerances absorb that one-sided gap (ADVICE r4).
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                    # (hs, hs)
    # block-diagonal mask from host-precomputed index vectors (Mosaic-safe:
    # no integer div/mod on device)
    valid = (rh_ref[...] == ch_ref[...]) & (cp_ref[...] < s)
    if causal:
        valid = valid & (cp_ref[...] <= rp_ref[...])
    logits = jnp.where(valid, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / jnp.maximum(l, 1e-30)).astype(v_ref.dtype)  # match einsum path's
    pv_precision = (jax.lax.Precision.HIGHEST            # bf16 probs cast
                    if v_ref.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    o_ref[0] = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=pv_precision,
    ).astype(o_ref.dtype)


def _small_mha_forward(q, k, v, num_heads, causal, interpret):
    b, s, e = q.shape
    hd = e // num_heads
    s_pad = _small_mha_pad(num_heads, s)
    hs = num_heads * s_pad

    def arrange(t):                                      # (b, s, e) -> (b, hs, hd)
        t = t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        t = _pad_to(t, 2, s_pad) if s_pad != s else t
        return t.reshape(b, hs, hd)

    qa, ka, va = arrange(q), arrange(k), arrange(v)
    pos = np.arange(hs, dtype=np.int32)
    rh = jnp.asarray((pos // s_pad)[:, None])            # (hs, 1) head-of-row
    ch = jnp.asarray((pos // s_pad)[None, :])            # (1, hs) head-of-col
    cp = jnp.asarray((pos % s_pad)[None, :])             # (1, hs) pos-in-head
    rp = jnp.asarray((pos % s_pad)[:, None])             # (hs, 1)

    fixed = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_small_mha_kernel, sm_scale=1.0 / math.sqrt(hd),
                          s=s, causal=causal),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hs, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hs, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hs, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((hs, 1), fixed),
            pl.BlockSpec((1, hs), fixed),
            pl.BlockSpec((1, hs), fixed),
            pl.BlockSpec((hs, 1), fixed),
        ],
        out_specs=pl.BlockSpec((1, hs, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hs, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
        # logical dims for utils/flops.py (model FLOPs exclude the masked
        # cross-head work; hw FLOPs count it)
        name=f"mha_small_s{s}_d{hd}_h{num_heads}",
    )(qa, ka, va, rh, ch, cp, rp)
    out = out.reshape(b, num_heads, s_pad, hd)[:, :, :s, :]
    return out.transpose(0, 2, 1, 3).reshape(b, s, e)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _small_mha(q, k, v, num_heads, causal, interpret):
    return _small_mha_forward(q, k, v, num_heads, causal, interpret)


def _small_mha_vjp_fwd(q, k, v, num_heads, causal, interpret):
    return _small_mha_forward(q, k, v, num_heads, causal, interpret), (q, k, v)


def _small_mha_vjp_bwd(num_heads, causal, interpret, res, g):
    # backward through the einsum oracle (identical math): at small S the
    # recompute is cheap and XLA fuses the whole VJP; the kernel only needs
    # to win the inference/forward side.
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b_, c: _mha_einsum(a, b_, c, num_heads, causal),
                     q, k, v)
    return vjp(g)


_small_mha.defvjp(_small_mha_vjp_fwd, _small_mha_vjp_bwd)


def small_mha_viable(num_heads: int, s_q: int, s_k: int, e: int) -> bool:
    return (s_q == s_k and e % num_heads == 0
            and num_heads * _small_mha_pad(num_heads, s_q) <= _SMALL_MHA_MAX_HS)


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    causal: bool = False,
    use_flash: bool = True,
    use_fused_small: bool = False,
) -> jax.Array:
    """Multi-head attention over (B, S, E) inputs: split heads, attend,
    merge. The convenience wrapper models use.

    Short self-attention sequences take a transpose-free einsum path — the
    measured end-to-end winner at the flagship shapes (see the production
    verdict above ``_SMALL_MHA_MAX_HS``); long sequences take the flash
    kernel. ``use_fused_small=True`` opts into the fused small-MHA Pallas
    kernel (one program per batch element, all heads' scores resident in
    VMEM) for callers that have measured a win in THEIR program.

    Note: the fused path wraps a ``jax.custom_vjp``, so forward-mode AD
    (``jvp``/``jacfwd``) raises on it; the default einsum path supports
    both AD modes (ADVICE r3).
    """
    b, s_q, e = q.shape
    s_k = k.shape[1]
    hd = e // num_heads

    if s_q * s_k <= 128 * 128 or not use_flash:
        if (use_flash and use_fused_small
                and small_mha_viable(num_heads, s_q, s_k, e)
                and jax.default_backend() == "tpu"):
            return _small_mha(q, k, v, num_heads, causal, False)
        return _mha_einsum(q, k, v, num_heads, causal)

    def split(x, s):
        return x.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)

    out = flash_attention(split(q, s_q), split(k, s_k), split(v, s_k), causal=causal)
    return out.transpose(0, 2, 1, 3).reshape(b, s_q, e)
