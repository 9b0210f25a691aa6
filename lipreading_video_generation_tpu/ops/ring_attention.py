"""Ring attention: sequence-parallel flash attention over a mesh axis.

The reference's workloads are deliberately short-context (5-frame windows,
16-step mels — SURVEY.md §5), handled by chunking outside the model. This
module is the scale-out path the flash kernel's block-wise softmax was
designed to enable: shard the sequence over a mesh axis, keep Q local, and
rotate K/V shards around the ring with ``lax.ppermute`` (ICI
neighbor-to-neighbor traffic), merging each visiting block into the local
online-softmax accumulator. Attention over an N-devices-long sequence
costs O(S/N) memory per device and N-1 permute steps that overlap with
compute.

Usable for sentence-level ViViT (15+ frames × patch tokens) or full-clip
diffusion once sequences outgrow one chip; exact (not approximate) —
verified against the dense reference in tests/test_ring_attention.py on
the 8-device CPU mesh.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .attention import _NEG_INF

__all__ = ["ring_attention", "live_ring_mesh"]


def live_ring_mesh(axis_name: Optional[str]) -> Optional[Mesh]:
    """The physical mesh currently in scope if it exposes ``axis_name``
    with size > 1, else None — the "is sequence parallelism live?" check
    model code uses to fall back to local flash attention off-mesh (unit
    tests, single chip) with the SAME model definition."""
    if axis_name is None:
        return None
    from jax._src import mesh as mesh_lib

    env_mesh = mesh_lib.thread_resources.env.physical_mesh
    if env_mesh.empty or dict(env_mesh.shape).get(axis_name, 1) <= 1:
        return None
    return env_mesh


def _local_block_update(q, k_blk, v_blk, acc, m, l, sm_scale):
    """Merge one visiting K/V block into the online-softmax state."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32)
    s = s * sm_scale
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha[..., 0][..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return acc_new, m_new, l_new


def _ring_inner(q, k, v, *, axis_name, num_devices, sm_scale, causal):
    """Runs per device under shard_map: q/k/v are local sequence shards.

    Causal masking uses global positions: at ring step t this device holds
    the K/V shard originally owned by device (my_idx − t) mod N, so key j of
    the visiting block sits at global position src·S_local + j.
    """
    qf = q.astype(jnp.float32)
    b, h, sq, d = qf.shape
    sk_local = k.shape[2]
    my_idx = jax.lax.axis_index(axis_name)
    acc = jnp.zeros((b, h, sq, d), jnp.float32)
    m = jnp.full((b, h, sq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, sq, 1), jnp.float32)
    perm = [(j, (j + 1) % num_devices) for j in range(num_devices)]
    q_pos = my_idx * sq + jax.lax.broadcasted_iota(jnp.int32, (sq, 1), 0)

    def body(i, carry):
        k_cur, v_cur, acc, m, l = carry
        if causal:
            src = jnp.mod(my_idx - i, num_devices)
            k_pos = src * sk_local + jax.lax.broadcasted_iota(jnp.int32, (1, sk_local), 1)
            bias = jnp.where(k_pos <= q_pos, 0.0, _NEG_INF)[None, None]
        else:
            bias = None
        kf = k_cur.astype(jnp.float32)
        if bias is not None:
            # fold the mask in via the score path: recompute update with bias
            s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                           preferred_element_type=jnp.float32) * sm_scale + bias
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha[..., 0][..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            acc, m, l = acc_new, m_new, l_new
        else:
            acc, m, l = _local_block_update(qf, kf, v_cur, acc, m, l, sm_scale)
        # rotate K/V to the next device; on the final iteration the permute
        # result is unused but keeps the loop shape uniform
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return k_nxt, v_nxt, acc, m, l

    _, _, acc, m, l = jax.lax.fori_loop(0, num_devices, body, (k, v, acc, m, l))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
    sm_scale: Optional[float] = None,
    causal: bool = False,
) -> jax.Array:
    """Exact attention over (B, H, S, D) with S sharded on ``axis_name``.

    S must be divisible by the axis size. Inputs may be unsharded host
    arrays — shard_map partitions them; under jit with already-sharded
    operands no resharding happens.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n = mesh.shape[axis_name]
    if q.shape[2] % n:
        raise ValueError(f"sequence {q.shape[2]} not divisible by axis {axis_name}={n}")
    # Co-shard the batch dim over the mesh's data axis when it divides:
    # in the dp×tp production programs the incoming activations are already
    # batch-sharded over `data`, and a P(None, ..) batch spec here would
    # force SPMD to fully rematerialize (replicate) them at the shard_map
    # boundary — the `Involuntary full rematerialization` wall VERDICT r3
    # flagged in MULTICHIP_r03. Attention is batch-elementwise, so the
    # inner kernel is unchanged; only the partitioning boundary tightens.
    batch_axis = None
    mesh_shape = dict(mesh.shape)
    if (axis_name != "data" and mesh_shape.get("data", 1) > 1
            and q.shape[0] % mesh_shape["data"] == 0):
        batch_axis = "data"
    spec = P(batch_axis, None, axis_name, None)
    fn = shard_map(
        functools.partial(
            _ring_inner, axis_name=axis_name, num_devices=n, sm_scale=sm_scale,
            causal=causal
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
