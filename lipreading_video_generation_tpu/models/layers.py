"""Shared NN building blocks (Flax, NHWC).

TPU-first idiom notes (vs the reference's torch modules):
- NHWC layout throughout — XLA's native conv layout on TPU.
- GroupNorm instead of BatchNorm (reference uses nn.BatchNorm2d everywhere,
  e.g. gan-model/model/generator.py:12): no running statistics, no
  train/eval mode split, and no cross-device stat sync under data
  parallelism — the standard swap for jit/pjit-friendly training.
- Decoders upsample with resize-then-conv instead of ConvTranspose
  (generator.py:102-146): same receptive-field role, avoids checkerboard
  artifacts, and maps to XLA resize + MXU conv cleanly.
- T-folding of (B, T, ...) windows into the batch is a plain reshape
  (``fold_time``/``unfold_time``) instead of the reference's torch.cat list
  comprehensions (generator.py:174-175).
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Pair = Union[int, Tuple[int, int]]


def _pair(v: Pair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def scale_channels(ch: int, width: float) -> int:
    """Scale a channel count by a width multiplier; keeps >=8 and multiples
    of 8 for TPU tiling. Used by the width-scalable GAN models."""
    return max(8, int(round(ch * width / 8)) * 8)


def fold_time(x: jax.Array) -> Tuple[jax.Array, int]:
    """(B, T, H, W, C) → (B·T, H, W, C); returns (folded, B)."""
    b, t = x.shape[0], x.shape[1]
    return x.reshape((b * t,) + x.shape[2:]), b


def unfold_time(x: jax.Array, b: int) -> jax.Array:
    """(B·T, H, W, C) → (B, T, H, W, C)."""
    return x.reshape((b, -1) + x.shape[1:])


def _norm(name: str, channels: int, dtype):
    if name == "group":
        groups = min(32, channels)
        while channels % groups:
            groups -= 1
        return nn.GroupNorm(num_groups=groups, dtype=dtype, name=None)
    if name == "none":
        return None
    raise ValueError(f"unknown norm {name!r}")


class ConvBlock(nn.Module):
    """Conv → norm → activation, with torch-style explicit padding.

    The analog of the reference's Conv2d wrapper (gan-model/model/syncnet.py:
    67-81) and nonorm_Conv2d (discriminator.py:66-76).
    """

    features: int
    kernel: Pair = 3
    stride: Pair = 1
    padding: Pair = 1
    norm: str = "group"
    act: str = "relu"
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel)
        ph, pw = _pair(self.padding)
        out = nn.Conv(
            self.features,
            (kh, kw),
            strides=_pair(self.stride),
            padding=((ph, ph), (pw, pw)),
            dtype=self.dtype,
        )(x)
        norm = _norm(self.norm, self.features, self.dtype)
        if norm is not None:
            out = norm(out)
        if self.residual:
            out = out + x
        if self.act == "relu":
            out = nn.relu(out)
        elif self.act == "leaky":
            out = nn.leaky_relu(out, negative_slope=0.01)
        elif self.act == "silu":
            out = nn.silu(out)
        elif self.act != "none":
            raise ValueError(f"unknown act {self.act!r}")
        return out


class ResConvBlock(nn.Module):
    """x + (conv→norm→relu)(x) — the generator's _make_res_block
    (generator.py:159-166, _ResidualBlock :226-234)."""

    features: int
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = ConvBlock(self.features, 3, 1, 1, norm=self.norm, dtype=self.dtype)(x)
        return out + x


class UpsampleConv(nn.Module):
    """Resize to ``target_hw`` (nearest) then conv — the ConvTranspose
    replacement for decoder blocks (generator.py:102-146)."""

    features: int
    target_hw: Tuple[int, int]
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        th, tw = self.target_hw
        x = jax.image.resize(x, (b, th, tw, c), method="nearest")
        return ConvBlock(self.features, 3, 1, 1, norm=self.norm, dtype=self.dtype)(x)


class MLP(nn.Module):
    hidden: int
    out: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from ..parallel.mesh import activation_constraint

        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        # tensor-parallel hint: the hidden kernel shards on its output dim
        # over the model axis (parallel/mesh.param_partition_spec), so pin
        # the activation to the matching layout (no-op off-mesh / pure DP)
        x = activation_constraint(x, "data", *([None] * (x.ndim - 2)), "model")
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block over (B, S, E), attention via the
    shared flash-attention primitive (ops/attention.py).

    ``ring_axis`` routes attention through the sequence-parallel ring
    (ops/ring_attention.py) when a physical mesh with that axis (size > 1)
    is live: the token axis shards over the mesh axis and K/V shards rotate
    via ``ppermute`` over ICI. Off-mesh (unit tests, single chip) the same
    model definition falls back to local flash attention — long-context
    scale-out is a mesh-axis change, not a model rewrite (SURVEY.md §5).
    """

    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    ring_axis: str = None

    def _live_ring_mesh(self):
        from ..ops.ring_attention import live_ring_mesh

        return live_ring_mesh(self.ring_axis)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from ..ops.attention import mha

        from ..parallel.mesh import activation_constraint

        e = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype)(x)
        # fused QKV projection: one (e, 3e) matmul instead of three (e, e)
        qkv = nn.Dense(3 * e, dtype=self.dtype, name="qkv")(h)
        # TP hint matching the qkv kernel's output-dim sharding (see MLP)
        qkv = activation_constraint(qkv, "data", None, "model")
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ring_mesh = self._live_ring_mesh()
        if ring_mesh is not None:
            from ..ops.ring_attention import ring_attention

            b, s, _ = q.shape
            hd = e // self.num_heads
            to_heads = lambda t: t.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
            out = ring_attention(
                to_heads(q), to_heads(k), to_heads(v),
                mesh=ring_mesh, axis_name=self.ring_axis,
            )
            attn = out.transpose(0, 2, 1, 3).reshape(b, s, e)
        else:
            attn = mha(q, k, v, self.num_heads)
        attn = nn.Dense(e, dtype=self.dtype, name="proj")(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = x + attn
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + MLP(self.mlp_dim, e, self.dropout, dtype=self.dtype)(h, deterministic)
        return x


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)
