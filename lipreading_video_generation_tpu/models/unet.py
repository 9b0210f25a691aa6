"""Diffusion U-Net (guided-diffusion capability, Flax/TPU redesign).

Capability target: video-generation/diffusion/unet.py:78-675 (the OpenAI
guided-diffusion port) — sinusoidal timestep embedding + MLP (:630-645),
ResBlocks with scale-shift GroupNorm conditioning (:155-269), attention at
configured downsample factors (:271-406), zero-initialized output conv
(:669-675). TPU idioms instead of the torch mechanics:

- NHWC; attention through the shared flash-attention Pallas primitive
  (ops/attention.py) instead of materialized QKV score matrices
  (unet.py:320-406).
- ``nn.remat`` on ResBlocks — the analog of the reference's hand-rolled
  checkpoint autograd.Function (video-generation/diffusion/utils.py:161-207)
  — rematerializes activations in backward to trade FLOPs for HBM.
- bf16 compute with fp32 params/norm statistics; no fp16 master-param
  machinery needed (fp16_util.py:148-236 is obsolete on TPU).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import mha


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal embeddings (unet.py timestep_embedding / utils.py:140-158)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _group_norm(x: jax.Array, dtype=jnp.float32) -> nn.Module:
    c = x.shape[-1]
    g = min(32, c)
    while c % g:
        g -= 1
    return nn.GroupNorm(num_groups=g, dtype=jnp.float32)  # fp32 norm (GroupNorm32 analog)


zero_init = nn.initializers.zeros


class ResBlock(nn.Module):
    """GroupNorm→SiLU→conv ×2 with scale-shift time conditioning and a
    learned skip when channels change (unet.py:155-269).

    The reference's as-trained config leaves use_scale_shift_norm=False
    (additive emb, unet_audio.py:37); this implementation standardizes on
    the scale-shift path (unet.py:232-252) — guided-diffusion's
    recommended setting, same parameter count."""

    out_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, deterministic: bool = True) -> jax.Array:
        c_in = x.shape[-1]
        h = _group_norm(x)(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)

        # scale-shift norm conditioning (use_scale_shift_norm path, unet.py:232-252)
        emb_out = nn.Dense(2 * self.out_channels, dtype=jnp.float32)(nn.silu(emb))
        scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
        h = _group_norm(h)(h) * (1 + scale) + shift
        h = nn.silu(h).astype(self.dtype)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, kernel_init=zero_init, dtype=self.dtype
        )(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention with zero-init output projection
    (unet.py:271-318); scores via flash attention.

    ``ring_axis`` routes the scores through sequence-parallel ring
    attention (ops/ring_attention.py) when a physical mesh with that axis
    (size > 1) is live: the H·W token axis shards over the mesh axis and
    K/V shards rotate via ``ppermute`` over ICI — the long-context path
    for full-resolution diffusion attention (16,384 tokens at ds=1 @128²
    is this repo's FLOP-heaviest op). Off-mesh the same model definition
    falls back to local flash attention (SURVEY.md §5)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    ring_axis: str = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.ring_attention import live_ring_mesh

        b, h, w, c = x.shape
        hnorm = _group_norm(x)(x).astype(self.dtype)
        flat = hnorm.reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(flat)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ring_mesh = live_ring_mesh(self.ring_axis)
        if ring_mesh is not None:
            from ..ops.ring_attention import ring_attention

            hd = c // self.num_heads
            to_heads = lambda t: t.reshape(  # noqa: E731
                b, h * w, self.num_heads, hd).transpose(0, 2, 1, 3)
            out = ring_attention(
                to_heads(q), to_heads(k), to_heads(v),
                mesh=ring_mesh, axis_name=self.ring_axis)
            out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        else:
            out = mha(q, k, v, self.num_heads)
        out = nn.Dense(c, kernel_init=zero_init, dtype=self.dtype, name="proj")(out)
        return x + out.reshape(b, h, w, c)


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1, dtype=self.dtype)(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype)(x)


class EncoderUNetModel(nn.Module):
    """The down-path half of the U-Net with a pooled head — the
    classifier(-guidance) variant (unet.py:695-905): same stem/ResBlock/
    attention structure as UNetModel's encoder, then GroupNorm→SiLU→
    spatial-mean pool → Dense(num_out)."""

    num_out: int = 1000
    base_channels: int = 64
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (2, 4)
    num_heads: int = 4
    time_embed_dim: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    ring_axis: str = None   # sequence-parallel attention (see AttentionBlock)

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, deterministic: bool = True) -> jax.Array:
        emb = timestep_embedding(t, self.base_channels)
        emb = nn.Dense(self.time_embed_dim, dtype=jnp.float32)(emb)
        emb = nn.Dense(self.time_embed_dim, dtype=jnp.float32)(nn.silu(emb))
        h = nn.Conv(self.base_channels, (3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype)
        )
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            ch = self.base_channels * mult
            for _ in range(self.num_res_blocks):
                h = ResBlock(ch, self.dropout, self.dtype)(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, self.dtype, self.ring_axis)(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.dtype)(h)
                ds *= 2
        ch = self.base_channels * self.channel_mult[-1]
        h = ResBlock(ch, self.dropout, self.dtype)(h, emb, deterministic)
        h = AttentionBlock(self.num_heads, self.dtype, self.ring_axis)(h)
        h = ResBlock(ch, self.dropout, self.dtype)(h, emb, deterministic)
        h = _group_norm(h)(h)
        h = nn.silu(h)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.num_out, dtype=jnp.float32)(h)


class UNetModel(nn.Module):
    """(B, H, W, C_in) + (B,) timesteps → (B, H, W, out_channels)."""

    out_channels: int = 3
    base_channels: int = 64
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (1, 2, 4)  # downsample factors
    num_heads: int = 4
    time_embed_dim: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = True
    ring_axis: str = None   # sequence-parallel attention (see AttentionBlock)

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, deterministic: bool = True) -> jax.Array:
        Res = nn.remat(ResBlock, static_argnums=(3,)) if self.remat else ResBlock

        emb = timestep_embedding(t, self.base_channels)
        emb = nn.Dense(self.time_embed_dim, dtype=jnp.float32)(emb)
        emb = nn.Dense(self.time_embed_dim, dtype=jnp.float32)(nn.silu(emb))

        h = nn.Conv(self.base_channels, (3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype)
        )
        skips = [h]
        ds = 1
        # down path
        for level, mult in enumerate(self.channel_mult):
            ch = self.base_channels * mult
            for _ in range(self.num_res_blocks):
                h = Res(ch, self.dropout, self.dtype)(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, self.dtype, self.ring_axis)(h)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.dtype)(h)
                ds *= 2
                skips.append(h)
        # middle
        ch = self.base_channels * self.channel_mult[-1]
        h = Res(ch, self.dropout, self.dtype)(h, emb, deterministic)
        h = AttentionBlock(self.num_heads, self.dtype, self.ring_axis)(h)
        h = Res(ch, self.dropout, self.dtype)(h, emb, deterministic)
        # up path
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = self.base_channels * mult
            for _ in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = Res(ch, self.dropout, self.dtype)(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, self.dtype, self.ring_axis)(h)
            if level != 0:
                h = Upsample(self.dtype)(h)
                ds //= 2
        assert not skips
        h = _group_norm(h)(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, kernel_init=zero_init, dtype=jnp.float32
        )(h)


class SuperResModel(nn.Module):
    """Super-resolution U-Net (unet.py:678-693): denoises a high-res frame
    conditioned on the bilinearly-upsampled low-res input, channel-concat."""

    unet: UNetModel

    @nn.compact
    def __call__(
        self,
        x: jax.Array,           # (B, H, W, C) noisy high-res
        low_res: jax.Array,     # (B, h, w, C) conditioning image
        t: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        b, h, w, c = x.shape
        up = jax.image.resize(low_res.astype(jnp.float32), (b, h, w, low_res.shape[-1]),
                              method="bilinear")
        return self.unet(jnp.concatenate([x, up.astype(x.dtype)], axis=-1), t, deterministic)
