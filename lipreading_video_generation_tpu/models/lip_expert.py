"""Lipreading expert — the AV-HuBERT-analog interface + JAX-native default.

The reference's optional lipreading-expert loss runs a frozen fairseq
AV-HuBERT ensemble over generated lip crops (gan-model/avhubert_utils.py:
71-134, used at train_lipreading.py:128-133 behind the ``--lipreading``
flag). A torch/fairseq runtime has no place in a TPU-native framework, so
the expert is a pluggable interface (SURVEY.md §7.7):

- ``LipExpert`` protocol: grayscale mouth-ROI video (B, T, 88, 88, 1) →
  per-frame encoder features; ``expert_loss`` scores generated vs ground-
  truth windows by feature distance (the criterion role).
- ``ConformerLipEncoder``: the default, trainable-from-scratch light
  conformer (3-D conv frontend + conformer blocks), AV-HuBERT-shaped
  (per-frame features, default 768-d).
- The AV-HuBERT video transform — Normalize(0,255) → CenterCrop(88,88) →
  Normalize(0.421, 0.165) (avhubert_utils.py:327-330) — is
  ``avhubert_video_transform``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import image as image_ops
from .layers import TransformerBlock


def avhubert_video_transform(frames: jax.Array) -> jax.Array:
    """(..., H, W, C) uint8/float RGB or gray → (..., 88, 88, 1) normalized
    (avhubert_utils.py:327-335: BGR-weighted grayscale, /255, center crop,
    (x-0.421)/0.165)."""
    if frames.shape[-1] == 3:
        frames = image_ops.bgr_to_gray(frames)
    x = frames.astype(jnp.float32) / 255.0
    x = image_ops.center_crop(x, (88, 88))
    return (x - 0.421) / 0.165


class ConformerBlock(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        e = x.shape[-1]
        # half-step FFN
        x = x + 0.5 * nn.Dense(e, dtype=self.dtype)(
            nn.silu(nn.Dense(4 * e, dtype=self.dtype)(nn.LayerNorm(dtype=self.dtype)(x)))
        )
        # self-attention
        x = TransformerBlock(self.num_heads, 4 * e, dtype=self.dtype, name="attn")(x, deterministic)
        # depthwise conv module
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Conv(2 * e, (1,), dtype=self.dtype)(h)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(e, (15,), padding=7, feature_group_count=e, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(e, (1,), dtype=self.dtype)(h)
        x = x + h
        # half-step FFN
        x = x + 0.5 * nn.Dense(e, dtype=self.dtype)(
            nn.silu(nn.Dense(4 * e, dtype=self.dtype)(nn.LayerNorm(dtype=self.dtype)(x)))
        )
        return nn.LayerNorm(dtype=self.dtype)(x)


class ConformerLipEncoder(nn.Module):
    """(B, T, 88, 88, 1) mouth video → (B, T, embed_dim) features."""

    embed_dim: int = 768
    num_layers: int = 6
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, deterministic: bool = True) -> jax.Array:
        b, t = video.shape[:2]
        x = video.astype(self.dtype)
        # 3-D conv frontend: spatiotemporal stem then spatial reduction
        x = nn.Conv(64, (5, 7, 7), strides=(1, 2, 2), padding=((2, 2), (3, 3), (3, 3)),
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(128, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)),
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(256, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)),
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(2, 3))  # (B, T, 256) spatial GAP
        x = nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, t, self.embed_dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        for i in range(self.num_layers):
            x = ConformerBlock(self.num_heads, dtype=self.dtype, name=f"conf_{i}")(x, deterministic)
        return x.astype(jnp.float32)


def expert_loss(
    encoder: ConformerLipEncoder,
    params,
    generated: jax.Array,
    target: jax.Array,
) -> jax.Array:
    """Frozen-expert lipreading loss: L2 between expert features of
    generated and ground-truth windows ((B, T, H, W, C) uint8-scale RGB).
    The criterion-role analog of the AV-HuBERT seq2seq loss used at
    train_lipreading.py:128-133; feature-matching form avoids needing
    transcript labels at every step (text-conditioned CE can be layered on).
    """
    g = encoder.apply({"params": params}, avhubert_video_transform(generated))
    t = encoder.apply({"params": params}, avhubert_video_transform(target))
    t = jax.lax.stop_gradient(t)
    return jnp.mean((g - t) ** 2)
