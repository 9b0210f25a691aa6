"""SyncNet: audio↔lip-motion sync expert producing paired 512-d embeddings.

Redesign of ``SyncNet_color`` (gan-model/model/syncnet.py:5-81): face
encoder over the 5 stacked RGB frames' lower halves (15 input channels,
syncnet.py:10) and mel audio encoder (syncnet.py:33-51), both to
L2-normalized 512-d embeddings (syncnet.py:57-61). NHWC + GroupNorm.

Used frozen as the sync-loss expert during GAN training
(gan-model/train_lipreading.py:78-89) and trainable standalone via
pipelines/train_syncnet.py's cosine-BCE objective.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBlock, l2_normalize, scale_channels



class SyncNet(nn.Module):
    dtype: jnp.dtype = jnp.float32
    width: float = 1.0  # channel multiplier; 1.0 = reference plan

    def setup(self):
        d = dict(norm="group", dtype=self.dtype)
        w = lambda ch: scale_channels(ch, self.width)
        self.face_blocks = [
            ConvBlock(w(32), 7, 1, 3, **d),
            ConvBlock(w(64), 5, (1, 2), 1, **d),
            ConvBlock(w(64), 3, 1, 1, residual=True, **d),
            ConvBlock(w(64), 3, 1, 1, residual=True, **d),
            ConvBlock(w(128), 3, 2, 1, **d),
            ConvBlock(w(128), 3, 1, 1, residual=True, **d),
            ConvBlock(w(128), 3, 1, 1, residual=True, **d),
            ConvBlock(w(128), 3, 1, 1, residual=True, **d),
            ConvBlock(w(256), 3, 2, 1, **d),
            ConvBlock(w(256), 3, 1, 1, residual=True, **d),
            ConvBlock(w(256), 3, 1, 1, residual=True, **d),
            ConvBlock(w(512), 3, 2, 1, **d),
            ConvBlock(w(512), 3, 1, 1, residual=True, **d),
            ConvBlock(w(512), 3, 1, 1, residual=True, **d),
            ConvBlock(w(512), 3, 2, 1, **d),
            ConvBlock(w(512), 3, 1, 0, **d),
            ConvBlock(w(512), 1, 1, 0, **d),
        ]
        self.audio_blocks = [
            ConvBlock(w(32), 3, 1, 1, **d),
            ConvBlock(w(32), 3, 1, 1, residual=True, **d),
            ConvBlock(w(32), 3, 1, 1, residual=True, **d),
            ConvBlock(w(64), 3, (3, 1), 1, **d),
            ConvBlock(w(64), 3, 1, 1, residual=True, **d),
            ConvBlock(w(64), 3, 1, 1, residual=True, **d),
            ConvBlock(w(128), 3, 3, 1, **d),
            ConvBlock(w(128), 3, 1, 1, residual=True, **d),
            ConvBlock(w(128), 3, 1, 1, residual=True, **d),
            ConvBlock(w(256), 3, (3, 2), 1, **d),
            ConvBlock(w(256), 3, 1, 1, residual=True, **d),
            ConvBlock(w(256), 3, 1, 1, residual=True, **d),
            ConvBlock(w(512), 3, 1, 0, **d),
            ConvBlock(w(512), 1, 1, 0, **d),
        ]

    def __call__(self, mel: jax.Array, faces: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """mel (B, 80, 16, 1); faces (B, 48, 96, 15) — the lower halves of a
        5-frame window, channel-stacked. Returns (audio_emb, face_emb),
        both (B, 512) L2-normalized."""
        a = mel
        for blk in self.audio_blocks:
            a = blk(a)
        f = faces
        for blk in self.face_blocks:
            f = blk(f)
        a = a.reshape(a.shape[0], -1).astype(jnp.float32)
        f = f.reshape(f.shape[0], -1).astype(jnp.float32)
        return l2_normalize(a), l2_normalize(f)


def stack_window_lower_half(window: jax.Array) -> jax.Array:
    """(B, T, H, W, 3) face window → (B, H/2, W, 3·T) SyncNet face input:
    lower half, frames stacked on channels (train_lipreading.py:83-87)."""
    b, t, h, w, c = window.shape
    lower = window[:, :, h // 2 :]
    return lower.transpose(0, 2, 3, 1, 4).reshape(b, h // 2, w, t * c)
