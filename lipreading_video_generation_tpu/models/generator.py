"""Talking-face generator: audio-conditioned U-Net over 5-frame face windows.

TPU-native redesign of ``Talking_Face_Generator``
(gan-model/model/generator.py:5-235): same capability and channel plan —
6-channel input (masked target window ⊕ reference window, generator.py:11),
7 face-encoder stages 16→32→64→128→256→512→512 with skips
(generator.py:10-63), mel audio encoder to a 512-d 1×1 embedding
(generator.py:66-92), 7 decoder stages with skip concatenation
(generator.py:95-146), sigmoid RGB output (generator.py:151-157) — but
NHWC + GroupNorm + resize-conv decoders (see models/layers.py), and the
(B, T) window fold is a reshape (generator.py:168-224's torch.cat dance).

Inputs:  mel (B, T, 80, 16, 1), faces (B, T, 96, 96, 6), both folded to B·T.
Output:  (B, T, 96, 96, 3) in [0, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBlock, ResConvBlock, UpsampleConv, fold_time, unfold_time, scale_channels



class AudioEncoder(nn.Module):
    """(B, 80, 16, 1) mel window → (B, 1, 1, 512·width) embedding
    (generator.py:66-92 channel/stride plan)."""

    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        d = dict(norm=self.norm, dtype=self.dtype)
        w = lambda ch: scale_channels(ch, self.width)
        x = ConvBlock(w(32), 3, 1, 1, **d)(mel)
        x = ResConvBlock(w(32), self.norm, self.dtype)(x)
        x = ResConvBlock(w(32), self.norm, self.dtype)(x)
        x = ConvBlock(w(64), 3, (3, 1), 1, **d)(x)        # 80x16 → 27x16
        x = ResConvBlock(w(64), self.norm, self.dtype)(x)
        x = ResConvBlock(w(64), self.norm, self.dtype)(x)
        x = ConvBlock(w(128), 3, 3, 1, **d)(x)            # 27x16 → 9x6
        x = ResConvBlock(w(128), self.norm, self.dtype)(x)
        x = ResConvBlock(w(128), self.norm, self.dtype)(x)
        x = ConvBlock(w(256), 3, (3, 2), 1, **d)(x)       # 9x6 → 3x3
        x = ResConvBlock(w(256), self.norm, self.dtype)(x)
        x = ConvBlock(w(512), 3, 1, 0, **d)(x)            # 3x3 → 1x1
        x = ConvBlock(w(512), 1, 1, 0, **d)(x)
        return x


class FaceEncoder(nn.Module):
    """(B, 96, 96, 6) → list of 7 skip features, deepest last
    (generator.py:10-63)."""

    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array):
        d = dict(norm=self.norm, dtype=self.dtype)
        w = lambda ch: scale_channels(ch, self.width)
        feats = []
        x = ConvBlock(w(16), 7, 1, 3, **d)(x)                          # 96
        feats.append(x)
        x = ConvBlock(w(32), 3, 2, 1, **d)(x)                          # 48
        x = ResConvBlock(w(32), self.norm, self.dtype)(x)
        x = ResConvBlock(w(32), self.norm, self.dtype)(x)
        feats.append(x)
        x = ConvBlock(w(64), 3, 2, 1, **d)(x)                          # 24
        for _ in range(3):
            x = ResConvBlock(w(64), self.norm, self.dtype)(x)
        feats.append(x)
        x = ConvBlock(w(128), 3, 2, 1, **d)(x)                         # 12
        x = ResConvBlock(w(128), self.norm, self.dtype)(x)
        x = ResConvBlock(w(128), self.norm, self.dtype)(x)
        feats.append(x)
        x = ConvBlock(w(256), 3, 2, 1, **d)(x)                         # 6
        x = ResConvBlock(w(256), self.norm, self.dtype)(x)
        x = ResConvBlock(w(256), self.norm, self.dtype)(x)
        feats.append(x)
        x = ConvBlock(w(512), 3, 2, 1, **d)(x)                         # 3
        x = ResConvBlock(w(512), self.norm, self.dtype)(x)
        feats.append(x)
        x = ConvBlock(w(512), 3, 1, 0, **d)(x)                         # 1
        x = ConvBlock(w(512), 1, 1, 0, **d)(x)
        feats.append(x)
        return feats


class FaceDecoder(nn.Module):
    """512-d audio embedding + skips → (B, 96, 96, 3) sigmoid RGB
    (generator.py:95-157)."""

    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, audio_emb: jax.Array, feats) -> jax.Array:
        d = dict(norm=self.norm, dtype=self.dtype)
        w = lambda ch: scale_channels(ch, self.width)
        feats = list(feats)
        x = ConvBlock(w(512), 1, 1, 0, **d)(audio_emb)                 # 1x1
        x = jnp.concatenate([x, feats.pop()], axis=-1)              # 1024 @ 1
        x = UpsampleConv(w(512), (3, 3), self.norm, self.dtype)(x)
        x = ResConvBlock(w(512), self.norm, self.dtype)(x)
        x = jnp.concatenate([x, feats.pop()], axis=-1)              # 1024 @ 3
        x = UpsampleConv(w(512), (6, 6), self.norm, self.dtype)(x)
        x = ResConvBlock(w(512), self.norm, self.dtype)(x)
        x = ResConvBlock(w(512), self.norm, self.dtype)(x)
        x = jnp.concatenate([x, feats.pop()], axis=-1)              # 768 @ 6
        x = UpsampleConv(w(384), (12, 12), self.norm, self.dtype)(x)
        x = ResConvBlock(w(384), self.norm, self.dtype)(x)
        x = ResConvBlock(w(384), self.norm, self.dtype)(x)
        x = jnp.concatenate([x, feats.pop()], axis=-1)              # 512 @ 12
        x = UpsampleConv(w(256), (24, 24), self.norm, self.dtype)(x)
        x = ResConvBlock(w(256), self.norm, self.dtype)(x)
        x = ResConvBlock(w(256), self.norm, self.dtype)(x)
        x = jnp.concatenate([x, feats.pop()], axis=-1)              # 320 @ 24
        x = UpsampleConv(w(128), (48, 48), self.norm, self.dtype)(x)
        x = ResConvBlock(w(128), self.norm, self.dtype)(x)
        x = ResConvBlock(w(128), self.norm, self.dtype)(x)
        x = jnp.concatenate([x, feats.pop()], axis=-1)              # 160 @ 48
        x = UpsampleConv(w(64), (96, 96), self.norm, self.dtype)(x)
        x = ResConvBlock(w(64), self.norm, self.dtype)(x)
        x = ResConvBlock(w(64), self.norm, self.dtype)(x)
        x = jnp.concatenate([x, feats.pop()], axis=-1)              # 80 @ 96
        x = ConvBlock(w(32), 3, 1, 1, **d)(x)
        x = nn.Conv(3, (1, 1), dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))


class TalkingFaceGenerator(nn.Module):
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    width: float = 1.0  # channel multiplier; 1.0 = reference plan

    @nn.compact
    def __call__(self, mel: jax.Array, faces: jax.Array) -> jax.Array:
        """mel (B, T, 80, 16, 1) or (B, 80, 16, 1); faces (B, T, 96, 96, 6)
        or (B, 96, 96, 6). Returns matching layout with 3 output channels."""
        folded = faces.ndim == 5
        if folded:
            mel, b = fold_time(mel)
            faces, _ = fold_time(faces)
        emb = AudioEncoder(self.norm, self.dtype, self.width)(mel)
        feats = FaceEncoder(self.norm, self.dtype, self.width)(faces)
        out = FaceDecoder(self.norm, self.dtype, self.width)(emb, feats)
        if folded:
            out = unfold_time(out, b)
        return out
