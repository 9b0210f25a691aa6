"""Visual-quality discriminator over lower-half faces.

Redesign of ``Discriminator`` (gan-model/model/discriminator.py:6-76): same
capability — binary real/fake over the lower half of each frame, unnormed
convs with LeakyReLU(0.01), T folded into batch — in NHWC Flax. The
generator-side adversarial loss ``perceptual_forward``
(discriminator.py:42-53) lives in pipelines/losses.py as a pure function.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBlock, fold_time, scale_channels


def lower_half(faces: jax.Array) -> jax.Array:
    """(..., H, W, C) → lower half rows (discriminator.py:34-35)."""
    h = faces.shape[-3]
    return faces[..., h // 2 :, :, :]



class Discriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32
    width: float = 1.0  # channel multiplier; 1.0 = reference plan

    @nn.compact
    def __call__(self, faces: jax.Array) -> jax.Array:
        """faces (B, T, 96, 96, 3) or (B, 96, 96, 3) in [0,1] →
        per-folded-frame real probability (B·T, 1)."""
        if faces.ndim == 5:
            faces, _ = fold_time(faces)
        x = lower_half(faces)                                      # (B, 48, 96, 3)
        d = dict(norm="none", act="leaky", dtype=self.dtype)
        w = lambda ch: scale_channels(ch, self.width)
        x = ConvBlock(w(32), 7, 1, 3, **d)(x)                         # 48x96
        x = ConvBlock(w(64), 5, (1, 2), 2, **d)(x)                    # 48x48
        x = ConvBlock(w(64), 5, 1, 2, **d)(x)
        x = ConvBlock(w(128), 5, 2, 2, **d)(x)                        # 24x24
        x = ConvBlock(w(128), 5, 1, 2, **d)(x)
        x = ConvBlock(w(256), 5, 2, 2, **d)(x)                        # 12x12
        x = ConvBlock(w(256), 5, 1, 2, **d)(x)
        x = ConvBlock(w(512), 3, 2, 1, **d)(x)                        # 6x6
        x = ConvBlock(w(512), 3, 1, 1, **d)(x)
        x = ConvBlock(w(512), 3, 2, 1, **d)(x)                        # 3x3
        x = ConvBlock(w(512), 3, 1, 1, **d)(x)
        x = ConvBlock(w(512), 3, 1, 0, **d)(x)                        # 1x1
        x = ConvBlock(w(512), 1, 1, 0, **d)(x)
        logit = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        return nn.sigmoid(logit.astype(jnp.float32)).reshape(x.shape[0], 1)
