"""JAX-native audio feature encoder — the Wav2Vec2-analog.

The reference conditions its diffusion model on HF
``facebook/wav2vec2-base-960h`` embeddings computed *inside* the forward
pass (video-generation/diffusion/unet_audio.py:11-14,52), and re-encodes
them at every one of the 500 sampling steps (test.py:57-64). In this
framework the audio encoder is a pluggable interface (SURVEY.md §7 hard
part #6): the default is this JAX-native encoder (log-mel frontend from
ops/audio + conv subsampling + transformer encoder → (B, T', embed_dim)
features, wav2vec2-shaped with embed_dim=768); an external weight-ported
encoder can be substituted by matching ``__call__``'s signature.

Conditioning is encoded ONCE per clip and reused across denoise steps
(see pipelines/sample_diffusion.py) — hoisting it out of the scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import AudioConfig
from ..ops import audio as audio_ops
from .layers import TransformerBlock


class AudioFeatureEncoder(nn.Module):
    """Raw waveform (B, samples) → frame features (B, T', embed_dim)."""

    embed_dim: int = 768
    num_layers: int = 4
    num_heads: int = 8
    audio_cfg: AudioConfig = AudioConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wave: jax.Array, deterministic: bool = True) -> jax.Array:
        # (B, samples) → (B, 80, T) log-mel → (B, T, 80)
        mel = audio_ops.melspectrogram(wave, self.audio_cfg)
        x = jnp.swapaxes(mel, -1, -2).astype(self.dtype)
        # conv subsampling ×2 over time
        x = nn.Conv(self.embed_dim // 2, (5,), strides=(2,), padding=2, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Conv(self.embed_dim, (3,), strides=(1,), padding=1, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(0.02), (1, x.shape[1], self.embed_dim),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        for i in range(self.num_layers):
            x = TransformerBlock(self.num_heads, 4 * self.embed_dim, dtype=self.dtype,
                                 name=f"block_{i}")(x, deterministic)
        return nn.LayerNorm(dtype=self.dtype)(x)
