"""Audio+image-conditioned diffusion U-Net.

Capability target: ``UNetAudio`` (video-generation/diffusion/
unet_audio.py:10-86): noisy frame channels ⊕ projected-audio channels ⊕
condition-image channels → UNetModel. As trained, 3 + 128 + 64 = 195 input
channels (unet_audio.py:43-49): audio features are mean-pooled over time,
projected with Linear+ReLU to 128 and broadcast over H×W
(unet_audio.py:52-56); the condition image (first frame) is bilinearly
resized and 1×1-conv'd to 64 channels (unet_audio.py:49,59-60).

TPU redesign: conditioning is split into ``encode_condition`` (run once per
clip) and ``denoise`` (run per step inside ``lax.scan``) — the reference
re-encoded Wav2Vec2 at every sampling step (test.py:57-64). The audio
encoder is the pluggable JAX-native ``AudioFeatureEncoder``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import DiffusionConfig
from .audio_encoder import AudioFeatureEncoder
from .unet import UNetModel


class UNetAudio(nn.Module):
    cfg: DiffusionConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        if c.audio_encoder == "wav2vec2":
            # the weight-portable reference encoder (models/wav2vec2.py;
            # port-wav2vec2 grafts facebook/wav2vec2-base-960h weights into
            # this submodule — unet_audio.py:11-14)
            from .wav2vec2 import Wav2Vec2Encoder

            self.audio_encoder = Wav2Vec2Encoder(
                embed_dim=c.audio_embed_dim, num_layers=c.w2v_num_layers,
                ffn_dim=c.w2v_ffn_dim, num_heads=c.w2v_num_heads,
                conv_dim=c.w2v_conv_dim, conv_kernel=c.w2v_conv_kernel,
                conv_stride=c.w2v_conv_stride,
                pos_conv_kernel=c.w2v_pos_conv_kernel,
                pos_conv_groups=c.w2v_pos_conv_groups, dtype=dtype)
        elif c.audio_encoder == "native":
            self.audio_encoder = AudioFeatureEncoder(
                embed_dim=c.audio_embed_dim, dtype=dtype)
        else:
            raise ValueError(f"unknown audio_encoder {c.audio_encoder!r} "
                             "(native | wav2vec2)")
        self.audio_proj = nn.Dense(c.audio_proj_dim, dtype=jnp.float32)
        self.im_cond_conv = nn.Conv(c.im_cond_channels, (1, 1), dtype=jnp.float32)
        self.unet = UNetModel(
            out_channels=c.im_channels,
            base_channels=c.base_channels,
            channel_mult=c.channel_mult,
            num_res_blocks=c.num_res_blocks,
            attention_resolutions=c.attention_resolutions,
            num_heads=c.num_heads,
            time_embed_dim=c.time_embed_dim,
            dropout=c.dropout,
            dtype=dtype,
            remat=c.remat,
            ring_axis=c.sequence_axis if c.sequence_parallel else None,
        )

    def encode_condition(
        self,
        audio_wave: jax.Array,
        cond_image: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """(B, samples) waveform + (B, h, w, C) condition frame →
        (B, H, W, audio_proj+im_cond) conditioning map, encoded once."""
        c = self.cfg
        feats = self.audio_encoder(audio_wave, deterministic)     # (B, T', 768)
        a = jnp.mean(feats.astype(jnp.float32), axis=1)           # (B, 768)
        a = nn.relu(self.audio_proj(a))                           # (B, 128)
        a_map = jnp.broadcast_to(
            a[:, None, None, :], (a.shape[0], c.im_size, c.im_size, a.shape[-1])
        )
        b, h, w, ch = cond_image.shape
        # bilinear (the reference's F.interpolate defaults to nearest,
        # unet_audio.py:59 — intentional quality upgrade, no weights to port)
        img = jax.image.resize(
            cond_image.astype(jnp.float32), (b, c.im_size, c.im_size, ch), "bilinear"
        )
        i_map = self.im_cond_conv(img)                            # (B, H, W, 64)
        return jnp.concatenate([a_map, i_map], axis=-1)

    def denoise(
        self,
        xt: jax.Array,
        cond_map: jax.Array,
        t: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """One ε-prediction: (B, H, W, C) noisy frame + cond map + (B,) t."""
        h = jnp.concatenate([xt, cond_map.astype(xt.dtype)], axis=-1)
        return self.unet(h, t, deterministic)

    def __call__(
        self,
        xt: jax.Array,
        cond_image: jax.Array,
        audio_wave: jax.Array,
        t: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Single-shot forward matching the reference's signature
        (unet_audio.py:51-66): encode conditioning then denoise."""
        cond = self.encode_condition(audio_wave, cond_image, deterministic)
        return self.denoise(xt, cond, t, deterministic)
