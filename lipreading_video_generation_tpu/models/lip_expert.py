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

from typing import Optional

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
    """(B, T, 88, 88, 1) mouth video → (B, T, embed_dim) features.

    ``stem_base`` scales the conv-frontend channel plan (base, 2·base,
    4·base); the default 64 matches AV-HuBERT's ResNet stem scale, smaller
    values make CPU-tier proof tests tractable."""

    embed_dim: int = 768
    num_layers: int = 6
    num_heads: int = 8
    stem_base: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, deterministic: bool = True) -> jax.Array:
        b, t = video.shape[:2]
        x = video.astype(self.dtype)
        # 3-D conv frontend: spatiotemporal stem then spatial reduction
        x = nn.Conv(self.stem_base, (5, 7, 7), strides=(1, 2, 2),
                    padding=((2, 2), (3, 3), (3, 3)), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(2 * self.stem_base, (1, 3, 3), strides=(1, 2, 2),
                    padding=((0, 0), (1, 1), (1, 1)), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(4 * self.stem_base, (1, 3, 3), strides=(1, 2, 2),
                    padding=((0, 0), (1, 1), (1, 1)), dtype=self.dtype)(x)
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


# ---------------------------------------------------------------------------
# Text-conditioned expert: character seq2seq over lip features — the native
# analog of the reference's AV-HuBERT + label-smoothed seq2seq criterion
# (gan-model/train_lipreading.py:130-133, avhubert_utils.py:71-110 criterion
# build + :136-212 text collators). Character tokens replace the fairseq
# unigram dictionary; a small transformer decoder replaces the fairseq
# TransformerDecoder.
# ---------------------------------------------------------------------------

PAD_ID = 0
BOS_ID = 1
_CHARS = " abcdefghijklmnopqrstuvwxyz'"
CHAR_TO_ID = {c: i + 2 for i, c in enumerate(_CHARS)}
VOCAB_SIZE = 2 + len(_CHARS)


def encode_transcript(text: str, max_len: int = 48):
    """Lowercased transcript → (max_len,) int32 char ids, PAD-padded.
    Unknown characters are dropped (the collators' dictionary-encode role,
    avhubert_utils.py:171-189)."""
    import numpy as np

    ids = [CHAR_TO_ID[c] for c in text.lower() if c in CHAR_TO_ID][:max_len]
    out = np.full((max_len,), PAD_ID, np.int32)
    out[: len(ids)] = ids
    return out


def decode_tokens(tokens) -> str:
    inv = {v: k for k, v in CHAR_TO_ID.items()}
    return "".join(inv.get(int(t), "") for t in tokens if int(t) > 1)


class DecoderBlock(nn.Module):
    """Pre-LN transformer decoder block: causal self-attention over the
    token sequence + cross-attention into the lip-encoder features."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        from ..ops.attention import mha

        e = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype)(x)
        qkv = nn.Dense(3 * e, dtype=self.dtype, name="self_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + nn.Dense(e, dtype=self.dtype, name="self_proj")(
            mha(q, k, v, self.num_heads, causal=True)
        )
        h = nn.LayerNorm(dtype=self.dtype)(x)
        q = nn.Dense(e, dtype=self.dtype, name="cross_q")(h)
        kv = nn.Dense(2 * e, dtype=self.dtype, name="cross_kv")(memory)
        k, v = jnp.split(kv, 2, axis=-1)
        x = x + nn.Dense(e, dtype=self.dtype, name="cross_proj")(
            mha(q, k, v, self.num_heads)
        )
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + nn.Dense(e, dtype=self.dtype)(
            nn.gelu(nn.Dense(4 * e, dtype=self.dtype)(h))
        )
        return x


class LipExpertSeq2Seq(nn.Module):
    """Conformer lip encoder + character transformer decoder.

    ``encode(video)`` → (B, T, E) features (the feature-matching fallback
    path); ``__call__(video, tokens_in)`` → (B, L, VOCAB_SIZE) next-char
    logits under teacher forcing."""

    embed_dim: int = 256
    enc_layers: int = 2
    dec_layers: int = 2
    num_heads: int = 4
    max_text_len: int = 48
    stem_base: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ConformerLipEncoder(
            embed_dim=self.embed_dim, num_layers=self.enc_layers,
            num_heads=self.num_heads, stem_base=self.stem_base,
            dtype=self.dtype, name="encoder",
        )
        self.tok_embed = nn.Embed(VOCAB_SIZE, self.embed_dim, dtype=self.dtype)
        self.pos_embed = self.param(
            "dec_pos", nn.initializers.normal(0.02),
            (1, self.max_text_len, self.embed_dim), jnp.float32,
        )
        self.blocks = [
            DecoderBlock(self.num_heads, dtype=self.dtype, name=f"dec_{i}")
            for i in range(self.dec_layers)
        ]
        self.out_norm = nn.LayerNorm(dtype=self.dtype)
        self.head = nn.Dense(VOCAB_SIZE, dtype=self.dtype)

    def encode(self, video: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.encoder(video, deterministic)

    def __call__(self, video: jax.Array, tokens_in: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        memory = self.encoder(video, deterministic)
        x = self.tok_embed(tokens_in.astype(jnp.int32))
        x = x + self.pos_embed[:, : x.shape[1]].astype(self.dtype)
        for blk in self.blocks:
            x = blk(x, memory, deterministic)
        return self.head(self.out_norm(x)).astype(jnp.float32)


def seq2seq_expert_loss(
    model: LipExpertSeq2Seq,
    params,
    video_rgb: jax.Array,     # (B, T, H, W, C) uint8-scale
    tokens: jax.Array,        # (B, L) char ids, PAD-padded
    token_dropout_key: Optional[jax.Array] = None,
    token_dropout: float = 0.3,
) -> jax.Array:
    """Teacher-forced character CE of the (frozen) expert reading the video
    against the transcript — the text-conditioned criterion role of
    train_lipreading.py:130-133. Gradients flow into the video (i.e. the
    generator), not the expert.

    ``token_dropout_key`` (expert PRETRAINING only — the GAN criterion
    evaluates deterministically) replaces that fraction of the teacher-
    forced INPUT chars with PAD. Without it the decoder settles into the
    unconditional char-LM minimum and never learns to read the video:
    measured on word-coded synthetic clips, the encoder's features linearly
    separate the words (0.77 val probe accuracy untrained) yet the
    fully-teacher-forced seq2seq converges to transcript-independent losses
    (margin ≈ 0); masking input chars forces the decoder through
    cross-attention."""
    video = avhubert_video_transform(video_rgb)
    tokens = tokens.astype(jnp.int32)
    bos = jnp.full((tokens.shape[0], 1), BOS_ID, jnp.int32)
    tokens_in = jnp.concatenate([bos, tokens[:, :-1]], axis=1)
    if token_dropout_key is not None and token_dropout > 0.0:
        keep = jax.random.bernoulli(
            token_dropout_key, 1.0 - token_dropout, tokens_in.shape)
        keep = keep | (tokens_in == BOS_ID)    # never drop BOS
        tokens_in = jnp.where(keep, tokens_in, PAD_ID)
    logits = model.apply({"params": params}, video, tokens_in)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    mask = (tokens != PAD_ID).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
