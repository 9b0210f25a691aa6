"""AV-HuBERT video encoder — the weight-port path for the reference's
frozen lipreading expert.

The reference consumes AV-HuBERT through fairseq: it loads an ensemble
checkpoint, rebuilds the encoder with checkpoint surgery, and freezes all
but layers 9-11 (gan-model/avhubert_utils.py:14-134; the criterion use is
train_lipreading.py:128-133). A torch/fairseq runtime has no place in a
TPU-native framework, so the *architecture* of the public AV-HuBERT video
path is implemented here natively in Flax:

- video frontend: 3-D conv stem (5x7x7, temporal stride 1, spatial /2) +
  BatchNorm + channel PReLU + 1x3x3 max-pool /2, then a per-frame
  ResNet-18 trunk (PReLU variant) global-average-pooled to 512-d;
- modality fuse: video features projected to the encoder width and
  concatenated after a zero audio slot (fairseq zero-fills the audio
  features when ``source["audio"] is None`` — exactly the GAN expert's
  video-only call), LayerNorm over the fused vector, then
  ``post_extract_proj`` back to the encoder width;
- fairseq post-norm transformer encoder: grouped weight-normed conv
  positional embedding (kernel 128 / 16 groups + SamePad + GELU), an
  encoder-input LayerNorm (the ``layer_norm_first=False`` base layout),
  and N post-norm self-attention blocks.

``convert_avhubert_state_dict`` maps the fairseq ``state["model"]`` key
layout onto this module. All BatchNorms are FOLDED into per-channel affine
scale/bias at conversion time (the port is a frozen inference artifact, so
carrying running stats through the compute path would only cost HBM reads)
— the Flax module therefore has no batch_stats collection at all.

Inputs follow ``avhubert_video_transform`` (models/lip_expert.py):
(B, T, 88, 88, 1) normalized grayscale mouth crops → (B, T, embed_dim)
per-frame features. The module satisfies the ``LipExpert`` feature
protocol, so a ported encoder drops into ``train-gan
--lip-expert-checkpoint`` as the frozen feature-matching expert.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import mha


class _Affine(nn.Module):
    """Per-channel scale/bias — a BatchNorm with its running stats folded
    in at conversion time (see module docstring)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class _ChannelPReLU(nn.Module):
    """torch ``nn.PReLU(num_parameters=C)``: per-channel learned negative
    slope (the av_hubert ResNet's ``relu_type='prelu'``)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.features,), jnp.float32)
        a = alpha.astype(self.dtype)
        return jnp.where(x >= 0, x, a * x)


class _BasicBlock(nn.Module):
    """ResNet-18 basic block, PReLU variant, folded-BN."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = _Affine(self.features, self.dtype, name="bn1")(h)
        h = _ChannelPReLU(self.features, self.dtype, name="relu1")(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = _Affine(self.features, self.dtype, name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            residual = _Affine(self.features, self.dtype, name="down_bn")(residual)
        return _ChannelPReLU(self.features, self.dtype, name="relu2")(h + residual)


class _EncoderLayer(nn.Module):
    """fairseq post-norm transformer layer (TransformerSentenceEncoderLayer
    with ``layer_norm_first=False``): residual-then-norm for both the
    self-attention and FFN sublayers, GELU activation."""

    num_heads: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        e = x.shape[-1]
        q = nn.Dense(e, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(e, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(e, dtype=self.dtype, name="v_proj")(x)
        attn = nn.Dense(e, dtype=self.dtype, name="out_proj")(
            mha(q, k, v, self.num_heads))
        x = nn.LayerNorm(dtype=self.dtype, name="self_attn_ln")(x + attn)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.Dense(e, dtype=self.dtype, name="fc2")(nn.gelu(h, approximate=False))
        return nn.LayerNorm(dtype=self.dtype, name="final_ln")(x + h)


class AVHubertVideoEncoder(nn.Module):
    """(B, T, 88, 88, 1) transformed mouth video → (B, T, embed_dim).

    Defaults are the AV-HuBERT *base* configuration (12 layers / 768 wide /
    12 heads / 3072 FFN, ResNet stem base 64) — the configuration the
    reference fine-tunes layers 9-11 of (avhubert_utils.py:115-118).
    ``resnet_base`` and the transformer knobs scale down for CPU-tier
    parity tests.
    """

    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    resnet_base: int = 64
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array, deterministic: bool = True) -> jax.Array:
        if video.ndim != 5:
            raise ValueError(f"expected (B, T, H, W, 1) video, got {video.shape}")
        b, t = video.shape[:2]
        base = self.resnet_base
        x = video.astype(self.dtype)

        # --- frontend3D: Conv3d(1, base, (5,7,7), (1,2,2)) + BN + PReLU +
        # MaxPool3d((1,3,3), (1,2,2)) (av_hubert resnet.py ResEncoder)
        x = nn.Conv(base, (5, 7, 7), strides=(1, 2, 2),
                    padding=((2, 2), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="frontend_conv")(x)
        x = _Affine(base, self.dtype, name="frontend_bn")(x)
        x = _ChannelPReLU(base, self.dtype, name="frontend_prelu")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))

        # --- per-frame ResNet-18 trunk → GAP → (B, T, 8·base)
        h, w, c = x.shape[2:]
        x = x.reshape(b * t, h, w, c)
        plan: List[Tuple[int, int]] = [(base, 1), (2 * base, 2),
                                       (4 * base, 2), (8 * base, 2)]
        for li, (feats, stride) in enumerate(plan, start=1):
            for bi in range(2):
                x = _BasicBlock(feats, stride if bi == 0 else 1, self.dtype,
                                name=f"layer{li}_block{bi}")(x)
        x = jnp.mean(x, axis=(1, 2)).reshape(b, t, 8 * base)

        # --- modality fuse: audio slot zero-filled (video-only call),
        # video projected to encoder width; concat order [audio, video]
        # matches fairseq's forward_features.
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="video_proj")(x)
        fused = jnp.concatenate([jnp.zeros_like(v), v], axis=-1)
        fused = nn.LayerNorm(dtype=self.dtype, name="fuse_ln")(fused)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="post_extract_proj")(fused)

        # --- conv positional embedding: grouped conv + SamePad + GELU
        pos = nn.Conv(self.embed_dim, (self.pos_conv_kernel,),
                      padding=self.pos_conv_kernel // 2,
                      feature_group_count=self.pos_conv_groups,
                      dtype=self.dtype, name="pos_conv")(x)
        if self.pos_conv_kernel % 2 == 0:   # fairseq SamePad trims the tail
            pos = pos[:, :-1]
        x = x + nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(dtype=self.dtype, name="encoder_ln")(x)

        for i in range(self.num_layers):
            x = _EncoderLayer(self.num_heads, self.ffn_dim, self.dtype,
                              name=f"enc_layer_{i}")(x)
        return x.astype(jnp.float32)

    def encode(self, video: jax.Array, deterministic: bool = True) -> jax.Array:
        """LipExpert-protocol alias (models/lip_expert.ConformerLipEncoder
        exposes the same method) so a ported encoder drops into the GAN's
        feature-matching expert loss unchanged."""
        return self(video, deterministic)


# ---------------------------------------------------------------------------
# fairseq state_dict → Flax conversion
# ---------------------------------------------------------------------------

_BN_EPS = 1e-5


def _folded_bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """BatchNorm (weight, bias, running stats) → frozen affine scale/bias."""
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float64)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float64)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float64)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float64)
    scale = gamma / np.sqrt(var + _BN_EPS)
    bias = beta - mean * scale
    return {"scale": scale.astype(np.float32), "bias": bias.astype(np.float32)}


def _linear(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def infer_config(sd: Dict[str, np.ndarray], num_heads: Optional[int] = None,
                 pos_conv_groups: Optional[int] = None) -> Dict[str, int]:
    """Read the architecture hyperparameters off the checkpoint itself so
    base/large checkpoints port without a config file. Head count and conv
    groups are not recoverable from tensor shapes; defaults are the base
    config's (12 heads, 16 groups) with overrides for other variants."""
    embed_dim = int(np.asarray(sd["post_extract_proj.weight"]).shape[0])
    layers = 0
    while f"encoder.layers.{layers}.fc1.weight" in sd:
        layers += 1
    if layers == 0:
        raise ValueError("no encoder.layers.* keys — not an AV-HuBERT state_dict")
    ffn_dim = int(np.asarray(sd["encoder.layers.0.fc1.weight"]).shape[0])
    resnet_base = int(np.asarray(
        sd["feature_extractor_video.resnet.frontend3D.0.weight"]).shape[0])
    pos_kernel = int(np.asarray(sd["encoder.pos_conv.0.weight_v"]).shape[-1])
    return {
        "embed_dim": embed_dim,
        "num_layers": layers,
        "num_heads": int(num_heads or max(1, embed_dim // 64)),
        "ffn_dim": ffn_dim,
        "resnet_base": resnet_base,
        "pos_conv_kernel": pos_kernel,
        "pos_conv_groups": int(pos_conv_groups or 16),
    }


def convert_avhubert_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict[str, Any], Dict[str, int], List[str]]:
    """fairseq AV-HuBERT ``state["model"]`` → (params, config, skipped).

    Key layout follows the public av_hubert repo (hubert.py AVHubertModel +
    resnet.py ResEncoder + fairseq wav2vec2 TransformerEncoder) — the same
    tree the reference's checkpoint surgery indexes into with the
    ``encoder.`` prefix (avhubert_utils.py:106-110). Returns the list of
    keys intentionally skipped (audio frontend, pretraining heads, decoder)
    so callers can surface anything unexpected.
    """
    cfg = infer_config(sd)
    params: Dict[str, Any] = {}
    consumed: set = set()

    def take(*keys: str) -> None:
        consumed.update(k for k in keys if k in sd)

    vp = "feature_extractor_video.resnet"
    # frontend3D: 0 conv / 1 bn / 2 prelu
    params["frontend_conv"] = {
        "kernel": np.asarray(sd[f"{vp}.frontend3D.0.weight"]).transpose(2, 3, 4, 1, 0)}
    params["frontend_bn"] = _folded_bn(sd, f"{vp}.frontend3D.1")
    params["frontend_prelu"] = {"alpha": np.asarray(sd[f"{vp}.frontend3D.2.weight"])}
    take(f"{vp}.frontend3D.0.weight",
         *(f"{vp}.frontend3D.1.{s}" for s in
           ("weight", "bias", "running_mean", "running_var", "num_batches_tracked")),
         f"{vp}.frontend3D.2.weight")

    for li in range(1, 5):
        for bi in range(2):
            tp = f"{vp}.trunk.layer{li}.{bi}"
            blk: Dict[str, Any] = {
                "conv1": {"kernel": np.asarray(sd[f"{tp}.conv1.weight"]).transpose(2, 3, 1, 0)},
                "bn1": _folded_bn(sd, f"{tp}.bn1"),
                "relu1": {"alpha": np.asarray(sd[f"{tp}.relu1.weight"])},
                "conv2": {"kernel": np.asarray(sd[f"{tp}.conv2.weight"]).transpose(2, 3, 1, 0)},
                "bn2": _folded_bn(sd, f"{tp}.bn2"),
                "relu2": {"alpha": np.asarray(sd[f"{tp}.relu2.weight"])},
            }
            take(f"{tp}.conv1.weight", f"{tp}.conv2.weight",
                 f"{tp}.relu1.weight", f"{tp}.relu2.weight",
                 *(f"{tp}.bn{n}.{s}" for n in (1, 2) for s in
                   ("weight", "bias", "running_mean", "running_var", "num_batches_tracked")))
            if f"{tp}.downsample.0.weight" in sd:
                blk["down_conv"] = {
                    "kernel": np.asarray(sd[f"{tp}.downsample.0.weight"]).transpose(2, 3, 1, 0)}
                blk["down_bn"] = _folded_bn(sd, f"{tp}.downsample.1")
                take(f"{tp}.downsample.0.weight",
                     *(f"{tp}.downsample.1.{s}" for s in
                       ("weight", "bias", "running_mean", "running_var",
                        "num_batches_tracked")))
            params[f"layer{li}_block{bi}"] = blk

    params["video_proj"] = _linear(sd, "feature_extractor_video.proj")
    params["fuse_ln"] = _ln(sd, "layer_norm")
    params["post_extract_proj"] = _linear(sd, "post_extract_proj")
    take("feature_extractor_video.proj.weight", "feature_extractor_video.proj.bias",
         "layer_norm.weight", "layer_norm.bias",
         "post_extract_proj.weight", "post_extract_proj.bias")

    # pos_conv: weight-normed grouped Conv1d — compose g·v/||v|| (torch
    # weight_norm dim=2: the norm runs over (out, in) per kernel position).
    g = np.asarray(sd["encoder.pos_conv.0.weight_g"], np.float64)
    v = np.asarray(sd["encoder.pos_conv.0.weight_v"], np.float64)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = (g * v / norm).astype(np.float32)              # (O, I/g, K)
    params["pos_conv"] = {"kernel": w.transpose(2, 1, 0),
                          "bias": np.asarray(sd["encoder.pos_conv.0.bias"])}
    take("encoder.pos_conv.0.weight_g", "encoder.pos_conv.0.weight_v",
         "encoder.pos_conv.0.bias")

    params["encoder_ln"] = _ln(sd, "encoder.layer_norm")
    take("encoder.layer_norm.weight", "encoder.layer_norm.bias")
    for i in range(cfg["num_layers"]):
        lp = f"encoder.layers.{i}"
        params[f"enc_layer_{i}"] = {
            "q_proj": _linear(sd, f"{lp}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{lp}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{lp}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
            "self_attn_ln": _ln(sd, f"{lp}.self_attn_layer_norm"),
            "fc1": _linear(sd, f"{lp}.fc1"),
            "fc2": _linear(sd, f"{lp}.fc2"),
            "final_ln": _ln(sd, f"{lp}.final_layer_norm"),
        }
        take(*(f"{lp}.self_attn.{p}_proj.{s}" for p in ("q", "k", "v", "out")
               for s in ("weight", "bias")),
             f"{lp}.self_attn_layer_norm.weight", f"{lp}.self_attn_layer_norm.bias",
             f"{lp}.fc1.weight", f"{lp}.fc1.bias",
             f"{lp}.fc2.weight", f"{lp}.fc2.bias",
             f"{lp}.final_layer_norm.weight", f"{lp}.final_layer_norm.bias")

    skipped = sorted(k for k in sd if k not in consumed)
    expected_skips = ("feature_extractor_audio.", "decoder.", "final_proj.",
                      "mask_emb", "label_embs_concat")
    unexpected = [k for k in skipped if not k.startswith(expected_skips)]
    if unexpected:
        raise ValueError(
            "unrecognized AV-HuBERT checkpoint keys (layout drift?): "
            + ", ".join(unexpected[:20]))
    return params, cfg, skipped
