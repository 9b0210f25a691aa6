"""Wav2Vec2 speech encoder — the weight-port path for the reference's
pretrained diffusion audio conditioning.

The reference conditions its diffusion U-Net on HF
``facebook/wav2vec2-base-960h`` embeddings (video-generation/diffusion/
unet_audio.py:11-14,52; tokenizer at dataset.py:130). The framework's
default audio encoder is the from-scratch ``AudioFeatureEncoder``
(models/audio_encoder.py) — interface-compatible but a different
representation. This module closes the port matrix: the *architecture* of
the wav2vec2 encoder implemented natively in Flax, plus a converter from
the HF torch state_dict, so a real ``facebook/wav2vec2-base-960h``
checkpoint drops into ``UNetAudio`` via ``DiffusionConfig(audio_encoder=
"wav2vec2")`` + ``port-wav2vec2``.

Architecture (HF ``Wav2Vec2Model``, base layout ``do_stable_layer_norm=
False``):
- feature extractor: 7 no-bias Conv1d layers (512 ch; kernels
  10,3,3,3,3,2,2; strides 5,2,2,2,2,2,2), per-channel GroupNorm after the
  first conv only (``feat_extract_norm="group"``), exact GELU;
- feature projection: LayerNorm(512) → Linear(512→768);
- encoder: grouped weight-normed conv positional embedding (kernel 128 /
  16 groups, SamePad tail-trim, GELU) added to the input, encoder-input
  LayerNorm, then N *post-norm* self-attention layers — byte-for-byte the
  fairseq layout ``models/avhubert._EncoderLayer`` already implements, so
  the layer is reused.

Whole-model parity vs the in-env HF ``Wav2Vec2Model`` (transformers is a
baked-in test dependency) is pinned by tests/test_weight_ports.py.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .avhubert import _EncoderLayer, _linear, _ln


class Wav2Vec2Encoder(nn.Module):
    """Raw waveform (B, samples) → frame features (B, T', embed_dim).

    Defaults are the wav2vec2-*base* configuration (the checkpoint the
    reference loads). Inputs are expected zero-mean/unit-variance per
    utterance — the HF processor's ``do_normalize=True`` convention
    (reference dataset.py:130); ``pipelines/train_diffusion.normalize_audio``
    applies exactly that, so the port slots into ``encode_condition``
    unchanged.
    """

    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wave: jax.Array, deterministic: bool = True) -> jax.Array:
        if wave.ndim != 2:
            raise ValueError(f"expected (B, samples) waveform, got {wave.shape}")
        x = wave[..., None].astype(self.dtype)          # (B, samples, 1)
        for i, (c, k, s) in enumerate(
                zip(self.conv_dim, self.conv_kernel, self.conv_stride)):
            x = nn.Conv(c, (k,), strides=(s,), padding="VALID", use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            if i == 0:
                # feat_extract_norm="group": GroupNorm(groups=C, channels=C)
                # — per-channel normalization over time
                x = nn.GroupNorm(num_groups=c, dtype=self.dtype,
                                 name="conv_gn")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(dtype=self.dtype, name="proj_ln")(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)

        pos = nn.Conv(self.embed_dim, (self.pos_conv_kernel,),
                      padding=self.pos_conv_kernel // 2,
                      feature_group_count=self.pos_conv_groups,
                      dtype=self.dtype, name="pos_conv")(x)
        if self.pos_conv_kernel % 2 == 0:   # SamePad trims the tail
            pos = pos[:, :-1]
        x = x + nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(dtype=self.dtype, name="encoder_ln")(x)
        for i in range(self.num_layers):
            x = _EncoderLayer(self.num_heads, self.ffn_dim, self.dtype,
                              name=f"enc_layer_{i}")(x)
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# HF torch state_dict → Flax conversion
# ---------------------------------------------------------------------------

def _strip_hf_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """``Wav2Vec2ForCTC`` nests the encoder under ``wav2vec2.``; a bare
    ``Wav2Vec2Model`` state_dict has no prefix. Normalize to the bare
    layout and drop CTC/quantizer heads (they are not part of the encoder
    the reference consumes — unet_audio.py:52 reads last_hidden_state)."""
    if not any(k.startswith("wav2vec2.") for k in sd):
        return dict(sd)
    return {k[len("wav2vec2."):]: v for k, v in sd.items()
            if k.startswith("wav2vec2.")}


def _pos_conv_weight(sd: Dict[str, np.ndarray], consumed: set) -> np.ndarray:
    """Compose the weight-normed pos-conv kernel g·v/||v|| (dim=2: the norm
    runs over (out, in) per kernel position). Newer torch serializes
    weight_norm as ``parametrizations.weight.original{0,1}`` instead of
    ``weight_{g,v}`` — accept both layouts."""
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in sd:
        gk, vk = f"{base}.weight_g", f"{base}.weight_v"
    elif f"{base}.parametrizations.weight.original0" in sd:
        gk = f"{base}.parametrizations.weight.original0"
        vk = f"{base}.parametrizations.weight.original1"
    else:
        raise ValueError("no pos_conv weight_norm keys in state_dict")
    g = np.asarray(sd[gk], np.float64)
    v = np.asarray(sd[vk], np.float64)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    consumed.update((gk, vk))
    return (g * v / norm).astype(np.float32)            # (O, I/g, K)


def infer_config(sd: Dict[str, np.ndarray],
                 num_heads: Optional[int] = None,
                 pos_conv_groups: Optional[int] = None) -> Dict[str, Any]:
    """Read the architecture off the checkpoint so base/large variants port
    without a config file. Head count / conv groups are not recoverable
    from tensor shapes; defaults follow base (embed//64 heads, 16 groups)."""
    sd = _strip_hf_prefix(sd)
    n_conv = 0
    while f"feature_extractor.conv_layers.{n_conv}.conv.weight" in sd:
        n_conv += 1
    if n_conv == 0:
        raise ValueError("no feature_extractor.conv_layers.* keys — "
                         "not a wav2vec2 state_dict")
    conv_dim, conv_kernel = [], []
    for i in range(n_conv):
        w = np.asarray(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        conv_dim.append(int(w.shape[0]))
        conv_kernel.append(int(w.shape[2]))
    embed_dim = int(np.asarray(sd["feature_projection.projection.weight"]).shape[0])
    layers = 0
    while f"encoder.layers.{layers}.feed_forward.intermediate_dense.weight" in sd:
        layers += 1
    ffn_dim = int(np.asarray(
        sd["encoder.layers.0.feed_forward.intermediate_dense.weight"]).shape[0])
    pos_v = np.asarray(
        sd["encoder.pos_conv_embed.conv.weight_v"]
        if "encoder.pos_conv_embed.conv.weight_v" in sd
        else sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
    return {
        "embed_dim": embed_dim,
        "num_layers": layers,
        "num_heads": int(num_heads or max(1, embed_dim // 64)),
        "ffn_dim": ffn_dim,
        "conv_dim": tuple(conv_dim),
        "conv_kernel": tuple(conv_kernel),
        # strides are not recoverable from shapes; base layout applies to
        # every published wav2vec2 checkpoint (5,2,2,2,2,2,2)
        "conv_stride": tuple([5] + [2] * (n_conv - 1)),
        "pos_conv_kernel": int(pos_v.shape[-1]),
        # grouped Conv1d weight is (out, in/groups, k) → groups recoverable
        "pos_conv_groups": int(pos_conv_groups
                               or embed_dim // int(pos_v.shape[1])),
    }


def convert_wav2vec2_state_dict(
    sd: Dict[str, np.ndarray],
    num_heads: Optional[int] = None,
    pos_conv_groups: Optional[int] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any], List[str]]:
    """HF wav2vec2 state_dict → (flax params, config, skipped keys).

    Raises on unrecognized keys outside the expected skip set (CTC head,
    quantizer/pretraining tensors, masked_spec_embed) so layout drift fails
    at port time, not at first garbage inference."""
    full = dict(sd)
    sd = _strip_hf_prefix(sd)
    cfg = infer_config(sd, num_heads, pos_conv_groups)
    params: Dict[str, Any] = {}
    consumed: set = set()

    def take(*keys: str) -> None:
        consumed.update(k for k in keys if k in sd)

    for i in range(len(cfg["conv_dim"])):
        cp = f"feature_extractor.conv_layers.{i}.conv"
        params[f"conv_{i}"] = {
            "kernel": np.asarray(sd[f"{cp}.weight"]).transpose(2, 1, 0)}
        take(f"{cp}.weight")
    params["conv_gn"] = _ln(sd, "feature_extractor.conv_layers.0.layer_norm")
    take("feature_extractor.conv_layers.0.layer_norm.weight",
         "feature_extractor.conv_layers.0.layer_norm.bias")
    params["proj_ln"] = _ln(sd, "feature_projection.layer_norm")
    params["proj"] = _linear(sd, "feature_projection.projection")
    take("feature_projection.layer_norm.weight", "feature_projection.layer_norm.bias",
         "feature_projection.projection.weight", "feature_projection.projection.bias")

    w = _pos_conv_weight(sd, consumed)
    params["pos_conv"] = {"kernel": w.transpose(2, 1, 0),
                          "bias": np.asarray(sd["encoder.pos_conv_embed.conv.bias"])}
    take("encoder.pos_conv_embed.conv.bias")
    params["encoder_ln"] = _ln(sd, "encoder.layer_norm")
    take("encoder.layer_norm.weight", "encoder.layer_norm.bias")

    for i in range(cfg["num_layers"]):
        lp = f"encoder.layers.{i}"
        params[f"enc_layer_{i}"] = {
            "q_proj": _linear(sd, f"{lp}.attention.q_proj"),
            "k_proj": _linear(sd, f"{lp}.attention.k_proj"),
            "v_proj": _linear(sd, f"{lp}.attention.v_proj"),
            "out_proj": _linear(sd, f"{lp}.attention.out_proj"),
            "self_attn_ln": _ln(sd, f"{lp}.layer_norm"),
            "fc1": _linear(sd, f"{lp}.feed_forward.intermediate_dense"),
            "fc2": _linear(sd, f"{lp}.feed_forward.output_dense"),
            "final_ln": _ln(sd, f"{lp}.final_layer_norm"),
        }
        take(*(f"{lp}.attention.{p}_proj.{s}" for p in ("q", "k", "v", "out")
               for s in ("weight", "bias")),
             f"{lp}.layer_norm.weight", f"{lp}.layer_norm.bias",
             f"{lp}.feed_forward.intermediate_dense.weight",
             f"{lp}.feed_forward.intermediate_dense.bias",
             f"{lp}.feed_forward.output_dense.weight",
             f"{lp}.feed_forward.output_dense.bias",
             f"{lp}.final_layer_norm.weight", f"{lp}.final_layer_norm.bias")

    skipped = sorted(set(sd) - consumed)
    expected_skips = ("masked_spec_embed", "quantizer.", "project_hid.",
                      "project_q.", "adapter.")
    unexpected = [k for k in skipped if not k.startswith(expected_skips)]
    if unexpected:
        raise ValueError("unrecognized wav2vec2 checkpoint keys (layout "
                         "drift?): " + ", ".join(unexpected[:20]))
    # surface dropped non-encoder heads (lm_head etc.) in the skip report
    dropped = sorted(k for k in full
                     if k.startswith(("lm_head.", "dropout.")) or
                     (any(j.startswith("wav2vec2.") for j in full)
                      and not k.startswith("wav2vec2.")))
    return params, cfg, skipped + dropped
