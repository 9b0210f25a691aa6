"""ViViT word-level lipreading classifier.

TPU-native redesign of the reference's HF-ViViT wrapper
(lipreading/huggingface_vivit_model.py:18-33 — VivitModel with
image_size=32, num_channels=1, hidden_size=256, 8 heads, config at
lipreading/main.py:59-60) as a Flax ViViT: tubelet embedding (3-D conv
patchify), learned positional embeddings, pre-LN transformer encoder whose
attention runs through the shared flash-attention primitive, mean-pool over
tokens, linear classifier head (the reference mean-pools
last_hidden_state too, huggingface_vivit_model.py:29-32).

Input: (B, T, H, W, C) mouth-ROI clips, normalized float. The reference's
(N, 5, 1, 32, 32) NCTHW layout becomes NTHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import ViViTConfig
from .layers import TransformerBlock


class TubeletEmbed(nn.Module):
    """3-D patchify: (B, T, H, W, C) → (B, N_tokens, hidden).

    Stride == kernel, so the "conv" is exactly a block reshape followed by
    one (tt·th·tw·C → hidden) matmul — much faster on TPU than the
    degenerate C_in=1 3-D convolution lowering.
    """

    hidden_size: int
    tubelet: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        tt, th, tw = self.tubelet
        b, t, h, w, c = x.shape
        assert t % tt == 0 and h % th == 0 and w % tw == 0, "tubelet must tile input"
        x = x.reshape(b, t // tt, tt, h // th, th, w // tw, tw, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)           # (B, nt, nh, nw, tt, th, tw, C)
        x = x.reshape(b, (t // tt) * (h // th) * (w // tw), tt * th * tw * c)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(x)


class ViViT(nn.Module):
    cfg: ViViTConfig

    @nn.compact
    def __call__(self, clips: jax.Array, deterministic: bool = True) -> jax.Array:
        """clips (B, T, H, W, C) → logits (B, num_classes)."""
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        x = TubeletEmbed(c.hidden_size, c.tubelet_size, dtype=dtype)(clips.astype(dtype))
        n_tokens = x.shape[1]
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, n_tokens, c.hidden_size),
            jnp.float32,
        )
        x = x + pos.astype(dtype)
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        for i in range(c.num_layers):
            x = TransformerBlock(
                c.num_heads, c.mlp_dim, c.dropout, dtype=dtype, name=f"block_{i}",
                ring_axis=c.sequence_axis if c.sequence_parallel else None,
            )(x, deterministic)
        x = nn.LayerNorm(dtype=dtype)(x)
        x = x.mean(axis=1)
        return nn.Dense(c.num_classes, dtype=jnp.float32, name="head")(x)


def pp_params(params: dict, cfg: ViViTConfig) -> dict:
    """Canonical ViViT params → pipeline layout: the ``block_i`` subtrees
    stack into one ``blocks`` tree (leading layer axis) that
    ``apply_pipelined`` stages over the mesh's model axis."""
    from ..parallel.pipeline import stack_blocks

    return stack_blocks(params, cfg.num_layers)


def pp_params_to_canonical(params: dict, cfg: ViViTConfig) -> dict:
    """Inverse of ``pp_params`` — checkpoints written by the pp trainer stay
    interchangeable with the plain data/tensor-parallel trainer."""
    from ..parallel.pipeline import unstack_blocks

    return unstack_blocks(params, cfg.num_layers)


def apply_pipelined(
    cfg: ViViTConfig,
    params: dict,
    clips: jax.Array,
    spec,
    n_micro=None,
) -> jax.Array:
    """``ViViT.__call__`` with the encoder blocks pipeline-parallel over the
    mesh's model axis (parallel/pipeline.py): stage s holds layers
    ``[s·L/S, (s+1)·L/S)`` only; microbatches stream through via
    ``ppermute``. Embedding and head are cheap and run replicated over the
    model axis (batch still sharded over ``data``).

    ``params`` is the ``pp_params`` layout. Numerically identical to
    ``ViViT().apply`` at deterministic=True (tests/test_pipeline.py pins
    logits and train-step grads); dropout is not supported under pp — the
    default config trains with dropout 0.0 anyway.
    """
    from ..parallel.pipeline import pipeline_blocks

    if cfg.sequence_parallel:
        raise ValueError("pipeline parallelism and sequence_parallel both "
                         "claim the model axis — enable one")
    dtype = jnp.dtype(cfg.dtype)
    x = TubeletEmbed(cfg.hidden_size, cfg.tubelet_size, dtype=dtype).apply(
        {"params": params["TubeletEmbed_0"]}, clips.astype(dtype))
    x = x + params["pos_embedding"].astype(dtype)
    block = TransformerBlock(cfg.num_heads, cfg.mlp_dim, cfg.dropout, dtype=dtype)
    block_apply = lambda p, h: block.apply({"params": p}, h, True)  # noqa: E731
    x = pipeline_blocks(block_apply, params["blocks"], x, spec, n_micro=n_micro)
    x = nn.LayerNorm(dtype=dtype).apply({"params": params["LayerNorm_0"]}, x)
    x = x.mean(axis=1)
    return nn.Dense(cfg.num_classes, dtype=jnp.float32).apply(
        {"params": params["head"]}, x)


class FeatureTransformer(nn.Module):
    """Classifier over precomputed per-frame CNN features.

    Redesign of the Keras video transformer
    (lipreading/keras_vivit_model.py:17-125): learned per-frame positional
    embedding (:17-33), ``num_layers`` encoder blocks (2 active of 4 defined,
    :95-100) with GELU FFN, global max-pool over time + dropout + softmax
    head (:101-104). Input (B, T, num_features) DenseNet-style features
    (lipreading/feature_extraction.py:22-93's (N, 5, 1024) tensors).
    """

    num_classes: int
    dense_dim: int = 4
    num_heads: int = 2
    num_layers: int = 2
    dropout: float = 0.3
    head_dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, deterministic: bool = True) -> jax.Array:
        b, t, e = feats.shape
        x = feats.astype(self.dtype)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02), (1, t, e), jnp.float32)
        x = x + pos.astype(self.dtype)
        for i in range(self.num_layers):
            x = TransformerBlock(
                self.num_heads, self.dense_dim, self.dropout, dtype=self.dtype, name=f"block_{i}"
            )(x, deterministic)
        x = x.max(axis=1)
        x = nn.Dropout(self.head_dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)
