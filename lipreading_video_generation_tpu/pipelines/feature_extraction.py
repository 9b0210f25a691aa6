"""CNN frame features + FeatureTransformer training — the Keras path.

Capability targets:
- lipreading/feature_extraction.py:22-93: DenseNet121 per-frame 1024-d
  embeddings; ``prepare_all_videos`` builds the (N, MAX_SEQ, 1024) tensor
  with zero-padding for short clips and records ``test_train_cut_idx`` /
  ``sentence_start_idx`` for sentence eval.
- lipreading/keras_vivit_model.py:87-125: train the small transformer over
  those features (adam + sparse CE, 20 epochs, val split 0.15) with test
  accuracy report.

TPU redesign: frames for ALL clips are embedded in one batched jitted
DenseNet forward (the reference called ``predict`` once per frame,
feature_extraction.py:78-88 — its hottest antipattern).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..core.config import FeatureTransformerConfig
from ..models.densenet import DenseNet121, imagenet_preprocess
from ..models.vivit import FeatureTransformer
from . import losses


@dataclasses.dataclass
class FeatureSet:
    """The prepare_all_videos outputs (feature_extraction.py:38-93)."""

    features: np.ndarray            # (N, max_seq, num_features)
    labels: np.ndarray              # (N,)
    sentence_start_idx: List[int]   # word-index boundaries per sentence
    test_train_cut_idx: int         # first test-set row


def embed_frames(
    densenet_variables,
    clips_uint8: np.ndarray,        # (N, T, H, W, C) uint8 mouth ROIs
    batch_frames: int = 512,
) -> np.ndarray:
    """(N, T, 1024) features via batched DenseNet forward. Grayscale input
    is broadcast to 3 channels (the reference feeds RGB crops)."""
    n, t = clips_uint8.shape[:2]
    frames = clips_uint8.reshape((n * t,) + clips_uint8.shape[2:])
    if frames.shape[-1] == 1:
        frames = np.repeat(frames, 3, axis=-1)

    model = DenseNet121()

    @jax.jit
    def fwd(x):
        return model.apply(densenet_variables, imagenet_preprocess(x))

    outs = []
    for i in range(0, len(frames), batch_frames):
        chunk = frames[i : i + batch_frames]
        pad = batch_frames - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        out = np.asarray(fwd(jnp.asarray(chunk)))
        outs.append(out[: len(frames[i : i + batch_frames])])
    feats = np.concatenate(outs)
    # zero-padded frames (all-black) keep their embedding; the reference
    # zero-pads at the feature level (feature_extraction.py:60-77), so mask
    # padded frames back to zero features:
    frame_is_pad = (clips_uint8.reshape(n * t, -1).max(axis=1) == 0)
    feats[frame_is_pad] = 0.0
    return feats.reshape(n, t, -1)


class TrainState(train_state.TrainState):
    pass


def create_state(cfg: FeatureTransformerConfig, key: jax.Array, num_features: int) -> TrainState:
    model = FeatureTransformer(
        num_classes=cfg.num_classes, dense_dim=cfg.dense_dim, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, dropout=cfg.dropout, head_dropout=cfg.head_dropout,
    )
    params = model.init(key, jnp.zeros((1, cfg.max_seq_length, num_features)))["params"]
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(cfg.learning_rate)
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def train_step(state: TrainState, feats: jax.Array, labels: jax.Array, key: jax.Array):
    def loss_fn(params):
        logits = state.apply_fn(
            {"params": params}, feats, deterministic=False,
            rngs={"dropout": jax.random.fold_in(key, state.step)},
        )
        return losses.softmax_xent(logits, labels), logits

    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    return state.apply_gradients(grads=grads), {
        "loss": loss, "accuracy": losses.accuracy(logits, labels)
    }


@jax.jit
def eval_step(state: TrainState, feats: jax.Array, labels: jax.Array):
    logits = state.apply_fn({"params": state.params}, feats)
    return {"loss": losses.softmax_xent(logits, labels),
            "accuracy": losses.accuracy(logits, labels)}


def train(
    cfg: FeatureTransformerConfig,
    features: np.ndarray,
    labels: np.ndarray,
    seed: int = 0,
    batch_size: int = 64,
    metrics_writer=None,
) -> Tuple[TrainState, Dict[str, float]]:
    """Epoch loop with val split (keras_vivit_model.py:112-119)."""
    rng = np.random.default_rng(seed)
    n = len(features)
    idx = rng.permutation(n)
    n_val = max(1, int(cfg.val_split * n))
    val_idx, tr_idx = idx[:n_val], idx[n_val:]
    key = jax.random.key(seed)
    state = create_state(cfg, key, features.shape[-1])
    for epoch in range(cfg.num_epochs):
        rng.shuffle(tr_idx)
        for i in range(0, len(tr_idx) - batch_size + 1, batch_size):
            pick = tr_idx[i : i + batch_size]
            state, m = train_step(
                state, jnp.asarray(features[pick]), jnp.asarray(labels[pick]), key
            )
            if metrics_writer is not None:
                metrics_writer.write(int(state.step), m)
    val = eval_step(state, jnp.asarray(features[val_idx]), jnp.asarray(labels[val_idx]))
    return state, {k: float(v) for k, v in val.items()}
