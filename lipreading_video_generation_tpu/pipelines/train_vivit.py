"""ViViT lipreader training — the framework's flagship end-to-end slice.

Capability target: train_huggingface_model (lipreading/
huggingface_vivit_model.py:35-97): AdamW lr 1e-4, StepLR(step=2, γ=0.2),
CE loss, per-epoch eval with best-accuracy snapshot. TPU idioms: one jitted
``train_step`` (forward+backward+update fused), data-parallel over the mesh
via sharded batches + replicated params (psum inserted by XLA), on-device
uint8→float preprocessing fused into the step, deterministic PRNG keys.

Fixes inherited, not ported (SURVEY.md §7): the undefined ``Y_train_p``
(huggingface_vivit_model.py:40) and the eval-loss denominator bug (:83).
"""
from __future__ import annotations

import functools
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..core import prng
from ..core.config import Config, ViViTConfig
from ..models.vivit import ViViT
from ..parallel.mesh import MeshSpec, build_mesh, shard_batch
from . import losses


class TrainState(train_state.TrainState):
    pass


def make_optimizer(cfg: ViViTConfig, steps_per_epoch: int = 100) -> optax.GradientTransformation:
    """AdamW + StepLR-style staircase decay (huggingface_vivit_model.py:36,47)."""
    if cfg.lr_step_epochs > 0:
        boundaries = {
            (e + 1) * cfg.lr_step_epochs * steps_per_epoch: cfg.lr_step_gamma
            for e in range(50)
        }
        schedule = optax.piecewise_constant_schedule(cfg.learning_rate, boundaries)
    else:
        schedule = cfg.learning_rate
    return optax.adamw(schedule, weight_decay=cfg.weight_decay)


def create_state(
    cfg: ViViTConfig, rng_key: jax.Array, steps_per_epoch: int = 100
) -> TrainState:
    model = ViViT(cfg)
    dummy = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size, cfg.num_channels))
    params = model.init(rng_key, dummy)["params"]
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=make_optimizer(cfg, steps_per_epoch)
    )


def create_state_pp(
    cfg: ViViTConfig, rng_key: jax.Array, steps_per_epoch: int = 100
) -> TrainState:
    """``create_state`` in the pipeline-parallel layout: encoder block
    params stacked along a leading layer axis (``models.vivit.pp_params``)
    so stages shard over the model axis. Convert to/from the canonical
    layout with ``pp_params_to_canonical`` for checkpoint interchange."""
    from ..models.vivit import pp_params

    if cfg.dropout > 0:
        raise ValueError(
            "dropout is not implemented under pipeline parallelism (the "
            "pipelined block apply is deterministic; training would silently "
            "skip regularization) — set vivit.dropout=0.0 or disable "
            "pipeline_parallel")

    model = ViViT(cfg)
    dummy = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size, cfg.num_channels))
    params = pp_params(dict(model.init(rng_key, dummy)["params"]), cfg)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=make_optimizer(cfg, steps_per_epoch)
    )


def make_pp_train_step(cfg: ViViTConfig, spec: MeshSpec, n_micro=None):
    """Jitted pp train step: forward/backward through the pipelined encoder
    (``apply_pipelined``); the backward is the reverse pipeline jax AD
    derives from the forward's scan + ppermute."""
    from ..models.vivit import apply_pipelined

    n_micro = n_micro or (cfg.pp_num_micro or None)

    def _impl(state, batch, dropout_key):
        clips = preprocess_clips(batch["clips"])
        labels = batch["labels"]

        def loss_fn(params):
            logits = apply_pipelined(cfg, params, clips, spec, n_micro=n_micro)
            return losses.softmax_xent(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": loss, "accuracy": losses.accuracy(logits, labels)}

    step = functools.partial(jax.jit, donate_argnums=(0,))(_impl)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan(state, batches, dropout_key):
        return jax.lax.scan(lambda s, b: _impl(s, b, dropout_key), state, batches)

    @jax.jit
    def evals(state, batch):
        logits = apply_pipelined(
            cfg, state.params, preprocess_clips(batch["clips"]), spec, n_micro=n_micro)
        return {
            "loss": losses.softmax_xent(logits, batch["labels"]),
            "accuracy": losses.accuracy(logits, batch["labels"]),
            "count": jnp.asarray(batch["labels"].shape[0], jnp.float32),
        }

    return step, scan, evals


def preprocess_clips(clips_uint8: jax.Array) -> jax.Array:
    """On-device uint8 (B, T, H, W, C) → normalized float32 in [0,1] —
    fused into the jitted step instead of a host pass."""
    return clips_uint8.astype(jnp.float32) / 255.0


def _train_step_impl(
    state: TrainState, batch: Dict[str, jax.Array], dropout_key: jax.Array
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    clips = preprocess_clips(batch["clips"])
    labels = batch["labels"]

    def loss_fn(params):
        logits = state.apply_fn(
            {"params": params},
            clips,
            deterministic=False,
            rngs={"dropout": jax.random.fold_in(dropout_key, state.step)},
        )
        loss = losses.softmax_xent(logits, labels)
        return loss, logits

    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads=grads)
    metrics = {"loss": loss, "accuracy": losses.accuracy(logits, labels)}
    return new_state, metrics


train_step = functools.partial(jax.jit, donate_argnums=(0,))(_train_step_impl)


@functools.partial(jax.jit, donate_argnums=(0,))
def train_scan(
    state: TrainState, batches: Dict[str, jax.Array], dropout_key: jax.Array
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """N train steps in ONE device program (``lax.scan`` over a
    step-stacked batch tree) — at ~5 ms/device-step the per-dispatch round
    trip dominates the loop; scanning amortizes it. Per-step dropout keys
    stay step-folded (the impl folds with state.step inside the scan)."""
    def body(s, b):
        return _train_step_impl(s, b, dropout_key)

    return jax.lax.scan(body, state, batches)


@jax.jit
def eval_step(state: TrainState, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    logits = state.apply_fn({"params": state.params}, preprocess_clips(batch["clips"]))
    return {
        "loss": losses.softmax_xent(logits, batch["labels"]),
        "accuracy": losses.accuracy(logits, batch["labels"]),
        "count": jnp.asarray(batch["labels"].shape[0], jnp.float32),
    }


@jax.jit
def predict_step(state: TrainState, clips_uint8: jax.Array) -> jax.Array:
    """Logits for inference/benchmark: uint8 clips in, log-probs out."""
    logits = state.apply_fn({"params": state.params}, preprocess_clips(clips_uint8))
    return jax.nn.log_softmax(logits, axis=-1)


@jax.jit
def predict_step_int8(state: TrainState, clips_uint8: jax.Array) -> jax.Array:
    """``predict_step`` with the classifier's Dense matmuls in dynamic int8
    (ops/quant.py): half the matmul HBM bytes (no measured MXU speedup on
    this v5e stack — see ops/quant.py). Top-1 agreement with the bf16 path
    is pinned in tests/test_quant.py."""
    from ..ops.quant import int8_serving

    with int8_serving():
        logits = state.apply_fn(
            {"params": state.params}, preprocess_clips(clips_uint8))
    return jax.nn.log_softmax(logits, axis=-1)


def predict_sharded(
    state: TrainState, clips_uint8, mesh_spec: Optional[MeshSpec] = None,
    int8: bool = False,
) -> jax.Array:
    """``predict_step`` data-parallel over the mesh — the serving analog of
    the trainers' mesh wiring: the clip batch shards over the ``data`` axis,
    params place through the public ``shard_params`` policy (replicated
    under pure DP, tensor-parallel when the model axis is live). On a single
    chip this degenerates to ``predict_step`` exactly. Batches that don't
    divide the data axis are padded to a mesh multiple and sliced back —
    the caller's clip count is unconstrained.
    """
    from ..parallel.mesh import shard_params

    spec = mesh_spec or build_mesh()
    clips_np = np.asarray(clips_uint8)
    n = len(clips_np)
    n_pad = (-n) % spec.data_size
    if n_pad:
        clips_np = np.concatenate(
            [clips_np, np.repeat(clips_np[-1:], n_pad, axis=0)])
    with spec.mesh:
        state = state.replace(params=shard_params(spec, state.params))
        clips = shard_batch(spec, clips_np)
        out = (predict_step_int8 if int8 else predict_step)(state, clips)
    return out[:n]


def evaluate(
    state: TrainState, batches: Iterable[Dict[str, np.ndarray]], eval_fn=None
) -> Dict[str, float]:
    eval_fn = eval_fn or eval_step
    total = {"loss": 0.0, "accuracy": 0.0, "count": 0.0}
    for batch in batches:
        m = jax.device_get(eval_fn(state, batch))
        n = float(m["count"])
        total["loss"] += float(m["loss"]) * n
        total["accuracy"] += float(m["accuracy"]) * n
        total["count"] += n
    n = max(1.0, total["count"])
    return {"loss": total["loss"] / n, "accuracy": total["accuracy"] / n}


def train(
    cfg: Config,
    train_batches_fn,
    eval_batches_fn=None,
    num_epochs: Optional[int] = None,
    mesh_spec: Optional[MeshSpec] = None,
    metrics_writer=None,
    steps_per_dispatch: int = 8,
) -> Tuple[TrainState, Dict[str, float]]:
    """Epoch loop with best-accuracy snapshot
    (huggingface_vivit_model.py:70-95).

    ``train_batches_fn()`` → iterable of {"clips","labels"} numpy batches,
    host-prefetched by a producer thread. Equal-shaped runs of up to
    ``steps_per_dispatch`` batches are scanned in one device program
    (``train_scan``; a shorter run — tail or shape break — scans at its own
    length, one extra compile per distinct length); singletons go stepwise.
    """
    from ..data.loader import host_prefetch, iterator_feed, stack_batches
    from ..parallel.mesh import shard_state, shard_stacked_batch
    from ..parallel.pipeline import shard_pp_state

    spec = mesh_spec or build_mesh(cfg.mesh)
    key = prng.make_root_key(cfg.seed)
    pp = cfg.vivit.pipeline_parallel
    if pp:
        state = create_state_pp(cfg.vivit, key)
        step_fn, scan_fn, eval_fn = make_pp_train_step(cfg.vivit, spec)
        place_state = functools.partial(shard_pp_state, spec)
    else:
        state = create_state(cfg.vivit, key)
        step_fn, scan_fn, eval_fn = train_step, train_scan, eval_step
        place_state = functools.partial(shard_state, spec)
    best = {"accuracy": -1.0}
    best_params = state.params
    epochs = num_epochs if num_epochs is not None else cfg.vivit.num_epochs

    def dispatch(state, chunk):
        if len(chunk) == 1:
            state, m = step_fn(state, shard_batch(spec, chunk[0]), key)
            if metrics_writer is not None:
                metrics_writer.write(int(state.step), m)
        else:
            batches = shard_stacked_batch(spec, stack_batches(chunk))
            state, ms = scan_fn(state, batches, key)
            if metrics_writer is not None:
                ms = {k: np.asarray(v) for k, v in ms.items()}
                for i in range(len(chunk)):
                    metrics_writer.write(
                        int(state.step) - len(chunk) + 1 + i,
                        {k: v[i] for k, v in ms.items()})
        return state

    with spec.mesh:
        # params/opt/EMA placed via the TP-aware policy (pure-DP
        # meshes replicate; model axis >1 shards large kernels); under
        # pipeline parallelism the block stack shards stage-wise instead
        state = place_state(state)
        for epoch in range(epochs):
            chunk = []
            for batch in host_prefetch(iterator_feed(iter(train_batches_fn()))):
                if chunk and any(
                    np.shape(batch[k]) != np.shape(chunk[0][k]) for k in batch
                ):
                    state = dispatch(state, chunk)
                    chunk = []
                chunk.append(batch)
                if len(chunk) == steps_per_dispatch:
                    state = dispatch(state, chunk)
                    chunk = []
            if chunk:
                state = dispatch(state, chunk)
            if eval_batches_fn is not None:
                stats = evaluate(
                    state, map(lambda b: shard_batch(spec, b), eval_batches_fn()),
                    eval_fn=eval_fn)
                if stats["accuracy"] > best["accuracy"]:
                    best = stats
                    # real copy — train_step donates its input state, so an
                    # alias would be deleted by the next step
                    best_params = jax.tree_util.tree_map(jnp.array, state.params)
    if best["accuracy"] >= 0:
        state = state.replace(params=best_params)
    if pp:
        # hand back the canonical layout: every downstream consumer
        # (predict_sharded, eval_step, checkpoints) goes through
        # state.apply_fn, which expects block_i subtrees, not the pipeline
        # 'blocks' stack. Optimizer moments are pp-layout-shaped and the
        # returned state is terminal, so rebuild them fresh (step preserved).
        from ..models.vivit import pp_params_to_canonical

        canonical = pp_params_to_canonical(dict(state.params), cfg.vivit)
        step = state.step
        state = TrainState.create(
            apply_fn=ViViT(cfg.vivit).apply, params=canonical, tx=state.tx
        ).replace(step=step)
    return state, best
