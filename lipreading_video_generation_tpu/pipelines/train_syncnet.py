"""SyncNet expert pretraining.

The reference uses a frozen ``lipsync_expert.pth`` it never trains in-repo
(gan-model/train_lipreading.py:342-343; syncnet hyperparams exist at
params.py:79-82: batch 64, lr 1e-4). A TPU-native framework must be able
to produce its own expert, so this implements the Wav2Lip syncnet
objective family over (mel window, face window) pairs:

- ``objective="bce"`` — the reference's numerics: BCE over the raw cosine
  similarity with positive (aligned) and negative pairs. Negatives are
  *within-clip temporally shifted* mel windows — the wrong-window-from-the-
  same-video semantics the original syncnet dataset uses — NOT other
  samples' mels, which would let the expert learn clip identity instead of
  audio↔lip alignment.
- ``objective="infonce"`` — symmetric InfoNCE over the in-batch cosine
  matrix at temperature 0.07. Same embedding geometry the GAN's sync loss
  consumes (cosine of L2-normalized towers, so -log(sim) eval and the 0.75
  gate threshold still apply), but it converges an order of magnitude
  faster than raw-cosine BCE, which sits near ln 2 for a long warmup.
- ``objective="infonce_hard"`` (default) — InfoNCE whose negative columns
  additionally include each sample's own *temporally shifted* mel window:
  the face row must beat not only other samples' audio but the SAME clip's
  audio at the wrong time. This directly optimizes the aligned-vs-shifted
  discrimination the GAN gate relies on. Measured on held-out
  synthetic_av_clips (18 train / 2 val clips, width 0.25, batch 16):
  AUC 0.91 at step 200 and 0.975 at step 400, vs 0.956 for plain InfoNCE
  and ~0.79 for BCE — and unlike both, the curve is monotone. (With only
  6 clips every objective plateaus near 0.70: per-clip f0 differs, so a
  small train set lets the audio tower key on clip identity instead of
  alignment — the proof tests train on 18 clips.)

Discrimination (aligned-vs-shifted AUC on held-out clips), not just a
finite loss, is the acceptance bar — `train()` reports it and
tests/test_expert_chain.py asserts it.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..core.config import AudioConfig, GanConfig
from ..models.syncnet import SyncNet, stack_window_lower_half
from ..ops import audio as audio_ops
from . import losses
from .train_gan import prepare_batch


@flax.struct.dataclass
class SyncnetTrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def create_state(cfg: GanConfig, key: jax.Array, lr: float = 1e-4) -> SyncnetTrainState:
    model = SyncNet(width=cfg.model_width)
    params = model.init(
        key,
        jnp.zeros((1, 80, cfg.syncnet_mel_step_size, 1)),
        jnp.zeros((1, cfg.img_size // 2, cfg.img_size, 3 * cfg.syncnet_T)),
    )["params"]
    tx = optax.adam(lr)
    return SyncnetTrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )


def _shifted_mel_windows(
    batch: Dict[str, jax.Array],
    y: jax.Array,
    key: jax.Array,
    cfg: GanConfig,
    audio_cfg: AudioConfig,
) -> jax.Array:
    """Per-sample mel windows: aligned where y=1, shifted ±[3, 8] video
    frames within the same clip where y=0 (wrong-window-same-video). Shifts
    that would run off the mel end flip direction instead of clamping, so a
    negative is never accidentally aligned."""
    k1, k2 = jax.random.split(key)
    b = batch["wav"].shape[0]
    mel_full = audio_ops.melspectrogram(batch["wav"], audio_cfg)  # (B, 80, T)
    start = batch["start_frame"].astype(jnp.float32)
    mag = jax.random.randint(k1, (b,), 3, 9).astype(jnp.float32)
    sign = jnp.where(jax.random.uniform(k2, (b,)) > 0.5, 1.0, -1.0)
    mel_per_frame = (audio_cfg.sample_rate / audio_cfg.hop_size) / cfg.fps
    max_start = (mel_full.shape[-1] - cfg.syncnet_mel_step_size) / mel_per_frame
    neg = start + sign * mag
    neg = jnp.where(neg < 0.0, start + mag, neg)
    neg = jnp.where(neg > max_start, start - mag, neg)
    sel = jnp.where(y > 0.5, start, neg)
    crop = lambda m, s: audio_ops.crop_mel_window(
        m, s, cfg.fps, cfg.syncnet_mel_step_size,
        audio_cfg.sample_rate, audio_cfg.hop_size)
    return jax.vmap(crop)(mel_full, sel)[..., None]


@functools.partial(
    jax.jit, static_argnames=("cfg", "audio_cfg", "objective"), donate_argnums=(0,)
)
def train_step(
    state: SyncnetTrainState,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    cfg: GanConfig,
    audio_cfg: AudioConfig = AudioConfig(),
    objective: str = "infonce_hard",
) -> Tuple[SyncnetTrainState, Dict[str, jax.Array]]:
    key = jax.random.fold_in(key, state.step)
    prep = prepare_batch(batch, cfg, audio_cfg)
    faces = stack_window_lower_half(prep["gt"])
    b = faces.shape[0]

    if objective == "bce":
        k1, k2 = jax.random.split(key)
        y = (jax.random.uniform(k1, (b,)) > 0.5).astype(jnp.float32)
        # XLA CSEs the melspectrogram with prepare_batch's — one FFT pass.
        mel = _shifted_mel_windows(batch, y, k2, cfg, audio_cfg)

        def loss_fn(params):
            a, v = SyncNet(width=cfg.model_width).apply({"params": params}, mel, faces)
            return losses.syncnet_contrastive_loss(a, v, y)

    elif objective == "infonce":

        def loss_fn(params):
            a, v = SyncNet(width=cfg.model_width).apply(
                {"params": params}, prep["mel"], faces)
            logits = (a @ v.T) / 0.07
            lbl = jnp.arange(b)
            return 0.5 * (losses.softmax_xent(logits, lbl)
                          + losses.softmax_xent(logits.T, lbl))

    elif objective == "infonce_hard":
        # per-sample temporally shifted mels join the negative columns: each
        # face must rank its aligned mel above BOTH other samples' mels and
        # its own clip's audio at the wrong time (aligned-vs-shifted is
        # exactly what the GAN gate thresholds on)
        neg_mel = _shifted_mel_windows(
            batch, jnp.zeros((b,)), key, cfg, audio_cfg)

        def loss_fn(params):
            model = SyncNet(width=cfg.model_width)
            a_pos, v = model.apply({"params": params}, prep["mel"], faces)
            a_neg, _ = model.apply({"params": params}, neg_mel, faces)
            cols = jnp.concatenate([a_pos, a_neg], axis=0)       # (2B, D)
            lbl = jnp.arange(b)
            l_face = losses.softmax_xent((v @ cols.T) / 0.07, lbl)
            l_audio = losses.softmax_xent((a_pos @ v.T) / 0.07, lbl)
            return 0.5 * (l_face + l_audio)

    else:
        raise ValueError(f"unknown syncnet objective {objective!r}")

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        state.replace(step=state.step + 1, params=new_params, opt_state=new_opt),
        {"loss": loss},
    )


def train(
    cfg: GanConfig,
    batch_fn: Callable[[], Dict[str, Any]],
    num_steps: int,
    seed: int = 0,
    lr: float = 1e-4,
    objective: str = "infonce_hard",
    metrics_writer=None,
    eval_clips=None,
    eval_every: int = 0,
    audio_cfg: AudioConfig = AudioConfig(),
) -> SyncnetTrainState:
    """Pretrain the sync expert; when ``eval_clips`` (held-out GanClips) are
    given, periodically report the aligned-vs-shifted discrimination AUC —
    the property the expert exists for."""
    key = jax.random.key(seed)
    state = create_state(cfg, key, lr=lr)
    if eval_clips is not None and eval_every:
        # the AUC eval needs shift headroom around each window; on real
        # preprocessed data the held-out clips can be arbitrarily short —
        # drop the ineligible ones up front instead of dying at first eval
        shift = 6  # alignment_scores default
        min_len = cfg.syncnet_T + 2 * shift + 2
        usable = [c for c in eval_clips if len(c.frames) >= min_len]
        if not usable:
            import warnings

            warnings.warn(
                f"all {len(eval_clips)} held-out clips are shorter than the "
                f"{min_len} frames the aligned-vs-shifted AUC eval needs — "
                "skipping AUC reporting", stacklevel=2)
            eval_clips = None
        else:
            eval_clips = usable
    for step in range(num_steps):
        batch = {k: jnp.asarray(v) for k, v in batch_fn().items()}
        state, m = train_step(state, batch, key, cfg, audio_cfg, objective)
        if eval_clips is not None and eval_every and (
                step % eval_every == 0 or step == num_steps - 1):
            from .expert_proof import alignment_scores, auc

            pos, neg = alignment_scores(
                state.params, cfg, eval_clips, seed=seed, audio_cfg=audio_cfg)
            m = dict(m, auc=auc(pos, neg))
        if metrics_writer is not None:
            metrics_writer.write(step, m)
    return state


def load_params(path: str, cfg: GanConfig, key=None):
    """Load a ``train-syncnet --out`` export — the in-framework stand-in
    for the reference's frozen lipsync_expert.pth (train_lipreading.py:
    342-343; the shipped file is a broken HTML page, SURVEY §2.2)."""
    from ..core.checkpoint import load_once

    state = create_state(cfg, jax.random.key(0) if key is None else key)
    return load_once(path, {"syncnet": state.params})["syncnet"]
