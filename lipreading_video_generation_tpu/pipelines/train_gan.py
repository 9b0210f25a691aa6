"""Lip-sync GAN training: one jitted two-optimizer step on the mesh.

Capability target: gan-model/train_lipreading.py:91-199 — G step with the
composite loss (lip·lip_weight + syncnet_wt·sync + disc_wt·perceptual +
(1−syncnet_wt−disc_wt)·L1, :135-138), then D real/fake BCE steps
(:140-151); periodic eval flips syncnet_wt 0→0.03 once eval sync loss
< 0.75 (:187-192); Adam(0.5, 0.999) for both (:330-333).

TPU idioms:
- The whole G+D alternation is ONE jitted ``gan_train_step(gan_state,
  batch, key)`` — two optax states inside a single compiled program; no
  Python between G and D updates.
- The syncnet_wt gate is a field of the train state (a traced scalar), not
  an ``hparams.set_hparam`` mutation (params.py:18-19) — SURVEY.md §7 hard
  part #5.
- Device-side preprocessing: the batch carries uint8 frame windows + raw
  waveform; resize/normalize/mel/mask/concat all happen inside the step
  (ops/image, ops/audio), replacing the cv2/librosa DataLoader work of
  dataset.py:105-168.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import prng
from ..core.config import AudioConfig, GanConfig
from ..models.discriminator import Discriminator
from ..models.generator import TalkingFaceGenerator
from ..models.syncnet import SyncNet, stack_window_lower_half
from ..ops import audio as audio_ops
from ..ops import image as image_ops
from . import losses


@flax.struct.dataclass
class GanTrainState:
    step: jax.Array
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    syncnet_params: Any          # frozen sync expert
    syncnet_wt: jax.Array        # the 0→0.03 gate, traced
    lip_expert_params: Any = None  # frozen lipreading expert (--lipreading path)
    gen_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False, default=None)
    disc_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False, default=None)
    # expert architecture for lip_expert_params — None means the native
    # default (train_lip_expert.default_expert). A ported AV-HuBERT video
    # encoder (models/avhubert.py) rides here; static, not a pytree leaf.
    lip_expert_model: Any = flax.struct.field(pytree_node=False, default=None)


def create_state(
    cfg: GanConfig,
    key: jax.Array,
    syncnet_params=None,
    lip_expert_params=None,
    lip_expert_model=None,
) -> GanTrainState:
    dtype = jnp.dtype(cfg.dtype)
    gen = TalkingFaceGenerator(width=cfg.model_width, dtype=dtype)
    disc = Discriminator(width=cfg.model_width, dtype=dtype)
    sync = SyncNet(width=cfg.model_width, dtype=dtype)
    kg, kd, ks = jax.random.split(key, 3)
    t = cfg.syncnet_T
    mel = jnp.zeros((1, t, 80, cfg.syncnet_mel_step_size, 1))
    faces6 = jnp.zeros((1, t, cfg.img_size, cfg.img_size, 6))
    gen_params = gen.init(kg, mel, faces6)["params"]
    disc_params = disc.init(kd, jnp.zeros((1, t, cfg.img_size, cfg.img_size, 3)))["params"]
    if syncnet_params is None:
        syncnet_params = sync.init(
            ks,
            jnp.zeros((1, 80, cfg.syncnet_mel_step_size, 1)),
            jnp.zeros((1, cfg.img_size // 2, cfg.img_size, 3 * t)),
        )["params"]
    gen_tx = optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
    disc_tx = optax.adam(cfg.disc_learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
    if lip_expert_params is None and cfg.lip_weight > 0:
        if lip_expert_model is not None:      # e.g. ported AV-HuBERT (video-only)
            lip_expert_params = lip_expert_model.init(
                jax.random.fold_in(key, 3), jnp.zeros((1, t, 88, 88, 1))
            )["params"]
        else:
            from .train_lip_expert import default_expert

            lip_expert_params = default_expert().init(
                jax.random.fold_in(key, 3),
                jnp.zeros((1, t, 88, 88, 1)), jnp.zeros((1, 48), jnp.int32),
            )["params"]
    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        disc_params=disc_params,
        gen_opt=gen_tx.init(gen_params),
        disc_opt=disc_tx.init(disc_params),
        syncnet_params=syncnet_params,
        syncnet_wt=jnp.asarray(cfg.syncnet_wt, jnp.float32),
        lip_expert_params=lip_expert_params,
        gen_tx=gen_tx,
        disc_tx=disc_tx,
        lip_expert_model=lip_expert_model,
    )


def prepare_batch(
    batch: Dict[str, jax.Array], cfg: GanConfig, audio_cfg: AudioConfig
) -> Dict[str, jax.Array]:
    """Device-side batch prep (dataset.py:106-168 semantics, fused):

    in:  window (B,T,H,W,3) uint8, wrong_window (B,T,H,W,3) uint8,
         start_frame (B,), wav (B, samples)
    out: x (B,T,96,96,6) masked-target ⊕ reference, gt (B,T,96,96,3) in
         [0,1], mel (B,80,16,1) window at start_frame, indiv_mels
         (B,T,80,16,1) per-frame windows offset −1 (get_segmented_mels'
         effective offset: +1 for 1-indexing then −2, dataset.py:81-94).
    """
    t = cfg.syncnet_T
    win = image_ops.resize(batch["window"], (cfg.img_size, cfg.img_size))
    wrong = image_ops.resize(batch["wrong_window"], (cfg.img_size, cfg.img_size))
    gt = image_ops.normalize_uint8(win)
    wrong = image_ops.normalize_uint8(wrong)
    masked = image_ops.mask_lower_half(gt)
    x = image_ops.concat_reference(masked, wrong)

    mel_full = audio_ops.melspectrogram(batch["wav"], audio_cfg)  # (B, 80, T_mel)
    start = batch["start_frame"].astype(jnp.float32)

    def one_clip(mel, s):
        m = audio_ops.crop_mel_window(
            mel, s, cfg.fps, cfg.syncnet_mel_step_size, audio_cfg.sample_rate, audio_cfg.hop_size
        )
        # per-frame sub-windows: get_segmented_mels (dataset.py:81-94) uses
        # start_frame_num = frame_id + 1 then crops at i − 2, so the window
        # for target frame s+i starts at video frame s+i−1.
        frame_ids = s + jnp.arange(t, dtype=jnp.float32) - 1.0
        frame_ids = jnp.maximum(frame_ids, 0.0)
        indiv = audio_ops.mel_windows(
            mel, frame_ids, cfg.fps, cfg.syncnet_mel_step_size,
            audio_cfg.sample_rate, audio_cfg.hop_size,
        )
        return m, indiv

    mel_win, indiv = jax.vmap(one_clip)(mel_full, start)
    return {
        "x": x,
        "gt": gt,
        "mel": mel_win[..., None],          # (B, 80, 16, 1)
        "indiv_mels": indiv[..., None],     # (B, T, 80, 16, 1)
    }


def _sync_loss(syncnet_params, mel, generated, cfg: GanConfig):
    """get_sync_loss (train_lipreading.py:83-89): lower halves of the T
    generated frames stacked on channels vs the window mel."""
    faces = stack_window_lower_half(generated)
    a, v = SyncNet(width=cfg.model_width, dtype=jnp.dtype(cfg.dtype)).apply(
        {"params": syncnet_params}, mel, faces)
    return losses.cosine_bce_sync_loss(a, v)


def _gan_train_step_impl(
    state: GanTrainState,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    cfg: GanConfig,
    audio_cfg: AudioConfig = AudioConfig(),
) -> Tuple[GanTrainState, Dict[str, jax.Array]]:
    prep = prepare_batch(batch, cfg, audio_cfg)
    dtype = jnp.dtype(cfg.dtype)
    gen = TalkingFaceGenerator(width=cfg.model_width, dtype=dtype)
    disc = Discriminator(width=cfg.model_width, dtype=dtype)
    # Per-step PRNG: fold the (traced) step counter into the caller's key so
    # scanned steps (gan_train_scan) are never key-identical — mirrors
    # train_diffusion's step-keyed folding. G/D currently have no dropout or
    # noise layers; the key is threaded to the generator so any future
    # stochastic layer inherits step-unique randomness for free.
    step_key = prng.step_key(key, state.step)

    def g_loss_fn(gen_params):
        g = gen.apply({"params": gen_params}, prep["indiv_mels"], prep["x"],
                      rngs={"dropout": step_key})
        recon = losses.l1(g, prep["gt"])
        sync = _sync_loss(state.syncnet_params, prep["mel"], g, cfg)
        fake_pred = disc.apply({"params": state.disc_params}, g)
        perceptual = losses.perceptual_adversarial_loss(fake_pred)
        # optional frozen lipreading-expert loss (--lipreading path,
        # train_lipreading.py:128-133). With transcripts in the batch
        # (Dataset_Lip role) the criterion is the text-conditioned seq2seq
        # CE of the expert reading the GENERATED window against the
        # transcript (avhubert seq2seq criterion analog); without text it
        # falls back to expert-feature matching vs the ground-truth window.
        if cfg.lip_weight > 0 and state.lip_expert_params is not None:
            from ..models.lip_expert import (
                LipExpertSeq2Seq,
                avhubert_video_transform,
                seq2seq_expert_loss,
            )
            from .train_lip_expert import default_expert

            expert = (state.lip_expert_model
                      if state.lip_expert_model is not None else default_expert())
            # a ported AV-HuBERT encoder has no text decoder — it scores by
            # feature matching even when transcripts are present
            if "text_tokens" in batch and isinstance(expert, LipExpertSeq2Seq):
                lip = seq2seq_expert_loss(
                    expert, state.lip_expert_params, g * 255.0, batch["text_tokens"]
                )
            else:
                gf = expert.apply({"params": state.lip_expert_params},
                                  avhubert_video_transform(g * 255.0),
                                  method="encode")
                tf_ = expert.apply({"params": state.lip_expert_params},
                                   avhubert_video_transform(prep["gt"] * 255.0),
                                   method="encode")
                lip = jnp.mean((gf - jax.lax.stop_gradient(tf_)) ** 2)
        else:
            lip = jnp.zeros(())
        total, metrics = losses.generator_loss(
            recon, sync, perceptual, lip, state.syncnet_wt, cfg.disc_wt, cfg.lip_weight
        )
        return total, (g, metrics)

    (gtotal, (g, gmetrics)), ggrads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.gen_params
    )
    gupdates, new_gen_opt = state.gen_tx.update(ggrads, state.gen_opt, state.gen_params)
    new_gen_params = optax.apply_updates(state.gen_params, gupdates)

    def d_loss_fn(disc_params):
        real_pred = disc.apply({"params": disc_params}, prep["gt"])
        fake_pred = disc.apply({"params": disc_params}, jax.lax.stop_gradient(g))
        dreal, dfake = losses.discriminator_loss(real_pred, fake_pred)
        return dreal + dfake, (dreal, dfake)

    (dtotal, (dreal, dfake)), dgrads = jax.value_and_grad(d_loss_fn, has_aux=True)(
        state.disc_params
    )
    dupdates, new_disc_opt = state.disc_tx.update(dgrads, state.disc_opt, state.disc_params)
    new_disc_params = optax.apply_updates(state.disc_params, dupdates)

    metrics = dict(gmetrics)
    metrics.update({"loss/d_real": dreal, "loss/d_fake": dfake})
    new_state = state.replace(
        step=state.step + 1,
        gen_params=new_gen_params,
        gen_opt=new_gen_opt,
        disc_params=new_disc_params,
        disc_opt=new_disc_opt,
    )
    return new_state, metrics


gan_train_step = functools.partial(
    jax.jit, static_argnames=("cfg", "audio_cfg"), donate_argnums=(0,)
)(_gan_train_step_impl)


@functools.partial(jax.jit, static_argnames=("cfg", "audio_cfg"), donate_argnums=(0,))
def gan_train_scan(
    state: GanTrainState,
    batches: Dict[str, jax.Array],   # step-stacked batch tree, leading axis N
    key: jax.Array,
    cfg: GanConfig,
    audio_cfg: AudioConfig = AudioConfig(),
) -> Tuple[GanTrainState, Dict[str, jax.Array]]:
    """N train steps in ONE device program — ``lax.scan`` over a
    step-stacked batch tree.

    Profiled at the reference config (scripts/profile_gan_train.py): the
    device step is 59 ms but a per-step dispatch costs 133 ms wall — the
    host→relay round trip costs more than the step itself. Scanning
    amortizes it. Returns metrics stacked (N,) per key.

    Per-step PRNG stays step-keyed: the impl folds ``key`` with
    ``state.step``, which advances inside the scan."""
    def body(s, b):
        return _gan_train_step_impl(s, b, key, cfg, audio_cfg)

    return jax.lax.scan(body, state, batches)


def _stack_batches(raws):
    from ..data.loader import stack_batches

    return stack_batches(raws)


@functools.partial(jax.jit, static_argnames=("cfg", "audio_cfg"))
def gan_eval_step(
    state: GanTrainState,
    batch: Dict[str, jax.Array],
    cfg: GanConfig,
    audio_cfg: AudioConfig = AudioConfig(),
) -> Dict[str, jax.Array]:
    """Eval metrics incl. the sync loss that drives the gate
    (eval_model, train_lipreading.py:155-192) and PSNR parity metric."""
    prep = prepare_batch(batch, cfg, audio_cfg)
    g = TalkingFaceGenerator(width=cfg.model_width, dtype=jnp.dtype(cfg.dtype)).apply(
        {"params": state.gen_params}, prep["indiv_mels"], prep["x"]
    )
    sync = _sync_loss(state.syncnet_params, prep["mel"], g, cfg)
    return {
        "eval/sync_loss": sync,
        "eval/l1": losses.l1(g, prep["gt"]),
        "eval/psnr": losses.psnr(g, prep["gt"]),
        "eval/ssim": losses.ssim(g, prep["gt"]),
    }


def maybe_open_sync_gate(state: GanTrainState, eval_sync_loss: float, cfg: GanConfig) -> GanTrainState:
    """Host-side gate flip: syncnet_wt 0→0.03 once eval sync < threshold
    (train_lipreading.py:187-192). Idempotent."""
    if float(eval_sync_loss) < cfg.syncnet_gate_threshold and float(state.syncnet_wt) == 0.0:
        return state.replace(syncnet_wt=jnp.asarray(cfg.syncnet_wt_after_gate, jnp.float32))
    return state


def checkpoint_tree(state: GanTrainState) -> Dict[str, Any]:
    """Full-fidelity checkpoint payload: G/D params, BOTH Adam states, the
    syncnet_wt gate, and the step counter (save_checkpoint semantics,
    train_lipreading.py:264-273 + the disc_ checkpoint at :181-184)."""
    return {
        "gen": state.gen_params,
        "disc": state.disc_params,
        "gen_opt": state.gen_opt,
        "disc_opt": state.disc_opt,
        "syncnet_wt": float(state.syncnet_wt),
        "step": int(state.step),
    }


def restore_state(state: GanTrainState, restored: Dict[str, Any]) -> GanTrainState:
    return state.replace(
        gen_params=restored["gen"],
        disc_params=restored["disc"],
        gen_opt=restored["gen_opt"],
        disc_opt=restored["disc_opt"],
        syncnet_wt=jnp.asarray(restored["syncnet_wt"], jnp.float32),
        step=jnp.asarray(int(restored["step"]), jnp.int32),
    )


def load_generator_params(checkpoint_path: str, cfg: GanConfig,
                          key: Optional[jax.Array] = None, state=None):
    """Serving-side checkpoint load — the reference's load_model
    (gan-model/inference.py:162-181): restore trained generator params from
    a train-gan checkpoint directory (Orbax CheckpointManager layout,
    latest step) or a one-shot ``save_once`` path of ``{"gen": params}``.
    Pass an existing ``state`` to reuse as the restore template (skips a
    second full G+D+SyncNet init)."""
    import os

    from ..core.checkpoint import CheckpointManager, load_once

    if state is None:
        state = create_state(cfg, jax.random.key(0) if key is None else key)
    if os.path.isdir(checkpoint_path) and any(
        d.isdigit() for d in os.listdir(checkpoint_path)
    ):
        restored = CheckpointManager(checkpoint_path).restore(checkpoint_tree(state))
        return restored["gen"]
    return load_once(checkpoint_path, {"gen": state.gen_params})["gen"]


def train(
    cfg: GanConfig,
    batch_fn,
    eval_batch_fn=None,
    num_steps: int = 1000,
    seed: int = 0,
    checkpoint_dir: Optional[str] = None,
    audio_cfg: AudioConfig = AudioConfig(),
    metrics_writer=None,
    syncnet_params=None,
    lip_expert_params=None,
    lip_expert_model=None,
    sample_dir: Optional[str] = None,
    mesh_spec=None,
    steps_per_dispatch: int = 8,
) -> GanTrainState:
    """Step-driven training loop (train_lipreading.py:91-199 shape):
    G+D step each iteration; every ``eval_interval`` steps run eval and
    maybe open the syncnet_wt gate; checkpoint every
    ``checkpoint_interval``; periodic sample-image dumps
    (save_sample_images, train_lipreading.py:57-68).

    ``steps_per_dispatch`` > 1 scans that many steps per device program
    (``gan_train_scan``), chunks aligned to eval/checkpoint boundaries —
    dispatch overhead measured larger than the device step itself."""
    from ..core import prng
    from ..core.checkpoint import CheckpointManager
    from ..core.config import MeshConfig
    from ..data.loader import host_prefetch, stack_batches, take
    from ..parallel.mesh import (
        build_mesh,
        shard_state,
        shard_batch,
        shard_stacked_batch,
    )

    spec = mesh_spec or build_mesh(MeshConfig())
    key = prng.make_root_key(seed)
    state = create_state(cfg, key, syncnet_params=syncnet_params,
                         lip_expert_params=lip_expert_params,
                         lip_expert_model=lip_expert_model)
    mgr = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    start_step = 0
    if mgr is not None and mgr.latest_step() is not None:
        # full-fidelity resume: params + BOTH Adam states + gate + step,
        # like load_checkpoint's optimizer/global-step restore
        # (train_lipreading.py:285-305)
        restored = mgr.restore(checkpoint_tree(state))
        start_step = int(mgr.latest_step())
        state = restore_state(state, restored)
    with spec.mesh:
        # params/opt/EMA placed via the TP-aware policy (pure-DP
        # meshes replicate; model axis >1 shards large kernels)
        state = shard_state(spec, state)
        # host batches produced by a background thread (overlaps the
        # device's multi-step programs); feed end (StopIteration from
        # batch_fn) stops training cleanly mid-plan
        feed = host_prefetch(batch_fn, depth=2 * steps_per_dispatch)
        step = start_step
        while step < num_steps:
            # chunk ends at the next eval/checkpoint boundary so cadence
            # semantics are unchanged by multi-step dispatch
            bounds = [num_steps, step + steps_per_dispatch]
            for iv in (cfg.eval_interval, cfg.checkpoint_interval):
                bounds.append(step + iv - (step % iv))
            raws = take(feed, max(1, min(bounds) - step))
            if not raws:
                break   # finite feed exhausted
            n = len(raws)
            if n == 1:
                batch = shard_batch(spec, raws[0])
                state, metrics = gan_train_step(state, batch, key, cfg, audio_cfg)
                if metrics_writer is not None:
                    metrics_writer.write(step, metrics)
            else:
                # N steps in one device program (see gan_train_scan)
                batches = shard_stacked_batch(spec, stack_batches(raws))
                batch = jax.tree_util.tree_map(lambda x: x[-1], batches)
                state, ms = gan_train_scan(state, batches, key, cfg, audio_cfg)
                if metrics_writer is not None:
                    ms = {k: np.asarray(v) for k, v in ms.items()}
                    for i in range(n):
                        metrics_writer.write(step + i,
                                             {k: v[i] for k, v in ms.items()})
            step += n
            if eval_batch_fn is not None and step % cfg.eval_interval == 0:
                # fresh held-out batch (eval_model uses a val loader,
                # train_lipreading.py:155-192). If caller passed the SAME
                # callable for train and eval, pull it from the producer
                # feed — fresh AND free of shared-sampler thread races.
                if eval_batch_fn is batch_fn:
                    nb = take(feed, 1)
                    eb = shard_batch(spec, nb[0]) if nb else batch
                else:
                    eb = shard_batch(spec, eval_batch_fn())
                em = gan_eval_step(state, eb, cfg, audio_cfg)
                state = maybe_open_sync_gate(state, float(em["eval/sync_loss"]), cfg)
                if metrics_writer is not None:
                    metrics_writer.write(step - 1, em)
            if mgr is not None and step % cfg.checkpoint_interval == 0:
                mgr.save(step, checkpoint_tree(state))
            if sample_dir is not None and step % cfg.checkpoint_interval == 0:
                import os

                os.makedirs(sample_dir, exist_ok=True)
                g = generate_step(state, batch, cfg, audio_cfg)
                collage = np.asarray(
                    (jnp.concatenate(list(g[0]), axis=1) * 255).astype(jnp.uint8)
                )
                try:
                    import cv2

                    cv2.imwrite(os.path.join(sample_dir, f"step{step}.jpg"),
                                collage[:, :, ::-1])
                except Exception:
                    pass
    if mgr is not None:
        mgr.wait()
    return state


@functools.partial(jax.jit, static_argnames=("cfg", "audio_cfg"))
def generate_step(
    state: GanTrainState,
    batch: Dict[str, jax.Array],
    cfg: GanConfig,
    audio_cfg: AudioConfig = AudioConfig(),
) -> jax.Array:
    """Sample generated windows for image dumps (save_sample_images,
    train_lipreading.py:57-68). Returns (B, T, H, W, 3) in [0,1]."""
    prep = prepare_batch(batch, cfg, audio_cfg)
    return TalkingFaceGenerator(width=cfg.model_width, dtype=jnp.dtype(cfg.dtype)).apply(
        {"params": state.gen_params}, prep["indiv_mels"], prep["x"]
    )
