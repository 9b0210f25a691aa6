"""Conditional-DDPM training step.

Capability target: video-generation/diffusion/train.py:31-142 — q-sample
noisy frames, predict ε with the audio+image-conditioned U-Net, MSE.
Fixes inherited, not ported: t is sampled in [0, num_timesteps) (the
reference sampled [0,500) against a 100-step schedule, train.py:125), and
the lr default is sane (the reference's Adam lr 1e-2, train.py:102).

Audio is normalized on device (the 300 Hz high-pass + mean/std normalize of
dataset.py:30-41 expressed as an FIR high-pass + standardization inside the
jitted step).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..core import prng
from ..core.config import DiffusionConfig
from ..models.schedulers import make_scheduler
from ..models.unet_audio import UNetAudio
from ..ops import image as image_ops
from . import losses


@flax.struct.dataclass
class DiffusionTrainState:
    step: jax.Array
    params: Any
    ema_params: Any              # EMA shadow (utils.py:92-102 update_ema)
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    ema_rate: float = flax.struct.field(pytree_node=False, default=0.9999)


def create_state(cfg: DiffusionConfig, key: jax.Array, ema_rate: float = 0.9999,
                 wav2vec2_checkpoint: str | None = None) -> DiffusionTrainState:
    """``wav2vec2_checkpoint`` (a ``port-wav2vec2 --out`` artifact)
    initializes the audio-encoder submodule from the ported pretrained
    weights — the reference starts from pretrained
    facebook/wav2vec2-base-960h and trains it jointly (unet_audio.py:11-14);
    requires ``cfg.audio_encoder == "wav2vec2"`` with matching dims (use
    ``ports.diffusion_cfg_with_wav2vec2``)."""
    model = UNetAudio(cfg)
    xt = jnp.zeros((1, cfg.im_size, cfg.im_size, cfg.im_channels))
    cond = jnp.zeros((1, cfg.im_size, cfg.im_size, cfg.im_channels))
    wave = jnp.zeros((1, cfg.audio_samples))
    params = model.init(key, xt, cond, wave, jnp.zeros((1,), jnp.int32))["params"]
    if wav2vec2_checkpoint:
        from ..models import ports

        w2v_params, _ = ports.load_wav2vec2_params(wav2vec2_checkpoint)
        params = ports.graft_wav2vec2_into_diffusion(dict(params), w2v_params)
    tx = optax.adam(cfg.learning_rate)
    # ema starts as a *copy* of params (donation-safe: no aliased buffers)
    ema = jax.tree_util.tree_map(jnp.array, params)
    return DiffusionTrainState(
        step=jnp.zeros((), jnp.int32), params=params, ema_params=ema,
        opt_state=tx.init(params), tx=tx, ema_rate=ema_rate,
    )


def update_ema(ema, params, rate: float):
    """ema ← rate·ema + (1−rate)·params (video-generation/diffusion/
    utils.py:92-102) as a pure tree map."""
    return jax.tree_util.tree_map(lambda e, p: e * rate + p * (1.0 - rate), ema, params)


def normalize_audio(wave: jax.Array) -> jax.Array:
    """High-pass (~300 Hz @16 kHz, first-order) + per-clip standardization —
    the device-side form of dataset.py:30-41's biquad + normalize."""
    alpha = 0.889  # exp(-2π·300/16000)
    prev = jnp.pad(wave[..., :-1], [(0, 0)] * (wave.ndim - 1) + [(1, 0)])
    hp = wave - alpha * prev
    mean = jnp.mean(hp, axis=-1, keepdims=True)
    std = jnp.std(hp, axis=-1, keepdims=True) + 1e-6
    return (hp - mean) / std


def prepare_batch(batch: Dict[str, jax.Array], cfg: DiffusionConfig) -> Dict[str, jax.Array]:
    """uint8 frames → ±1 float at im_size; raw audio → normalized."""
    target = image_ops.resize(batch["target_frame"], (cfg.im_size, cfg.im_size))
    cond = image_ops.resize(batch["cond_frame"], (cfg.im_size, cfg.im_size))
    return {
        "target": image_ops.normalize_uint8(target, symmetric=True),
        "cond": image_ops.normalize_uint8(cond, symmetric=True),
        "audio": normalize_audio(batch["audio"]),
    }


def _train_step_impl(
    state: DiffusionTrainState,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    cfg: DiffusionConfig,
) -> Tuple[DiffusionTrainState, Dict[str, jax.Array]]:
    scheduler = make_scheduler(cfg.scheduler, cfg.num_timesteps, cfg.beta_start, cfg.beta_end)
    prep = prepare_batch(batch, cfg)
    step_key = prng.step_key(key, state.step)
    kt, kn, kd = jax.random.split(step_key, 3)
    b = prep["target"].shape[0]
    t = prng.uniform_timesteps(kt, b, cfg.num_timesteps)
    noise = jax.random.normal(kn, prep["target"].shape)
    noisy = scheduler.add_noise(prep["target"], noise, t)

    def loss_fn(params):
        pred = UNetAudio(cfg).apply(
            {"params": params}, noisy, prep["cond"], prep["audio"], t,
            deterministic=False, rngs={"dropout": kd},
        )
        return losses.noise_mse(pred, noise)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        ema_params=update_ema(state.ema_params, new_params, state.ema_rate),
        opt_state=new_opt,
    )
    return new_state, {"loss": loss, "t_mean": t.astype(jnp.float32).mean()}


train_step = functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnums=(0,)
)(_train_step_impl)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_scan(
    state: DiffusionTrainState,
    batches: Dict[str, jax.Array],   # step-stacked batch tree, leading axis N
    key: jax.Array,
    cfg: DiffusionConfig,
) -> Tuple[DiffusionTrainState, Dict[str, jax.Array]]:
    """N train steps in ONE device program (``lax.scan`` over a
    step-stacked batch tree) — amortizes per-dispatch host/relay overhead.
    Per-step PRNG stays step-keyed: the impl folds ``key`` with
    ``state.step``, which advances inside the scan."""
    def body(s, b):
        return _train_step_impl(s, b, key, cfg)

    return jax.lax.scan(body, state, batches)


def checkpoint_tree(state: DiffusionTrainState) -> Dict[str, Any]:
    """Everything resume needs: params, EMA shadow, Adam moments, step —
    the reference's save_checkpoint carries model + optimizer + counters
    (gan-model/train_lipreading.py:264-273); the diffusion driver's bare
    state_dict (train.py:137) is upgraded to the same fidelity."""
    return {
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        "step": int(state.step),
    }


def restore_state(state: DiffusionTrainState, restored: Dict[str, Any]) -> DiffusionTrainState:
    return state.replace(
        params=restored["params"],
        ema_params=restored["ema_params"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(int(restored["step"]), jnp.int32),
    )


def load_sampling_params(
    checkpoint_path: str,
    cfg: DiffusionConfig,
    key=None,
    use_ema: bool = True,
):
    """Serving-side load for the sampler (reference test.py:86-116
    load_model_and_scheduler): restore from a train-diffusion checkpoint
    directory (latest step; EMA params by default — the weights the
    guided-diffusion recipe samples with) or a one-shot ``{"params": ...}``
    save path."""
    import os

    from ..core.checkpoint import CheckpointManager, load_once

    state = create_state(cfg, jax.random.key(0) if key is None else key)
    if os.path.isdir(checkpoint_path) and any(
        d.isdigit() for d in os.listdir(checkpoint_path)
    ):
        restored = CheckpointManager(checkpoint_path).restore(checkpoint_tree(state))
        return restored["ema_params" if use_ema else "params"]
    return load_once(checkpoint_path, {"params": state.params})["params"]


def train(
    cfg: DiffusionConfig,
    batch_fn,
    num_steps: int = 1000,
    seed: int = 0,
    checkpoint_dir=None,
    metrics_writer=None,
    checkpoint_every: int = 500,
    mesh_spec=None,
    steps_per_dispatch: int = 4,
    eval_batch_fn=None,
    eval_every: int = 500,
    wav2vec2_checkpoint: str | None = None,
) -> DiffusionTrainState:
    """Step-driven loop (train.py:107-137 shape, step- not epoch-indexed):
    q-sample + ε-MSE per step on the data-parallel mesh; periodic Orbax
    checkpoints of the FULL train state (params + EMA + optimizer + step)
    replacing the reference's bare per-epoch state_dict overwrite
    (train.py:137). ``steps_per_dispatch`` > 1 scans that many steps per
    device program (``train_scan``), chunks aligned to checkpoint/eval
    boundaries. ``eval_batch_fn`` enables a held-out ε-MSE every
    ``eval_every`` steps (the reference's diffusion driver splits a val set,
    train.py:66-67, but never evaluates on it — upgraded here to match the
    GAN loop's eval cadence)."""
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
    state = create_state(cfg, key, wav2vec2_checkpoint=wav2vec2_checkpoint)
    mgr = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    start_step = 0
    if mgr is not None and mgr.latest_step() is not None:
        restored = mgr.restore(checkpoint_tree(state))
        start_step = int(mgr.latest_step())
        state = restore_state(state, restored)
    with spec.mesh:
        # params/opt/EMA placed via the TP-aware policy (pure-DP
        # meshes replicate; model axis >1 shards large kernels)
        state = shard_state(spec, state)
        feed = host_prefetch(batch_fn, depth=2 * steps_per_dispatch)
        step = start_step
        while step < num_steps:
            bounds = [num_steps, step + steps_per_dispatch,
                      step + checkpoint_every - (step % checkpoint_every)]
            if eval_batch_fn is not None:
                bounds.append(step + eval_every - (step % eval_every))
            raws = take(feed, max(1, min(bounds) - step))
            if not raws:
                break   # finite feed exhausted
            n = len(raws)
            if n == 1:
                state, metrics = train_step(
                    state, shard_batch(spec, raws[0]), key, cfg)
                if metrics_writer is not None:
                    metrics_writer.write(step, metrics)
            else:
                batches = shard_stacked_batch(spec, stack_batches(raws))
                state, ms = train_scan(state, batches, key, cfg)
                if metrics_writer is not None:
                    import numpy as np

                    ms = {k: np.asarray(v) for k, v in ms.items()}
                    for i in range(n):
                        metrics_writer.write(step + i,
                                             {k: v[i] for k, v in ms.items()})
            step += n
            if eval_batch_fn is not None and step % eval_every == 0:
                # held-out ε-MSE; if caller passed the SAME callable for
                # train and eval, pull from the producer feed (fresh AND
                # free of shared-sampler thread races) like the GAN loop
                if eval_batch_fn is batch_fn:
                    nb = take(feed, 1)
                    eb = shard_batch(spec, nb[0]) if nb else None
                else:
                    eb = shard_batch(spec, eval_batch_fn())
                if eb is not None:
                    em = eval_step(state, eb, prng.step_key(key, step), cfg)
                    if metrics_writer is not None:
                        metrics_writer.write(step - 1, em)
            if mgr is not None and step % checkpoint_every == 0:
                mgr.save(step, checkpoint_tree(state))
    if mgr is not None:
        mgr.wait()
    return state


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(
    state: DiffusionTrainState,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    cfg: DiffusionConfig,
) -> Dict[str, jax.Array]:
    scheduler = make_scheduler(cfg.scheduler, cfg.num_timesteps, cfg.beta_start, cfg.beta_end)
    prep = prepare_batch(batch, cfg)
    kt, kn = jax.random.split(key)
    b = prep["target"].shape[0]
    t = prng.uniform_timesteps(kt, b, cfg.num_timesteps)
    noise = jax.random.normal(kn, prep["target"].shape)
    noisy = scheduler.add_noise(prep["target"], noise, t)
    pred = UNetAudio(cfg).apply({"params": state.params}, noisy, prep["cond"], prep["audio"], t)
    return {"eval/loss": losses.noise_mse(pred, noise)}
