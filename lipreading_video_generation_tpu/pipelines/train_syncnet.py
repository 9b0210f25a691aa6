"""SyncNet expert pretraining.

The reference uses a frozen ``lipsync_expert.pth`` it never trains in-repo
(gan-model/train_lipreading.py:342-343; syncnet hyperparams exist at
params.py:79-82: batch 64, lr 1e-4). A TPU-native framework must be able
to produce its own expert, so this is the standard Wav2Lip syncnet
objective: positive (aligned mel, face window) and negative (shifted)
pairs, BCE over cosine similarity.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..core.config import AudioConfig, GanConfig
from ..models.syncnet import SyncNet, stack_window_lower_half
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


@functools.partial(jax.jit, static_argnames=("cfg", "audio_cfg"), donate_argnums=(0,))
def train_step(
    state: SyncnetTrainState,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    cfg: GanConfig,
    audio_cfg: AudioConfig = AudioConfig(),
) -> Tuple[SyncnetTrainState, Dict[str, jax.Array]]:
    """Half the batch keeps its aligned mel (label 1), half is paired with a
    rolled (misaligned) mel (label 0)."""
    prep = prepare_batch(batch, cfg, audio_cfg)
    b = prep["gt"].shape[0]
    faces = stack_window_lower_half(prep["gt"])
    # negatives: pair each clip with the next clip's mel
    neg_mel = jnp.roll(prep["mel"], 1, axis=0)
    y = (jax.random.uniform(jax.random.fold_in(key, state.step), (b,)) > 0.5).astype(jnp.float32)
    mel = jnp.where(y[:, None, None, None] > 0.5, prep["mel"], neg_mel)

    def loss_fn(params):
        a, v = SyncNet(width=cfg.model_width).apply({"params": params}, mel, faces)
        return losses.syncnet_contrastive_loss(a, v, y)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        state.replace(step=state.step + 1, params=new_params, opt_state=new_opt),
        {"loss": loss},
    )


def load_params(path: str, cfg: GanConfig, key=None):
    """Load a ``train-syncnet --out`` export — the in-framework stand-in
    for the reference's frozen lipsync_expert.pth (train_lipreading.py:
    342-343; the shipped file is a broken HTML page, SURVEY §2.2)."""
    from ..core.checkpoint import load_once

    state = create_state(cfg, jax.random.key(0) if key is None else key)
    return load_once(path, {"syncnet": state.params})["syncnet"]
