"""Lip-landmark regressor training.

The reference gets lip landmarks for free from MediaPipe's pretrained
FaceLandmarker (lipreading/preprocess.py:38-44); a TPU-native framework
must be able to produce its own. This trains models/lip_landmark.py's
LipLandmarkNet with an L1 objective on the 4 normalized lip points, on
either (face_crop, points) pairs from a labeled source or the built-in
synthetic face renderer (models/lip_landmark.synthetic_face_batch) when no
labels exist in the environment.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..models import lip_landmark


@flax.struct.dataclass
class LandmarkTrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def create_state(key: jax.Array, lr: float = 3e-4, width: int = 32) -> LandmarkTrainState:
    params = lip_landmark.init_params(key, width=width)
    tx = optax.adam(lr)
    return LandmarkTrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def train_step(
    state: LandmarkTrainState, images: jax.Array, points: jax.Array
) -> Tuple[LandmarkTrainState, Dict[str, jax.Array]]:
    """One L1 step on (B, 64, 64, 1) crops vs (B, 4, 2) normalized points."""

    def loss_fn(params):
        pred = lip_landmark.LipLandmarkNet().apply({"params": params}, images)
        return jnp.mean(jnp.abs(pred - points))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    return (
        state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=new_opt,
        ),
        {"loss": loss},
    )


@jax.jit
def photometric_augment(key: jax.Array, images: jax.Array) -> jax.Array:
    """Per-sample brightness/contrast jitter + extra sensor noise.

    Deliberately photometric-ONLY: the distribution-shift evaluation
    (models/lip_landmark.shifted_face_batch) holds out its geometric and
    optical transforms (rotation/blur/occlusion/teeth), so passing it means
    generalization, not augmentation overlap."""
    k1, k2, k3 = jax.random.split(key, 3)
    n = images.shape[0]
    gain = jax.random.uniform(k1, (n, 1, 1, 1), minval=0.7, maxval=1.3)
    bias = jax.random.uniform(k2, (n, 1, 1, 1), minval=-0.1, maxval=0.1)
    noise = 0.03 * jax.random.normal(k3, images.shape)
    return jnp.clip(images * gain + bias + noise, 0.0, 1.0)


def train(
    num_steps: int = 400,
    batch_size: int = 64,
    seed: int = 0,
    lr: float = 3e-4,
    checkpoint_dir: Optional[str] = None,
    log_every: int = 100,
    augment: bool = True,
) -> LandmarkTrainState:
    """Train on synthetic faces; optionally save the final params with Orbax."""
    key = jax.random.PRNGKey(seed)
    state = create_state(jax.random.fold_in(key, 1), lr=lr)
    for step in range(num_steps):
        imgs, pts = lip_landmark.synthetic_face_batch(
            jax.random.fold_in(key, 1000 + step), batch_size
        )
        if augment:
            imgs = photometric_augment(jax.random.fold_in(key, 5000 + step), imgs)
        state, metrics = train_step(state, imgs, pts)
        if log_every and (step + 1) % log_every == 0:
            print(f"landmark step {step + 1}: loss {float(metrics['loss']):.4f}")
    if checkpoint_dir is not None:
        from ..core import checkpoint as ckpt

        ckpt.save_once(checkpoint_dir, {"params": jax.device_get(state.params)})
    return state


def load_params(checkpoint_dir: str):
    """Restore trained landmark params saved by ``train``."""
    from ..core import checkpoint as ckpt

    template = {"params": jax.device_get(create_state(jax.random.PRNGKey(0)).params)}
    return ckpt.load_once(checkpoint_dir, template)["params"]
