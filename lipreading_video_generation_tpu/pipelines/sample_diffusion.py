"""Reverse-diffusion sampling as one jitted ``lax.scan``.

Capability target: sample_images (video-generation/diffusion/test.py:51-83):
xt ~ N(0,1), loop t = T−1 … 0, ε̂ = model(xt, cond), xt ← posterior sample;
x0 previews every ``snapshot_every`` steps.

The two reference inefficiencies this fixes (SURVEY.md §3.5):
1. the Python loop launches 500 sequential host→device round trips — here
   the whole trajectory is one ``lax.scan`` inside one jit;
2. Wav2Vec2 conditioning was re-encoded EVERY step (test.py:62) — here
   ``encode_condition`` runs once and the scan carries only xt.

x0 snapshots come back as a stacked (num_snapshots, ...) array from the
scan's ys — no per-step host sync.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import DiffusionConfig
from ..models.schedulers import make_scheduler
from ..models.unet_audio import UNetAudio
from ..ops import image as image_ops
from .train_diffusion import DiffusionTrainState, normalize_audio


@functools.partial(jax.jit, static_argnames=("cfg", "snapshot_every", "use_ema"))
def sample(
    state: DiffusionTrainState,
    cond_frame_uint8: jax.Array,   # (B, h, w, 3) uint8 condition frame
    audio_wave: jax.Array,         # (B, samples) raw waveform
    key: jax.Array,
    cfg: DiffusionConfig,
    snapshot_every: int = 50,
    use_ema: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (x0 (B, H, W, 3) in [0,1], snapshots (S, B, H, W, 3)).
    ``use_ema`` samples with the EMA shadow params (utils.py:92-102)."""
    scheduler = make_scheduler(cfg.scheduler, cfg.num_timesteps, cfg.beta_start, cfg.beta_end)
    model = UNetAudio(cfg)
    state = state.replace(params=state.ema_params) if use_ema else state
    cond_img = image_ops.normalize_uint8(
        image_ops.resize(cond_frame_uint8, (cfg.im_size, cfg.im_size)), symmetric=True
    )
    cond_map = model.apply(
        {"params": state.params}, normalize_audio(audio_wave), cond_img,
        method=UNetAudio.encode_condition,
    )
    b = cond_img.shape[0]
    k0, kloop = jax.random.split(key)
    xt0 = jax.random.normal(k0, (b, cfg.im_size, cfg.im_size, cfg.im_channels))

    ts = jnp.arange(cfg.num_timesteps - 1, -1, -1)

    def step(carry, t):
        xt = carry
        tb = jnp.full((b,), t, jnp.int32)
        eps = model.apply({"params": state.params}, xt, cond_map, tb,
                          method=UNetAudio.denoise)
        xt_prev, x0 = scheduler.sample_prev_timestep(
            xt, eps, tb, jax.random.fold_in(kloop, t)
        )
        return xt_prev, x0

    xT_final, x0_traj = jax.lax.scan(step, xt0, ts)
    snapshots = x0_traj[::snapshot_every]
    final = (jnp.clip(xT_final, -1.0, 1.0) + 1.0) / 2.0
    snapshots = (jnp.clip(snapshots, -1.0, 1.0) + 1.0) / 2.0
    return final, snapshots
