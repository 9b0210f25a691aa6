"""Breakdown profile of the GAN train step at the reference config
(batch 16, 96², full width) — relay-proof: K reps chained in one jit,
scalar-only host fetch.

Isolates: full step / prepare_batch / G fwd / G fwd+bwd (incl. frozen
SyncNet + D in the loss) / D fwd+bwd / SyncNet fwd — to locate the next
kernel target.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache_tpu"),
    min_compile_secs=1.0,
)

from lipreading_video_generation_tpu.core.config import AudioConfig, GanConfig
from lipreading_video_generation_tpu.data import datasets
from lipreading_video_generation_tpu.models.discriminator import Discriminator
from lipreading_video_generation_tpu.models.generator import TalkingFaceGenerator
from lipreading_video_generation_tpu.pipelines import losses, train_gan

K = 10
B = 16


def timed(name, step_fn, init_carry, consts):
    """``consts`` (batch/prep tensors) ride as jit ARGUMENTS — closed-over
    device arrays would be embedded as HLO constants and blow the relay's
    request-size limit."""

    @jax.jit
    def rep(carry, consts):
        def body(i, c):
            return step_fn(c, consts)
        out = jax.lax.fori_loop(0, K, body, carry)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) * 1e-12) for l in leaves)

    _ = float(rep(init_carry, consts))
    t0 = time.perf_counter()
    _ = float(rep(init_carry, consts))
    dt = (time.perf_counter() - t0) / K
    print(f"{name}: {dt * 1000:.1f} ms", flush=True)
    return dt


def main():
    cfg = GanConfig()
    audio_cfg = AudioConfig()
    key = jax.random.key(0)
    state = train_gan.create_state(cfg, key)
    clips = datasets.synthetic_gan_clips(n_clips=4, frames=30)
    sampler = datasets.GanWindowSampler(clips, cfg.syncnet_T, seed=0)
    batch = {k: jnp.asarray(v) for k, v in sampler.sample_batch(B).items()}
    prep = train_gan.prepare_batch(batch, cfg, audio_cfg)
    gen = TalkingFaceGenerator(width=cfg.model_width, dtype=jnp.dtype(cfg.dtype))
    disc = Discriminator(width=cfg.model_width, dtype=jnp.dtype(cfg.dtype))

    def full(carry, c):
        s, _ = carry
        s, m = train_gan.gan_train_step(s, c["batch"], key, cfg, audio_cfg)
        return (s, m["loss/g_total"])

    timed("full_train_step", full, (state, jnp.float32(0)), {"batch": batch})

    def prep_only(x, c):
        p = train_gan.prepare_batch(
            {**c["batch"], "wav": c["batch"]["wav"] + x * 1e-12}, cfg, audio_cfg)
        return x + jnp.sum(p["x"].astype(jnp.float32)) * 1e-12

    timed("prepare_batch", prep_only, jnp.float32(0), {"batch": batch})

    def g_fwd(x, c):
        g = gen.apply({"params": c["gp"]}, c["prep"]["indiv_mels"],
                      c["prep"]["x"] + x * 1e-12)
        return x + jnp.sum(g.astype(jnp.float32)) * 1e-12

    timed("gen_forward", g_fwd, jnp.float32(0),
          {"gp": state.gen_params, "prep": prep})

    def g_fwd_bwd(carry, c):
        params, _ = carry
        prep = c["prep"]

        def loss_fn(p):
            g = gen.apply({"params": p}, prep["indiv_mels"], prep["x"])
            recon = losses.l1(g, prep["gt"])
            sync = train_gan._sync_loss(c["sp"], prep["mel"], g, cfg)
            fake = disc.apply({"params": c["dp"]}, g)
            return recon + 0.03 * sync + 0.07 * losses.perceptual_adversarial_loss(fake)

        l, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, params, grads)
        return (params, l)

    timed("gen_fwd_bwd_full_loss", g_fwd_bwd, (state.gen_params, jnp.float32(0)),
          {"prep": prep, "sp": state.syncnet_params, "dp": state.disc_params})

    g_fixed = gen.apply({"params": state.gen_params}, prep["indiv_mels"], prep["x"])

    def d_fwd_bwd(carry, c):
        params, _ = carry

        def loss_fn(p):
            real = disc.apply({"params": p}, c["prep"]["gt"])
            fake = disc.apply({"params": p}, c["g"])
            dr, df = losses.discriminator_loss(real, fake)
            return dr + df

        l, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, params, grads)
        return (params, l)

    timed("disc_fwd_bwd", d_fwd_bwd, (state.disc_params, jnp.float32(0)),
          {"prep": prep, "g": g_fixed})

    def sync_fwd(x, c):
        s = train_gan._sync_loss(c["sp"], c["prep"]["mel"], c["g"] + x * 1e-12, cfg)
        return x + s * 1e-12

    timed("syncnet_forward", sync_fwd, jnp.float32(0),
          {"prep": prep, "g": g_fixed, "sp": state.syncnet_params})


if __name__ == "__main__":
    main()
