"""Breakdown profile of the diffusion TRAIN step at the reference config
(relay-proof: K reps chained in one jit, host fetch terminates).

Isolates: full step / loss fwd / fwd+bwd without optimizer / optimizer+EMA
/ conditioning encode (audio) fwd+bwd — to locate the next kernel target.
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

from lipreading_video_generation_tpu.core.config import DiffusionConfig
from lipreading_video_generation_tpu.models.unet_audio import UNetAudio
from lipreading_video_generation_tpu.pipelines import train_diffusion

K = 5
B = 8


def timed(name, step_fn, init_carry):
    """step_fn: carry -> carry (all device work chained through carry).
    Only a SCALAR reduction of the carry is fetched — fetching the carry
    itself would ship the whole param tree through the relay and swamp the
    measurement."""

    @jax.jit
    def rep(carry):
        def body(i, c):
            return step_fn(c)
        out = jax.lax.fori_loop(0, K, body, init_carry)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) * 1e-12) for l in leaves)

    _ = float(rep(init_carry))  # warm/compile
    t0 = time.perf_counter()
    _ = float(rep(init_carry))
    dt = (time.perf_counter() - t0) / K
    print(f"{name}: {dt * 1000:.1f} ms", flush=True)
    return dt


def main():
    cfg = DiffusionConfig()
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    state = train_diffusion.create_state(cfg, key)
    model = UNetAudio(cfg)
    batch = {
        "cond_frame": jnp.asarray(rng.integers(0, 256, (B, cfg.im_size, cfg.im_size, 3),
                                               dtype=np.uint8)),
        "target_frame": jnp.asarray(rng.integers(0, 256, (B, cfg.im_size, cfg.im_size, 3),
                                                 dtype=np.uint8)),
        "audio": jnp.asarray(rng.standard_normal((B, cfg.audio_samples)).astype(np.float32)),
    }
    prep = train_diffusion.prepare_batch(batch, cfg)
    cond_map = model.apply({"params": state.params}, prep["audio"], prep["cond"],
                           method=UNetAudio.encode_condition)
    xt = jnp.asarray(rng.standard_normal((B, cfg.im_size, cfg.im_size, 3)).astype(np.float32))
    tb = jnp.zeros((B,), jnp.int32)

    # 1. full train step (state chained)
    def full(carry):
        s, _ = carry
        s, m = train_diffusion.train_step(s, batch, key, cfg)
        return (s, m["loss"])
    timed("full_train_step", full, (state, jnp.float32(0)))

    # 2. loss forward only (xt chained)
    def fwd(x):
        p = model.apply({"params": state.params}, x, prep["cond"], prep["audio"], tb)
        return x + 1e-12 * p

    timed("loss_forward_only", fwd, xt)

    # 3. denoise-only forward (conditioning precomputed)
    def den(x):
        p = model.apply({"params": state.params}, x, cond_map, tb,
                        method=UNetAudio.denoise)
        return x + 1e-12 * p

    timed("denoise_forward", den, xt)

    # 4. denoise fwd+bwd (grad wrt params, params chained via tiny update)
    def den_grad(carry):
        params, _ = carry
        def loss_fn(p):
            out = model.apply({"params": p}, xt, cond_map, tb, method=UNetAudio.denoise)
            return jnp.mean(out.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, params, g)
        return (params, l)

    timed("denoise_fwd_bwd", den_grad, (state.params, jnp.float32(0)))

    # 5. full fwd+bwd incl. conditioning encode
    def full_grad(carry):
        params, _ = carry
        def loss_fn(p):
            out = model.apply({"params": p}, xt, prep["cond"], prep["audio"], tb)
            return jnp.mean(out.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, params, g)
        return (params, l)

    timed("full_fwd_bwd", full_grad, (state.params, jnp.float32(0)))

    # 6. optimizer + EMA only (reuse a fixed grad tree = params)
    def opt_only(carry):
        s, _ = carry
        updates, new_opt = s.tx.update(s.params, s.opt_state, s.params)
        import optax

        new_params = optax.apply_updates(s.params, updates)
        s = s.replace(params=new_params,
                      ema_params=train_diffusion.update_ema(s.ema_params, new_params, s.ema_rate),
                      opt_state=new_opt)
        return (s, jnp.float32(0))

    timed("optimizer_plus_ema", opt_only, (state, jnp.float32(0)))


if __name__ == "__main__":
    main()
