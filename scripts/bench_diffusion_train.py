"""Benchmark the diffusion TRAIN step at the reference config (batch 8 @
128×128, full trained channel plan — video-generation/diffusion/train.py:
82-97). This is the surface the Pallas flash backward targets: backward
through five 16k-token attention layers.

Relay-proof timing: steps chain through the train state (step N+1 consumes
step N's donated state), so fetching the last step's loss bounds the whole
run. Run: python scripts/bench_diffusion_train.py [--tiny] [--steps N]
"""
import argparse
import json
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from lipreading_video_generation_tpu.core.config import DiffusionConfig
    from lipreading_video_generation_tpu.pipelines import train_diffusion

    if args.tiny:
        cfg = DiffusionConfig(
            im_size=16, base_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(2,), num_heads=2, time_embed_dim=64,
            audio_embed_dim=64, audio_proj_dim=16, im_cond_channels=8,
            audio_samples=800, num_timesteps=50, dtype="float32", batch_size=2,
        )
        batch_size = 2
    else:
        cfg = DiffusionConfig()
        batch_size = args.batch

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    state = train_diffusion.create_state(cfg, key)
    batch = {
        "cond_frame": jnp.asarray(rng.integers(0, 256, (batch_size, cfg.im_size,
                                                        cfg.im_size, 3), dtype=np.uint8)),
        "target_frame": jnp.asarray(rng.integers(0, 256, (batch_size, cfg.im_size,
                                                          cfg.im_size, 3), dtype=np.uint8)),
        "audio": jnp.asarray(rng.standard_normal((batch_size, cfg.audio_samples))
                             .astype(np.float32)),
    }

    # compile + warm
    state, metrics = train_diffusion.train_step(state, batch, key, cfg)
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_diffusion.train_step(state, batch, key, cfg)
    _ = float(metrics["loss"])   # chain-terminating host fetch
    dt = (time.perf_counter() - t0) / args.steps

    from lipreading_video_generation_tpu.utils.flops import flops_detail, mfu_report

    step_flops = flops_detail(train_diffusion.train_step, state, batch, key, cfg)

    print(json.dumps({
        "metric": "diffusion_train_steps_per_sec",
        "value": round(1.0 / dt, 4),
        "unit": "steps/s",
        "sec_per_step": round(dt, 4),
        "batch": batch_size,
        "im_size": cfg.im_size,
        **mfu_report(step_flops, dt),
    }))


if __name__ == "__main__":
    main()
