"""Secondary benchmark: GAN training steps/sec at the reference's config
(batch 16, 5-frame 96×96 windows — BASELINE.md "GAN train config" row).

Relay-proof timing: steps are chained through the train state (step N+1
consumes step N's params), so a final host fetch of a scalar bounds the
chain. Run: python scripts/bench_gan.py [--width 1.0] [--steps 10]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from lipreading_video_generation_tpu.core.config import GanConfig
    from lipreading_video_generation_tpu.data.datasets import (
        GanWindowSampler,
        synthetic_gan_clips,
    )
    from lipreading_video_generation_tpu.pipelines import train_gan

    cfg = GanConfig(model_width=args.width, batch_size=args.batch)
    key = jax.random.key(0)
    state = train_gan.create_state(cfg, key)
    sampler = GanWindowSampler(synthetic_gan_clips(n_clips=4, frames=30), seed=0)
    batch = {k: jnp.asarray(v) for k, v in sampler.sample_batch(args.batch).items()}

    # compile + warm; fetch a scalar to force completion
    state, metrics = train_gan.gan_train_step(state, batch, key, cfg)
    _ = float(metrics["loss/g_total"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_gan.gan_train_step(state, batch, key, cfg)
    _ = float(metrics["loss/g_total"])  # chained through state
    total = time.perf_counter() - t0

    from lipreading_video_generation_tpu.utils.flops import flops_detail, mfu_report

    step_flops = flops_detail(train_gan.gan_train_step, state, batch, key, cfg)

    sps = args.steps / total
    print(json.dumps({
        "metric": "gan_train_steps_per_sec",
        "value": round(sps, 3),
        "unit": f"steps/sec @ batch={args.batch} width={args.width}",
        "frames_per_sec": round(sps * args.batch * cfg.syncnet_T, 1),
        "step_ms": round(total / args.steps * 1000, 1),
        **mfu_report(step_flops, total / args.steps),
    }))


if __name__ == "__main__":
    main()
