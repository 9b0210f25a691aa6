"""Benchmark the ViViT TRAIN step (batch 256 synthetic word clips) with
FLOP/MFU accounting — the training-side counterpart of bench.py's
preprocess+inference headline (reference trainer:
lipreading/huggingface_vivit_model.py:35-64).

Relay-proof timing: steps chain through the donated train state, so one
scalar fetch bounds the run. Run: python scripts/bench_vivit_train.py
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--steps-per-dispatch", type=int, default=8,
                    help="production dispatch mode: lax.scan this many steps "
                         "per device program (train loops default to 8); "
                         "1 = per-step dispatch")
    args = ap.parse_args()

    from lipreading_video_generation_tpu.core.config import ViViTConfig
    from lipreading_video_generation_tpu.pipelines import train_vivit
    from lipreading_video_generation_tpu.utils.flops import flops_detail, mfu_report

    cfg = ViViTConfig(num_classes=64, batch_size=args.batch)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    state = train_vivit.create_state(cfg, key)
    batch = {
        "clips": jnp.asarray(rng.integers(
            0, 256, (args.batch, cfg.num_frames, cfg.image_size, cfg.image_size,
                     cfg.num_channels), dtype=np.uint8)),
        "labels": jnp.asarray(rng.integers(0, cfg.num_classes, (args.batch,),
                                           dtype=np.int32)),
    }

    spd = max(1, args.steps_per_dispatch)
    if spd > 1:
        # the production dispatch mode (train_vivit.train's default):
        # scan `spd` steps per device program over a step-stacked batch
        # tree — per-step dispatch pays the full relay RTT per step and
        # under-reports the device rate by >2×
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (spd,) + x.shape), batch)
        state, metrics = train_vivit.train_scan(state, stacked, key)
        _ = float(metrics["loss"][-1])
        n_dispatch = max(1, args.steps // spd)
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            state, metrics = train_vivit.train_scan(state, stacked, key)
        _ = float(metrics["loss"][-1])
        dt = (time.perf_counter() - t0) / (n_dispatch * spd)
        step_flops = flops_detail(train_vivit.train_scan, state, stacked, key)
        if step_flops:
            step_flops = {k: v / spd for k, v in step_flops.items()}
    else:
        state, metrics = train_vivit.train_step(state, batch, key)
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = train_vivit.train_step(state, batch, key)
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        step_flops = flops_detail(train_vivit.train_step, state, batch, key)

    print(json.dumps({
        "metric": "vivit_train_frames_per_sec",
        "value": round(args.batch * cfg.num_frames / dt, 1),
        "unit": f"frames/sec @ batch={args.batch}",
        "steps_per_sec": round(1.0 / dt, 2),
        "steps_per_dispatch": spd,
        **mfu_report(step_flops, dt),
    }))


if __name__ == "__main__":
    main()
