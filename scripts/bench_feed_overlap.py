"""Feed-overlap benchmark: host sampling inline vs prefetch_to_device.

SURVEY.md §7 hard part #1: mp4/sample decode runs on host; the input
pipeline must overlap it with device compute or throughput dies in the
feed. Measures the production GAN train loop both ways at the reference
config (batch 16, 96²).

Relay-proof: every step consumes the previous step's donated state, so the
final scalar fetch bounds the whole sequence; host feed time adds to the
critical path exactly as in production.

Run: python scripts/bench_feed_overlap.py [--steps N]
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

from lipreading_video_generation_tpu.core.config import GanConfig, MeshConfig
from lipreading_video_generation_tpu.data import datasets
from lipreading_video_generation_tpu.data.loader import prefetch_to_device
from lipreading_video_generation_tpu.parallel.mesh import build_mesh, replicate_state, shard_batch
from lipreading_video_generation_tpu.pipelines import train_gan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    cfg = GanConfig()
    key = jax.random.key(0)
    clips = datasets.synthetic_gan_clips(n_clips=8, frames=30)
    sampler = datasets.GanWindowSampler(clips, cfg.syncnet_T, seed=0)
    batch_fn = lambda: sampler.sample_batch(cfg.batch_size)
    spec = build_mesh(MeshConfig())

    def run_inline():
        state = train_gan.create_state(cfg, key)
        with spec.mesh:
            state = replicate_state(spec, state)
            # warm compile
            state, m = train_gan.gan_train_step(state, shard_batch(spec, batch_fn()), key, cfg)
            _ = float(m["loss/g_total"])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                b = shard_batch(spec, batch_fn())     # host sampling on the critical path
                state, m = train_gan.gan_train_step(state, b, key, cfg)
            _ = float(m["loss/g_total"])
        return (time.perf_counter() - t0) / args.steps

    def run_prefetch():
        state = train_gan.create_state(cfg, key)
        with spec.mesh:
            state = replicate_state(spec, state)
            state, m = train_gan.gan_train_step(state, shard_batch(spec, batch_fn()), key, cfg)
            _ = float(m["loss/g_total"])
            feed = prefetch_to_device(batch_fn, spec, num_batches=args.steps)
            t0 = time.perf_counter()
            for b in feed:
                state, m = train_gan.gan_train_step(state, b, key, cfg)
            _ = float(m["loss/g_total"])
        return (time.perf_counter() - t0) / args.steps

    def run_scan(chunk=8):
        from lipreading_video_generation_tpu.parallel.mesh import shard_stacked_batch

        state = train_gan.create_state(cfg, key)
        n_chunks = max(1, args.steps // chunk)
        with spec.mesh:
            state = replicate_state(spec, state)
            stacked = shard_stacked_batch(
                spec, train_gan._stack_batches([batch_fn() for _ in range(chunk)]))
            state, ms = train_gan.gan_train_scan(state, stacked, key, cfg)  # warm
            _ = float(ms["loss/g_total"][-1])
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                stacked = shard_stacked_batch(
                    spec, train_gan._stack_batches([batch_fn() for _ in range(chunk)]))
                state, ms = train_gan.gan_train_scan(state, stacked, key, cfg)
            _ = float(ms["loss/g_total"][-1])
        return (time.perf_counter() - t0) / (n_chunks * chunk)

    # measure host-side sampling cost alone
    t0 = time.perf_counter()
    for _ in range(10):
        batch_fn()
    host_ms = (time.perf_counter() - t0) / 10 * 1000

    inline = run_inline()
    overlap = run_prefetch()
    scan = run_scan()
    print(json.dumps({
        "metric": "gan_feed_overlap",
        "host_sample_ms": round(host_ms, 1),
        "inline_ms_per_step": round(inline * 1000, 1),
        "prefetch_ms_per_step": round(overlap * 1000, 1),
        "scan8_ms_per_step": round(scan * 1000, 1),
        "scan8_steps_per_sec": round(1.0 / scan, 2),
        "overlap_speedup": round(inline / overlap, 3),
        "scan_speedup_vs_inline": round(inline / scan, 3),
    }))


if __name__ == "__main__":
    main()
