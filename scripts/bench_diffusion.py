"""Secondary benchmark: diffusion denoise steps/sec at the reference's
sampling config (500-step, 128×128 — BASELINE.md "diffusion sampling cost"
row; reference runs 500 sequential host-driven U-Net forwards with
per-step Wav2Vec2 re-encode, test.py:51-83).

Relay-proof timing: the full scan IS a chain (each step depends on the
previous xt), so one host fetch of the final image bounds the whole
trajectory. Run: python scripts/bench_diffusion.py [--tiny]
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

from lipreading_video_generation_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache_tpu"),
    min_compile_secs=1.0,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="16x16 quick config")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ddim-steps", type=int, default=None,
                    help="DDIM few-step sampling: N model forwards instead "
                         "of the full T-step DDPM chain; reports seconds "
                         "per image alongside steps/sec")
    ap.add_argument("--sampler", choices=("ddim", "dpmpp"), default="ddim",
                    help="few-step update rule (with --ddim-steps)")
    args = ap.parse_args()

    from lipreading_video_generation_tpu.core.config import DiffusionConfig
    from lipreading_video_generation_tpu.pipelines import sample_diffusion, train_diffusion

    if args.tiny:
        cfg = DiffusionConfig(
            im_size=16, base_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(2,), num_heads=2, time_embed_dim=64,
            audio_embed_dim=64, audio_proj_dim=16, im_cond_channels=8,
            audio_samples=800, num_timesteps=50, dtype="float32",
        )
    else:
        cfg = DiffusionConfig()  # 128×128, T=500, trained channel plan

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    state = train_diffusion.create_state(cfg, key)
    cond = jnp.asarray(rng.integers(0, 256, (args.batch, cfg.im_size, cfg.im_size, 3),
                                    dtype=np.uint8))
    audio = jnp.asarray(rng.standard_normal((args.batch, cfg.audio_samples)).astype(np.float32))

    n_steps = args.ddim_steps or cfg.num_timesteps
    # out_uint8: the serving fetch format (sample_video) — conversion runs
    # on-device inside the fused program, and the final host fetch is 4x
    # smaller (the fetch is most of the fixed per-image cost at few-step
    # counts on the relay)
    kw = dict(out_uint8=True)
    if args.ddim_steps:
        kw.update(num_inference_steps=args.ddim_steps, sampler=args.sampler)

    # compile + warm
    x0, _ = sample_diffusion.sample(state, cond, audio, key, cfg, **kw)
    _ = np.asarray(x0)

    # fetch round-trip on an already-computed tiny buffer (bench.py's
    # methodology): the relay's device→host RTT is a fixed per-fetch cost
    # every surface pays exactly once; the 500-step chain amortizes it to
    # 0.15 ms/step while a 20-step chain pays 3.7 ms/step of pure relay
    # latency — so the corrected number is the hardware-comparable one and
    # the raw wall clock is reported alongside.
    tiny = jnp.zeros((8,)) + 1.0
    _ = np.asarray(tiny)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(tiny)
    rtt = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    x0, _ = sample_diffusion.sample(state, cond, audio, jax.random.key(1), cfg, **kw)
    _ = np.asarray(x0)
    wall = time.perf_counter() - t0
    total = max(wall - rtt, 1e-9)

    # two-K differencing (the canonical relay-proof harness, BENCH_NOTES):
    # a second chain at half the steps isolates the true per-step cost from
    # the fixed per-image dispatch+fetch overhead — the number that
    # transfers to hardware without the relay's ~besides-the-point latency.
    marginal = None
    if args.ddim_steps and args.ddim_steps >= 8:
        n2 = args.ddim_steps // 2
        kw2 = dict(kw, num_inference_steps=n2)
        x2, _ = sample_diffusion.sample(state, cond, audio, key, cfg, **kw2)
        _ = np.asarray(x2)                       # compile + warm
        t0 = time.perf_counter()
        x2, _ = sample_diffusion.sample(state, cond, audio, jax.random.key(1),
                                        cfg, **kw2)
        _ = np.asarray(x2)
        wall2 = time.perf_counter() - t0
        per_step = (wall - wall2) / (args.ddim_steps - n2)
        marginal = {
            "marginal_ms_per_step": round(per_step * 1000, 3),
            "marginal_steps_per_sec": round(1.0 / per_step, 2),
            "fixed_overhead_s": round(wall - args.ddim_steps * per_step, 3),
        }

    from lipreading_video_generation_tpu.utils.flops import flops_detail, mfu_report

    # per-denoise-step FLOPs from the compiled 50-step scan segment
    seg = min(50, cfg.num_timesteps)
    cond_map = sample_diffusion.encode_condition(state, cond, audio, cfg)
    xt = jnp.zeros((args.batch, cfg.im_size, cfg.im_size, cfg.im_channels))
    seg_flops = flops_detail(
        sample_diffusion._scan_segment, state, xt, cond_map,
        jnp.arange(seg - 1, -1, -1), key, cfg)
    step_flops = (
        {k: v / seg for k, v in seg_flops.items()} if seg_flops else None)

    steps_per_sec = n_steps / total
    print(json.dumps({
        "metric": "diffusion_denoise_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": f"steps/sec @ {cfg.im_size}x{cfg.im_size} batch={args.batch}"
                + (f" {args.sampler}={args.ddim_steps}"
                   if args.ddim_steps else ""),
        "total_s": round(total, 3),
        "sec_per_image": round(total / args.batch, 3),
        "wall_s": round(wall, 3),
        "fetch_rtt_s": round(rtt, 4),
        **(marginal or {}),
        **mfu_report(step_flops, 1.0 / steps_per_sec),
    }))


if __name__ == "__main__":
    main()
