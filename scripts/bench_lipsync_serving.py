"""Serving benchmark: lip-sync generation frames/sec at the reference's
inference config (img 96, generator batch 128 — gan-model/inference.py:35
``--wav2lip_batch_size``), including the on-device crop/mask/concat input
prep and the paste-back into full frames (inference.py:110-156, 267-274).

The reference loops host-built 128-frame batches through one GPU forward
per batch; here the whole program (prep → generator → paste-back) is one
jitted device function and the bench chains K invocations in-jit by feeding
each pass's pasted output frames back as the next pass's input frames — a
real data dependency, so one host fetch bounds the chain (relay-proof, see
bench.py docstring).

Run: python scripts/bench_lipsync_serving.py [--batch 128] [--hw 360 640]
Prints one JSON line with frames/sec, ×realtime at 25 fps, and MFU.
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, nargs=2, default=(360, 640),
                    help="full-frame height width")
    ap.add_argument("--width", type=float, default=1.0, help="generator width")
    ap.add_argument("--reps", type=int, default=8, help="in-jit chained passes")
    ap.add_argument("--int8", action="store_true",
                    help="dynamic-int8 generator matmuls (ops/quant.py)")
    ap.add_argument("--int8-static", action="store_true",
                    help="int8 with calibrated static activation scales "
                         "(no runtime reductions; one eager calibration "
                         "batch first)")
    args = ap.parse_args()
    if args.int8_static:
        args.int8 = True

    from lipreading_video_generation_tpu.core.config import GanConfig
    from lipreading_video_generation_tpu.models.generator import TalkingFaceGenerator
    from lipreading_video_generation_tpu.pipelines.inference import lipsync_batch
    from lipreading_video_generation_tpu.utils.flops import flops_detail, mfu_report

    gan_cfg = GanConfig(model_width=args.width)
    img = gan_cfg.img_size
    b, (H, W), K = args.batch, args.hw, args.reps
    rng = np.random.default_rng(0)

    gen = TalkingFaceGenerator(width=args.width)
    params = gen.init(
        jax.random.key(0), jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, img, img, 6))
    )["params"]
    frames = jnp.asarray(rng.integers(0, 256, (b, H, W, 3), dtype=np.uint8))
    boxes = jnp.asarray(
        np.tile([40.0, 300.0, 180.0, 430.0], (b, 1)).astype(np.float32)
        + rng.uniform(-4, 4, (b, 4)).astype(np.float32)
    )
    mels = jnp.asarray(rng.standard_normal((b, 80, 16)).astype(np.float32))

    act_scales = None
    if args.int8_static:
        # one-time eager calibration on a representative generator input,
        # through the SAME prep the production program uses
        from lipreading_video_generation_tpu.ops.quant import (
            calibrate_activation_scales,
        )
        from lipreading_video_generation_tpu.pipelines.inference import (
            gen_input_prep,
        )

        x_cal = gen_input_prep(frames.astype(jnp.float32), boxes, img)
        act_scales = calibrate_activation_scales(
            lambda m, xx: gen.apply({"params": params}, m, xx),
            [(mels[..., None], x_cal)])
        print(f"[calibrated {len(act_scales)} static scales]",
              file=sys.stderr)

    def serve_pass(frames_u8):
        # the production program itself (inference.lipsync_batch) — the
        # bench measures exactly what infer-lipsync serves
        return lipsync_batch(gen, params, frames_u8, boxes, mels, img,
                             int8=args.int8, act_scales=act_scales)

    @jax.jit
    def repeated(frames_u8):
        def body(i, f):
            return serve_pass(f)   # output frames ARE the next input: a chain
        return jax.lax.fori_loop(0, K, body, frames_u8)

    out = repeated(frames)
    _ = int(jnp.sum(out[0, 0, 0]))  # compile + drain

    total_flops = flops_detail(repeated, frames)
    per_pass_flops = (
        {k: v / K for k, v in total_flops.items()} if total_flops else None)

    tiny = jnp.zeros((8,)) + 1.0
    _ = np.asarray(tiny)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(tiny)
    rtt = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    out = repeated(frames)
    _ = int(jnp.sum(out[0, 0, 0]))
    total = time.perf_counter() - t0
    per_pass = max((total - rtt) / K, 1e-9)

    fps = b / per_pass
    mfu = mfu_report(per_pass_flops, per_pass)
    print(json.dumps({
        "metric": "lipsync_serving_frames_per_sec_per_chip"
                  + ("_int8_static" if args.int8_static
                     else "_int8" if args.int8 else ""),
        "value": round(fps, 1),
        "unit": f"frames/sec @ {H}x{W} batch={b} width={args.width}",
        "x_realtime_25fps": round(fps / 25.0, 1),
        "pass_ms": round(per_pass * 1000, 2),
        **mfu,
    }))
    print(f"[bench] backend={jax.default_backend()} rtt={rtt*1000:.1f}ms "
          f"total={total*1000:.0f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
