"""Benchmark: S3FD face-detection frames/sec — the GAN preprocessing hot
path (the reference fans ThreadPoolExecutor jobs over GPUs to push 45k
LRS2 clips through S3FD, gan-model/preprocessing/preprocess.py:36-103;
serving detects every frame before generation, inference.py:70-108).

One jitted program per batch: S3FD forward (VGG backbone + 6 multi-scale
heads) → dense anchor decode → top-k + batched NMS, all on device.
Relay-proof timing: K in-jit repetitions chained by folding the previous
iteration's box sum into the next input batch (see bench.py docstring).

Run: python scripts/bench_face_detect.py [--batch 16] [--hw 360 640]
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
    ap.add_argument("--batch", type=int, default=16,
                    help="reference face_det_batch_size (inference.py:33)")
    ap.add_argument("--hw", type=int, nargs=2, default=(360, 640))
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from lipreading_video_generation_tpu.models.s3fd import S3FD, detect_faces
    from lipreading_video_generation_tpu.utils.flops import flops_detail, mfu_report

    b, (H, W), K = args.batch, args.hw, args.reps
    rng = np.random.default_rng(0)
    model = S3FD()
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
    images = jnp.asarray(
        rng.standard_normal((b, H, W, 3)).astype(np.float32) * 40.0)

    @jax.jit
    def repeated(imgs):
        def body(i, carry):
            im, acc = carry
            boxes, scores, valid = detect_faces(model, params, im)
            s = jnp.sum(boxes) * 1e-6 + jnp.sum(scores)
            # chain: perturb the next batch with this batch's result
            return im + (s % 1.0) * 1e-3, acc + s
        im, acc = jax.lax.fori_loop(0, K, body, (imgs, jnp.float32(0)))
        return acc

    _ = float(repeated(images))   # compile + drain

    total_flops = flops_detail(repeated, images)
    per_pass_flops = (
        {k: v / K for k, v in total_flops.items()} if total_flops else None)

    tiny = jnp.zeros((8,)) + 1.0
    _ = np.asarray(tiny)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(tiny)
    rtt = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    _ = float(repeated(images))
    total = time.perf_counter() - t0
    per_pass = max((total - rtt) / K, 1e-9)

    fps = b / per_pass
    mfu = mfu_report(per_pass_flops, per_pass)
    print(json.dumps({
        "metric": "s3fd_face_detect_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": f"frames/sec @ {H}x{W} batch={b}",
        "pass_ms": round(per_pass * 1000, 2),
        **mfu,
    }))
    print(f"[bench] backend={jax.default_backend()} rtt={rtt*1000:.1f}ms "
          f"total={total*1000:.0f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
