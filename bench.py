"""Benchmark: end-to-end mouth-ROI preprocessing + ViViT inference.

The BASELINE.json headline metric: frames/sec/chip for the fused
preprocess (crop → 48×48 → CLAHE → 32×32 grayscale) + ViViT word-classifier
forward, the TPU rebuild of the reference pipeline that ran MediaPipe +
per-frame DenseNet predict on host (lipreading/get_data.py:37-49,
feature_extraction.py:78-88).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 2,000 frames/sec/chip north star
(BASELINE.json; the reference publishes no numbers of its own).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

NORTH_STAR_FPS = 2000.0


def main() -> None:
    from lipreading_video_generation_tpu.core.config import ViViTConfig
    from lipreading_video_generation_tpu.models.vivit import ViViT
    from lipreading_video_generation_tpu.pipelines.preprocess import mouth_roi_pipeline

    cfg = ViViTConfig(num_classes=64)
    model = ViViT(cfg)
    b, t = 256, cfg.num_frames          # 1280 frames per step
    rng = np.random.default_rng(0)

    clips0 = jnp.zeros((1, t, cfg.image_size, cfg.image_size, cfg.num_channels))
    params = model.init(jax.random.key(0), clips0)["params"]

    frames = jnp.asarray(rng.integers(0, 256, (b * t, 96, 96, 3), dtype=np.uint8))
    boxes = jnp.asarray(
        np.tile([8.0, 92.0, 6.0, 90.0], (b * t, 1)).astype(np.float32)
        + rng.uniform(-2, 2, (b * t, 4)).astype(np.float32)
    )

    @jax.jit
    def pipeline(params, frames, boxes):
        roi = mouth_roi_pipeline(frames, boxes)
        clips = roi.reshape(b, t, cfg.image_size, cfg.image_size, 1)
        logits = model.apply({"params": params}, clips.astype(jnp.float32) / 255.0)
        return jnp.argmax(logits, axis=-1)

    # warmup / compile
    out = pipeline(params, frames, boxes)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, frames, boxes)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    frames_per_sec = (b * t) / dt
    print(
        json.dumps(
            {
                "metric": "preprocess+vivit_inference_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(frames_per_sec / NORTH_STAR_FPS, 3),
            }
        )
    )
    print(
        f"[bench] backend={jax.default_backend()} batch={b} clip_frames={t} "
        f"step_time={dt*1000:.2f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
