"""Headline-surface int8 experiment (VERDICT r4 #2 + weak #3): measure the
ViViT classifier forward — the 10.7 ms that dominates the 12.9 ms headline
pass — under bf16 vs dynamic-int8 vs static-calibrated int8, and the full
fused preprocess+ViViT pass under the winner.

BENCH_NOTES.md names batched classification as the surface where the
measured 1.9x int8 MXU rate (microbench_int8_v2) should pay: the matmuls
are (B*S=20736, 256)x(256, {768,256,1024}) — MXU-shaped with large M.

Relay-proof timing: output-chained fori_loop (each iteration's input is
perturbed by the previous output), full-output consumption, single fetch.
Run: python scripts/profile_vivit_int8.py
"""
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

from lipreading_video_generation_tpu.core.config import ViViTConfig
from lipreading_video_generation_tpu.models.vivit import ViViT
from lipreading_video_generation_tpu.ops import quant
from lipreading_video_generation_tpu.pipelines.preprocess import (
    mouth_roi_pipeline,
)

K = 10
rng = np.random.default_rng(0)


def timed(name, fn, x, k=K):
    """Chain through the OUTPUT: the next input depends on the previous
    result (no constant-folding/hoisting — BENCH_NOTES round-4 rules)."""

    @jax.jit
    def rep(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            s = jnp.sum(out.astype(jnp.float32))
            # fold the output back into the next input (dtype-safe)
            x = (x + (s * 1e-20).astype(x.dtype)
                 if jnp.issubdtype(x.dtype, jnp.floating)
                 else jnp.bitwise_xor(x, (s.astype(jnp.int32) % 2
                                          ).astype(x.dtype)))
            return x, acc + s
        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0.0)))
        return acc

    _ = float(rep(x))
    t0 = time.perf_counter()
    _ = float(rep(x))
    total = time.perf_counter() - t0
    print(f"{name}: {total / k * 1000:.2f} ms", flush=True)
    return total / k


def main():
    cfg = ViViTConfig(num_classes=64)
    model = ViViT(cfg)
    b, t = 256, cfg.num_frames
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, t, cfg.image_size, cfg.image_size, cfg.num_channels)),
    )["params"]
    clips = jnp.asarray(rng.random(
        (b, t, cfg.image_size, cfg.image_size, cfg.num_channels), np.float32))

    # static calibration over a couple of eager batches
    scales = quant.calibrate_activation_scales(
        lambda c: model.apply({"params": params}, c),
        [(clips[: b // 2],), (clips[b // 2:],)])
    print(f"calibrated {len(scales)} module scales", flush=True)

    t_bf16 = timed("vivit fwd bf16      ", lambda c: model.apply(
        {"params": params}, c), clips)
    t_dyn = timed("vivit fwd int8 dyn  ", lambda c: quant.quantized_apply(
        model, {"params": params}, c), clips)
    t_stat = timed("vivit fwd int8 static", lambda c: quant.quantized_apply(
        model, {"params": params}, c, act_scales=scales), clips)

    # full headline pass (bench.py's one_pass) bf16 vs int8-static
    frames = jnp.asarray(rng.integers(0, 256, (b * t, 96, 96, 3),
                                      dtype=np.uint8))
    boxes = jnp.asarray(
        np.tile([8.0, 92.0, 6.0, 90.0], (b * t, 1)).astype(np.float32)
        + rng.uniform(-2, 2, (b * t, 4)).astype(np.float32))

    def one_pass(frames_u8, int8=False):
        roi = mouth_roi_pipeline(frames_u8, boxes)
        c = roi.reshape(b, t, cfg.image_size, cfg.image_size, 1)
        c = c.astype(jnp.float32) / 255.0
        if int8:
            logits = quant.quantized_apply(model, {"params": params}, c,
                                           act_scales=scales)
        else:
            logits = model.apply({"params": params}, c)
        return logits

    tp_bf16 = timed("pass bf16           ", lambda f: one_pass(f), frames)
    tp_int8 = timed("pass int8 static    ", lambda f: one_pass(f, True), frames)
    print(f"\nfwd: bf16 {t_bf16*1e3:.2f}  dyn {t_dyn*1e3:.2f}  "
          f"static {t_stat*1e3:.2f} ms  (static speedup "
          f"{t_bf16/t_stat:.2f}x)")
    print(f"pass: bf16 {tp_bf16*1e3:.2f}  int8 {tp_int8*1e3:.2f} ms  "
          f"→ {b*t/tp_int8:.0f} frames/s vs {b*t/tp_bf16:.0f}")


if __name__ == "__main__":
    main()
