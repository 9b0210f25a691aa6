"""Stage-level TPU profiling with relay-proof timing (in-jit fori_loop
chaining + single host fetch). Run: python scripts/profile_stages.py"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import ViViTConfig
from lipreading_video_generation_tpu.models.vivit import ViViT
from lipreading_video_generation_tpu.ops import image as im
from lipreading_video_generation_tpu.pipelines.preprocess import mouth_box_from_face

N = 1280
K = 8
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.random((N, 96, 96, 3), np.float32) * 255)
boxes = jnp.asarray(np.tile([8.0, 92.0, 6.0, 90.0], (N, 1)).astype(np.float32))
gray = jnp.asarray(rng.random((N, 48, 48), np.float32) * 255)


def timed(name, fn, x):
    @jax.jit
    def rep(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x, i)
            return x, acc + jnp.sum(out.astype(jnp.float32)) * 1e-12 + acc * 1e-12
        _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))
        return acc

    _ = float(rep(x))
    t0 = time.perf_counter()
    _ = float(rep(x))
    total = time.perf_counter() - t0
    print(f"{name}: {total / K * 1000:.2f} ms/op", flush=True)


def crop_stage(f, i):
    mouth = jax.vmap(mouth_box_from_face)(boxes + i * 0.0)
    return jax.vmap(lambda fr, bx: im.crop_and_resize(fr, bx, (48, 48)))(f, mouth)


def clahe_stage(x, i):
    return im.clahe(jnp.clip(x + i, 0, 255))


def gray_stage(f, i):
    return im.rgb_to_gray(f + i * 0.0)


def resize_stage(x, i):
    return im.resize((x + i * 0.0)[..., None], (32, 32), "bilinear")


cfg = ViViTConfig(num_classes=64)
model = ViViT(cfg)
params = model.init(jax.random.key(0), jnp.zeros((1, 5, 32, 32, 1)))["params"]
clips = jnp.asarray(rng.random((256, 5, 32, 32, 1), np.float32))


def vivit_stage(x, i):
    return model.apply({"params": params}, x + i * 0.0)


if __name__ == "__main__":
    timed("crop_resize", crop_stage, frames)
    timed("clahe", clahe_stage, gray)
    timed("rgb_to_gray", gray_stage, frames)
    timed("resize_32", resize_stage, gray)
    timed("vivit_fwd_b256", vivit_stage, clips)
