"""CLAHE kernel on-device check: Pallas-vs-XLA numerics on the real TPU
plus relay-proof timing of both paths at the bench shape (1280 × 48×48).

Run: python scripts/profile_clahe.py
"""
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

from lipreading_video_generation_tpu.ops import image as im
from lipreading_video_generation_tpu.ops.clahe_pallas import clahe_pallas

N = 1280
K = 8
rng = np.random.default_rng(0)
gray = jnp.asarray(rng.random((N, 48, 48), np.float32) * 255)


def timed(name, fn, x):
    @jax.jit
    def rep(x):
        def body(i, carry):
            x, acc = carry
            out = fn(jnp.clip(x + i, 0, 255))
            return x, acc + jnp.sum(out.astype(jnp.float32)) * 1e-12 + acc * 1e-12
        _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))
        return acc

    _ = float(rep(x))
    t0 = time.perf_counter()
    _ = float(rep(x))
    total = time.perf_counter() - t0
    print(f"{name}: {total / K * 1000:.2f} ms/op", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    # numerics: both paths on device, small batch
    x = gray[:4]
    a = np.asarray(jax.jit(lambda v: clahe_pallas(v, 0.2, (8, 8)))(x))
    b = np.asarray(jax.jit(lambda v: im.clahe_xla(v, 0.2, (8, 8)))(x))
    d = np.abs(a - b)
    print(f"pallas-vs-xla on device: max {d.max():.3f} mean {d.mean():.4f}",
          flush=True)
    assert d.max() <= 2.5, d.max()

    timed("clahe_xla  (1280x48x48)", lambda v: im.clahe_xla(v, 0.2, (8, 8)), gray)
    timed("clahe_pallas(1280x48x48)", lambda v: clahe_pallas(v, 0.2, (8, 8)), gray)


if __name__ == "__main__":
    main()
