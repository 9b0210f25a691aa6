"""Can padding the ViViT attention's token axis to MXU alignment beat the
raw S=80 einsum? (follow-up to profile_vivit_variants: attention is 4.3 ms
of the 8.9 ms forward at ~18% of FLOPs — tile-misfit, not FLOP-bound).

Variants: S padded to 96 / 128 with -inf-masked pad keys (exact numerics
for the live tokens), plus a q-padded-only variant. Output-chained timing.
Run: python scripts/profile_vivit_attn_pad.py
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
from lipreading_video_generation_tpu.ops import attention as att

K = 10
rng = np.random.default_rng(0)


def timed(name, fn, x, k=K):
    @jax.jit
    def rep(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            s = jnp.sum(out.astype(jnp.float32))
            return x + (s * 1e-20).astype(x.dtype), acc + s
        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0.0)))
        return acc

    _ = float(rep(x))
    t0 = time.perf_counter()
    _ = float(rep(x))
    total = time.perf_counter() - t0
    print(f"{name}: {total / k * 1000:.2f} ms/op", flush=True)
    return total / k


def padded_mha(s_pad):
    def f(q, k, v, num_heads, causal=False, use_flash=True):
        b, s, e = q.shape
        hd = e // num_heads
        pad = s_pad - s
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        qh = qp.reshape(b, s_pad, num_heads, hd)
        kh = kp.reshape(b, s_pad, num_heads, hd)
        vh = vp.reshape(b, s_pad, num_heads, hd)
        scale = 1.0 / np.sqrt(hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        mask = (jnp.arange(s_pad) < s)[None, None, None, :]
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        return out.reshape(b, s_pad, e)[:, :s]
    return f


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

    real = att.mha
    base = timed("A einsum S=80       ", lambda c: model.apply(
        {"params": params}, c), clips)
    for s_pad in (96, 128):
        att.mha = padded_mha(s_pad)
        try:
            timed(f"pad S={s_pad}          ",
                  lambda c: model.apply({"params": params}, c), clips)
        finally:
            att.mha = real


if __name__ == "__main__":
    main()
