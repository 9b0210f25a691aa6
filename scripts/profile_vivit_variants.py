"""Decompose the ViViT forward's 9.3 ms (b=256) into attention / matmul /
norm cost and measure candidate optimizations, with relay-proof timing
(in-jit fori_loop chaining + single host fetch).

Run: python scripts/profile_vivit_variants.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, ".jax_cache_tpu"),
    min_compile_secs=1.0,
)

from lipreading_video_generation_tpu.core.config import ViViTConfig
from lipreading_video_generation_tpu.models.vivit import ViViT
from lipreading_video_generation_tpu.ops import attention as att

K = 10
rng = np.random.default_rng(0)


def timed(name, fn, x):
    @jax.jit
    def rep(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x + acc * 1e-20)
            return x, acc + jnp.sum(out.astype(jnp.float32)) * 1e-12
        _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))
        return acc

    _ = float(rep(x))
    t0 = time.perf_counter()
    _ = float(rep(x))
    total = time.perf_counter() - t0
    print(f"{name}: {total / K * 1000:.2f} ms/op", flush=True)
    return total / K


def build(b, cfg=None):
    cfg = cfg or ViViTConfig(num_classes=64)
    model = ViViT(cfg)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size, cfg.num_channels)),
    )["params"]
    clips = jnp.asarray(
        rng.random((b, cfg.num_frames, cfg.image_size, cfg.image_size, cfg.num_channels),
                    np.float32))
    return model, params, clips


def main():
    model, params, clips = build(256)

    # A: baseline
    ta = timed("A baseline b256", lambda c: model.apply({"params": params}, c), clips)

    # B: batch 512 (per-frame rate comparison)
    model5, params5, clips512 = build(512)
    tb = timed("B baseline b512", lambda c: model5.apply({"params": params5}, c), clips512)
    print(f"   per-frame: b256 {ta*1e6/(256*5):.2f} us  b512 {tb*1e6/(512*5):.2f} us",
          flush=True)

    # C: attention -> identity (isolates everything-but-attention)
    real_mha = att.mha

    def ident_mha(q, k, v, num_heads, causal=False, use_flash=True):
        return v
    att.mha = ident_mha
    try:
        timed("C attn=identity b256", lambda c: model.apply({"params": params}, c), clips)
    finally:
        att.mha = real_mha

    # D: force the Pallas flash path (pads S 81->128, d 32->128)
    def flash_mha(q, k, v, num_heads, causal=False, use_flash=True):
        b, s, e = q.shape
        hd = e // num_heads
        split = lambda t: t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        out = att.flash_attention(split(q), split(k), split(v))
        return out.transpose(0, 2, 1, 3).reshape(b, s, e)
    att.mha = flash_mha
    try:
        timed("D attn=pallas-flash b256", lambda c: model.apply({"params": params}, c), clips)
    finally:
        att.mha = real_mha

    # E: einsum path but logits stay bf16 (half the score-matrix HBM traffic)
    def bf16_mha(q, k, v, num_heads, causal=False, use_flash=True):
        b, s, e = q.shape
        hd = e // num_heads
        qh = q.reshape(b, s, num_heads, hd)
        kh = k.reshape(b, s, num_heads, hd)
        vh = v.reshape(b, s, num_heads, hd)
        scale = 1.0 / np.sqrt(hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale  # bf16 accum
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        return out.reshape(b, s, e)
    att.mha = bf16_mha
    try:
        timed("E attn=bf16-logits b256", lambda c: model.apply({"params": params}, c), clips)
    finally:
        att.mha = real_mha

    # F: heads folded into batch for one grouped matmul pair, logits in f32
    #    but softmax fused on the (b*h, s, s) layout (fewer reshapes)
    def folded_mha(q, k, v, num_heads, causal=False, use_flash=True):
        b, s, e = q.shape
        hd = e // num_heads
        qh = q.reshape(b, s, num_heads, hd)
        kh = k.reshape(b, s, num_heads, hd)
        vh = v.reshape(b, s, num_heads, hd)
        scale = 1.0 / np.sqrt(hd)
        logits = jax.lax.dot_general(
            qh, kh, (((3,), (3,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.float32) * scale      # (b, h, s, s)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vh.dtype)
        out = jax.lax.dot_general(
            p, vh, (((3,), (1,)), ((0, 1), (0, 2))))         # (b, h, s, hd)
        return out.transpose(0, 2, 1, 3).reshape(b, s, e)
    att.mha = folded_mha
    try:
        timed("F attn=folded b256", lambda c: model.apply({"params": params}, c), clips)
    finally:
        att.mha = real_mha

    # G: block-diagonal heads — fold heads into the token axis so the whole
    #    layer is 2 large matmuls per batch element instead of 2048 tiny-K
    #    batched matmuls. Cross-head logits are computed (8x extra FLOPs,
    #    which are nearly free) and masked to -inf before softmax; the P@V
    #    matmul then has K = h*s (large, MXU-efficient) and block-diagonal P
    #    zeros kill the cross-head terms exactly.
    def blockdiag_mha(q, k, v, num_heads, causal=False, use_flash=True):
        b, s, e = q.shape
        hd = e // num_heads
        scale = 1.0 / np.sqrt(hd)
        # (b, s, h, d) -> (b, h*s, d)
        arr = lambda t: t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3).reshape(
            b, num_heads * s, hd)
        qa, ka, va = arr(q), arr(k), arr(v)
        logits = jax.lax.dot_general(
            qa, ka, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # (b, hs, hs)
        hid = jnp.arange(num_heads * s) // s
        mask = hid[:, None] == hid[None, :]
        logits = jnp.where(mask, logits, att._NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(va.dtype)
        out = jax.lax.dot_general(
            probs, va, (((2,), (1,)), ((0,), (0,))))         # (b, hs, d)
        return out.reshape(b, num_heads, s, hd).transpose(0, 2, 1, 3).reshape(b, s, e)

    att.mha = blockdiag_mha
    try:
        timed("G attn=blockdiag b256", lambda c: model.apply({"params": params}, c), clips)
    finally:
        att.mha = real_mha

    # H: block-diagonal but with bf16 logits (halves the (hs)^2 HBM traffic)
    def blockdiag_bf16_mha(q, k, v, num_heads, causal=False, use_flash=True):
        b, s, e = q.shape
        hd = e // num_heads
        scale = 1.0 / np.sqrt(hd)
        arr = lambda t: t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3).reshape(
            b, num_heads * s, hd)
        qa, ka, va = arr(q), arr(k), arr(v)
        logits = jax.lax.dot_general(
            qa, ka, (((2,), (2,)), ((0,), (0,)))) * scale    # bf16 (b, hs, hs)
        hid = jnp.arange(num_heads * s) // s
        mask = hid[:, None] == hid[None, :]
        logits = jnp.where(mask, logits.astype(jnp.float32), att._NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(va.dtype)
        out = jax.lax.dot_general(probs, va, (((2,), (1,)), ((0,), (0,))))
        return out.reshape(b, num_heads, s, hd).transpose(0, 2, 1, 3).reshape(b, s, e)

    att.mha = blockdiag_bf16_mha
    try:
        timed("H attn=blockdiag-bf16 b256",
              lambda c: model.apply({"params": params}, c), clips)
    finally:
        att.mha = real_mha


if __name__ == "__main__":
    main()
