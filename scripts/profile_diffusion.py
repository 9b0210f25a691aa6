"""Profile diffusion denoise-step components on TPU (relay-proof timing)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import DiffusionConfig
from lipreading_video_generation_tpu.models.unet_audio import UNetAudio
from lipreading_video_generation_tpu.ops.attention import flash_attention
from lipreading_video_generation_tpu.pipelines import train_diffusion

K = 5
rng = np.random.default_rng(0)


def timed(name, fn, *args):
    @jax.jit
    def rep(*args):
        def body(i, carry):
            out = fn(*args, i)
            return carry + jnp.sum(out.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    _ = float(rep(*args))
    t0 = time.perf_counter()
    _ = float(rep(*args))
    print(f"{name}: {(time.perf_counter() - t0) / K * 1000:.2f} ms", flush=True)


# flash attention at the ds=1 shape (S=16384, h=4, d=16), both block configs
q = jnp.asarray(rng.standard_normal((1, 4, 16384, 16)).astype(np.float32)).astype(jnp.bfloat16)


def attn_small(q, i):
    return flash_attention(q + i * 0, q, q, block_q=128, block_k=128)


def attn_big(q, i):
    return flash_attention(q + i * 0, q, q, block_q=512, block_k=512)


def attn_1024(q, i):
    return flash_attention(q + i * 0, q, q, block_q=1024, block_k=1024)


cfg = DiffusionConfig()
state = train_diffusion.create_state(cfg, jax.random.key(0))
model = UNetAudio(cfg)
xt = jnp.asarray(rng.standard_normal((1, 128, 128, 3)).astype(np.float32))
cond_map = jnp.asarray(rng.standard_normal(
    (1, 128, 128, cfg.audio_proj_dim + cfg.im_cond_channels)).astype(np.float32))
tb = jnp.zeros((1,), jnp.int32)


def denoise(xt, i):
    return model.apply({"params": state.params}, xt + i * 0.0, cond_map, tb,
                       method=UNetAudio.denoise)


if __name__ == "__main__":
    timed("flash_16k_block128", attn_small, q)
    timed("flash_16k_block512", attn_big, q)
    timed("flash_16k_block1024", attn_1024, q)
    timed("denoise_full", denoise, xt)
