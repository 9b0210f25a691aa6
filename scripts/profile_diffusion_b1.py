"""Round-4 b1-latency hunt: time the production denoise step and its
attention at the REAL shapes (num_heads=1 -> (1, 1, S, 64)), plus flash
variants (block sizes, d-padding policy) to find the 100-steps/s path.
Relay-proof: K reps chained in one jit, one host fetch."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from bench_harness import timed_chained as timed  # the canonical harness

from lipreading_video_generation_tpu.core.config import DiffusionConfig
from lipreading_video_generation_tpu.models.unet_audio import UNetAudio
from lipreading_video_generation_tpu.ops import attention as att
from lipreading_video_generation_tpu.pipelines import train_diffusion

rng = np.random.default_rng(0)


# ---- attention at the three production shapes (bf16, like the model) ----
for s, c in ((16384, 64), (4096, 128), (1024, 256)):
    q = jnp.asarray(rng.standard_normal((1, 1, s, c)).astype(np.float32)).astype(jnp.bfloat16)
    for bq, bk in ((128, 128), (256, 256), (512, 512), (1024, 1024), (2048, 512)):
        if bq <= s:
            timed(f"flash s{s} d{c} b{bq}x{bk}",
                  lambda q, carry, bq=bq, bk=bk, c=c: att._flash(
                      q + carry.astype(q.dtype), q, q, False, c ** -0.5,
                      bq, bk, False), q)
    timed(f"xla_blockwise s{s} d{c} blk2048",
          lambda q, carry, c=c: att._blockwise_attention_xla(
              q + carry.astype(q.dtype), q, q, False, c ** -0.5, 2048), q)
    if s * s <= 4096 * 4096:
        timed(f"dense_ref s{s} d{c}",
              lambda q, carry: att.attention_reference(
                  q + carry.astype(q.dtype), q, q, False), q)

# ---- full denoise step ----
cfg = DiffusionConfig()
state = train_diffusion.create_state(cfg, jax.random.key(0))
model = UNetAudio(cfg)
xt = jnp.asarray(rng.standard_normal((1, 128, 128, 3)).astype(np.float32))
cond_map = jnp.asarray(rng.standard_normal(
    (1, 128, 128, cfg.audio_proj_dim + cfg.im_cond_channels)).astype(np.float32))
tb = jnp.zeros((1,), jnp.int32)


def denoise(xt, carry):
    return model.apply({"params": state.params}, xt + carry, cond_map, tb,
                       method=UNetAudio.denoise)


timed("denoise_full_b1", denoise, xt)
