"""Round-4 b1-latency hunt: time the production denoise step and its
attention at the REAL shapes (num_heads=1 -> (1, 1, S, 64)), plus flash
variants (block sizes, d-padding policy) to find the 100-steps/s path.
Relay-proof: K reps chained in one jit, one host fetch."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import DiffusionConfig
from lipreading_video_generation_tpu.models.unet_audio import UNetAudio
from lipreading_video_generation_tpu.ops import attention as att
from lipreading_video_generation_tpu.pipelines import train_diffusion

K1, K2 = 4, 24
rng = np.random.default_rng(0)


def timed(name, fn, *args):
    """Two-K differencing: time K1 and K2 in-jit reps and report
    (t2 - t1)/(K2 - K1) — cancels the fixed dispatch/RTT cost that made a
    single-K measurement read ~2.5 ms for every shape regardless of FLOPs."""
    def make(K):
        @jax.jit
        def rep(karg, *args):
            # TRUE chaining: the op's own output perturbs its next input —
            # `x + i*0` constant-folds and XLA hoists the whole op out of
            # the loop (measured: flat times across K before this fix).
            def body(i, carry):
                out = fn(*args, carry)
                return carry * 0.5 + jnp.max(jnp.abs(out.astype(jnp.float32))) * 1e-9
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0) + karg * 0.0)
        return rep

    r1, r2 = make(K1), make(K2)
    _ = float(r1(jnp.int32(0), *args)); _ = float(r2(jnp.int32(0), *args))
    ts = []
    for rep, K in ((r1, K1), (r2, K2)):
        best = 1e9
        for it in range(3):
            t0 = time.perf_counter()
            _ = float(rep(jnp.int32(it + 1), *args))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    dt = (ts[1] - ts[0]) / (K2 - K1) * 1000
    print(f"{name}: {dt:.3f} ms  (t{K1}={ts[0]*1e3:.1f} t{K2}={ts[1]*1e3:.1f})",
          flush=True)
    return dt


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
