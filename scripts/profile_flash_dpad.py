"""Experiment: flash forward without the d->128 lane padding at d=64
(the diffusion U-Net ds=1 shape). Compares d_pad=128 (current) vs 64,
block sweep, plus correctness check vs the einsum reference."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from bench_harness import timed_chained as timed  # the canonical harness

from lipreading_video_generation_tpu.ops import attention as att

rng = np.random.default_rng(0)


import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def flash_fwd_dpad(q, k, v, sm_scale, block_q, block_k, d_pad):
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    qp = att._pad_to(att._pad_to(q, 3, d_pad), 2, block_q).reshape(b * h, -1, d_pad)
    kp = att._pad_to(att._pad_to(k, 3, d_pad), 2, block_k).reshape(b * h, -1, d_pad)
    vp = att._pad_to(att._pad_to(v, 3, d_pad), 2, block_k).reshape(b * h, -1, d_pad)
    sq_pad, sk_pad = qp.shape[1], kp.shape[1]
    grid = (b * h, sq_pad // block_q, sk_pad // block_k)
    kernel = functools.partial(
        att._flash_kernel, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        q_len=s_q, kv_len=s_k, causal=False)
    out, lse = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi, ki: (bh, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        name=f"flash_dpad{d_pad}",
    )(qp, kp, vp)
    return out.reshape(b, h, sq_pad, d_pad)[:, :, :s_q, :d]


s, d = 16384, 64
q = jnp.asarray(rng.standard_normal((1, 1, s, d)).astype(np.float32)).astype(jnp.bfloat16)

# correctness first (small shape)
qs = jnp.asarray(rng.standard_normal((1, 1, 512, 64)).astype(np.float32))
want = att.attention_reference(qs, qs, qs, False, d ** -0.5)
got = flash_fwd_dpad(qs, qs, qs, d ** -0.5, 128, 128, 64)
err = float(jnp.max(jnp.abs(got - want)))
print(f"dpad64 correctness maxerr={err:.2e}", flush=True)

for d_pad in (128, 64):
    for bq, bk in ((512, 512), (1024, 1024), (2048, 1024), (1024, 2048), (2048, 2048)):
        try:
            timed(f"fwd s{s} dpad{d_pad} b{bq}x{bk}",
                  lambda q, carry, bq=bq, bk=bk, dp=d_pad: flash_fwd_dpad(
                      q + carry.astype(q.dtype), q, q, d ** -0.5, bq, bk, dp), q)
        except Exception as e:
            print(f"fwd s{s} dpad{d_pad} b{bq}x{bk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
