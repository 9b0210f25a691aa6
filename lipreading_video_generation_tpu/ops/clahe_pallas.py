"""CLAHE as a single-pass Pallas TPU kernel.

Reference behavior: OpenCV ``createCLAHE`` as used by
lipreading/preprocess.py:17-34 (clipLimit on the L channel, 8×8 tile
grid) — the contrast boost every mouth-ROI frame goes through
(lipreading/get_data.py:37-49).

Why a kernel: the XLA formulation in ``ops/image.clahe`` is gather-free
but materializes two (B, H, W, nbins) tensors in HBM — the one-hot used
for the per-tile histograms and the bilinearly-upsampled per-pixel LUT.
At the bench shape (1280 frames of 48×48, 256 bins) that is ~3 GB of
HBM traffic per pass, which made CLAHE the most expensive stage of the
fused preprocess pipeline (~7.9 ms of a ~15 ms pass). Here the one-hot
never leaves VMEM: per image the kernel reads H·W floats and writes H·W
floats — everything else stays on-chip.

Schedule (per grid step = one image, all in VMEM):
1. one-hot of the rounded pixel values, (H·W, nbins) bf16 (0/1 exact);
2. per-tile histograms as ONE matmul against a constant tile-membership
   matrix: ``hist = tilesel (T, H·W) @ onehot (H·W, nbins)`` — exact in
   bf16×bf16→f32 (counts < 2^24);
3. OpenCV clip-and-redistribute (limit = max(1, clip·area/nbins)) and
   the CDF as a matmul with an upper-triangular ones matrix (f32, exact);
4. per-pixel blended LUT as ONE matmul against a constant bilinear
   corner-weight matrix: ``M = W (H·W, T) @ lut (T, nbins)`` — W holds
   the half-pixel-center, edge-clamped tile-interpolation weights, the
   exact weighting ``jax.image.resize(..., 'linear')`` applies in the
   XLA path (and OpenCV's tile-center interpolation);
5. evaluate each pixel's own LUT entry with the one-hot mask:
   ``out = Σ_b where(onehot, M, 0)`` — a lane reduce, no gathers.

MXU work is the two (H·W × T × nbins) matmuls (~75 MFLOP per 48×48
image); the VPU work is the compare/select/reduce over H·W·nbins lanes.

Numerics: histograms/CDF/LUT are exact; the blend matmul runs in bf16,
so blended values carry ≤0.5 gray-level quantization — the same
tolerance class as the XLA path's bf16 LUT upsample (both feed learned
models downstream; tolerance parity is the spec, see ops/image.py:11).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["clahe_pallas", "clahe_supported"]

# per-program VMEM for the one-hot + blended-LUT intermediates must fit;
# above this pixel count the caller should use the XLA path. The boundary
# is hardware-verified UNDER JIT — the representative context, since the
# production pipeline always runs CLAHE inside a fused jitted program:
# 112×112 (= 12544 px) compiles and matches the XLA path on a real v5e
# (scripts/check_tpu_kernels.py gates it); 128×128 passes only as a
# standalone eager dispatch (operands stay in HBM) and OOMs scoped VMEM
# by ~4.4 MB when XLA fuses the operands into the kernel's scoped
# allocation under jit. Product shapes are far smaller (48×48 = 2304 px).
_MAX_PIXELS = 12544


def clahe_supported(h: int, w: int, grid: Tuple[int, int], nbins: int = 256) -> bool:
    """True if the Pallas kernel handles this shape (VMEM budget + lane
    alignment: nbins must be a lane multiple)."""
    gh, gw = grid
    th, tw = -(-h // gh), -(-w // gw)
    return (th * gh) * (tw * gw) <= _MAX_PIXELS and nbins % 128 == 0


def _linear_resize_weights(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) weights of ``jax.image.resize(..., 'linear')`` for
    upsampling: half-pixel centers, edge clamp, triangle kernel."""
    out = np.zeros((n_out, n_in), np.float32)
    for y in range(n_out):
        src = (y + 0.5) * n_in / n_out - 0.5
        i0 = int(np.floor(src))
        f = src - i0
        out[y, min(max(i0, 0), n_in - 1)] += 1.0 - f
        out[y, min(max(i0 + 1, 0), n_in - 1)] += f
    return out


@functools.lru_cache(maxsize=16)
def _constants(hp: int, wp: int, gh: int, gw: int) -> Tuple[np.ndarray, np.ndarray]:
    """(tilesel (gh·gw, hp·wp), blend W (hp·wp, gh·gw)) — image-independent."""
    th, tw = hp // gh, wp // gw
    ys = np.arange(hp) // th                                  # tile row per pixel row
    xs = np.arange(wp) // tw
    tile = (ys[:, None] * gw + xs[None, :]).reshape(-1)       # (hp·wp,)
    tilesel = np.zeros((gh * gw, hp * wp), np.float32)
    tilesel[tile, np.arange(hp * wp)] = 1.0
    ay = _linear_resize_weights(hp, gh)                       # (hp, gh)
    bx = _linear_resize_weights(wp, gw)                       # (wp, gw)
    w = np.einsum("yi,xj->yxij", ay, bx).reshape(hp * wp, gh * gw)
    return tilesel.astype(np.float32), w.astype(np.float32)


def _kernel(img_ref, tilesel_ref, w_ref, out_ref, *, hp, wp, gh, gw, nbins,
            clip_limit):
    x = img_ref[0]                                            # (hp, wp) f32
    vals = jnp.clip(jnp.round(x), 0, nbins - 1)
    # Mosaic's tpu.iota only produces integers — a float iota verifies in
    # interpret mode but fails real-TPU lowering, so iota int32 then cast
    bins3 = jax.lax.broadcasted_iota(
        jnp.int32, (hp, wp, nbins), 2).astype(jnp.float32)
    mask3 = vals[:, :, None] == bins3                         # (hp, wp, nbins)
    onehot = mask3.astype(jnp.bfloat16).reshape(hp * wp, nbins)

    # per-tile histograms: exact bf16×bf16→f32 matmul (0/1 operands).
    # Precision pinned DEFAULT: a global jax_default_matmul_precision=
    # "highest" would request an fp32 contract on bf16 operands, which
    # Mosaic rejects ("Bad lhs type") — and buys nothing here, the
    # operands are exact 0/1 and the f32 accumulator already is exact.
    hist = jnp.dot(tilesel_ref[:], onehot, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)

    tile_area = (hp // gh) * (wp // gw)
    limit = max(1.0, clip_limit * tile_area / nbins)          # python float: static
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
    clipped = clipped + excess / nbins

    # CDF via upper-triangular ones matmul (f32 exact: counts < 2^24)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nbins, nbins), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nbins, nbins), 1)
    tri = (rows <= cols).astype(jnp.float32)
    cdf = jnp.dot(clipped, tri, preferred_element_type=jnp.float32)
    lut = jnp.clip(jnp.round(cdf * (nbins - 1) / tile_area), 0, nbins - 1)

    # per-pixel blended LUT: one matmul against the bilinear corner weights
    # (precision pinned for the same Mosaic bf16 constraint as above)
    m = jnp.dot(w_ref[:], lut.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)          # (hp·wp, nbins)
    out = jnp.sum(jnp.where(mask3, m.reshape(hp, wp, nbins), 0.0), axis=-1)
    out_ref[0] = out


def clahe_pallas(
    img: jax.Array,
    clip_limit: float = 0.2,
    grid: Tuple[int, int] = (8, 8),
    nbins: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in for ``ops/image.clahe`` on shapes where
    ``clahe_supported`` holds: (..., H, W) uint8/float [0, 255] → same
    shape/dtype, contrast-limited adaptive histogram equalization."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gh, gw = grid
    x = img.astype(jnp.float32)
    H, W = x.shape[-2], x.shape[-1]
    th, tw = -(-H // gh), -(-W // gw)
    pad_h, pad_w = th * gh - H, tw * gw - W
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, pad_h), (0, pad_w)], mode="edge")
    hp, wp = th * gh, tw * gw

    lead = xp.shape[:-2]
    b = int(np.prod(lead)) if lead else 1
    xb = xp.reshape(b, hp, wp)

    tilesel_np, w_np = _constants(hp, wp, gh, gw)
    tilesel = jnp.asarray(tilesel_np, jnp.bfloat16)
    wmat = jnp.asarray(w_np, jnp.bfloat16)

    kern = functools.partial(_kernel, hp=hp, wp=wp, gh=gh, gw=gw, nbins=nbins,
                             clip_limit=float(clip_limit))
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gh * gw, hp * wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp * wp, gh * gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (2 * hp * wp * gh * gw * nbins + nbins * nbins * gh * gw),
            bytes_accessed=b * hp * wp * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xb, tilesel, wmat)

    out = out.reshape(lead + (hp, wp))[..., :H, :W]
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out
