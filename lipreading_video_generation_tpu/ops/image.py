"""Batched on-device image ops — the OpenCV replacement for the compute path.

The reference does all frame preprocessing with per-frame cv2 calls on host
(lipreading/preprocess.py, lipreading/get_data.py:37-49,
gan-model/preprocessing/dataset.py:121-168, gan-model/inference.py:61-68).
Here every op is a jittable, vmap/batch-friendly JAX function over
``(..., H, W, C)`` float32 (or uint8) tensors, so an entire clip (or a whole
batch of clips) is one fused XLA program on TPU.

Parity is tolerance-based, not bit-exact (SURVEY.md §7 "hard parts" #2):
resize/CLAHE feed learned models, so downstream-accuracy parity is the spec.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize",
    "resize_batch",
    "normalize_uint8",
    "denormalize_to_uint8",
    "rgb_to_gray",
    "bgr_to_gray",
    "mask_lower_half",
    "concat_reference",
    "crop_and_resize",
    "center_crop",
    "random_crop",
    "rgb_to_lab",
    "lab_to_rgb",
    "clahe",
    "clahe_xla",
    "contrast_boost",
    "canny_edges",
    "lucas_kanade_flow",
    "smooth_boxes",
    "expand_box_to_min_size",
]


# ---------------------------------------------------------------------------
# Resize / normalize
# ---------------------------------------------------------------------------

def resize(img: jax.Array, size: Tuple[int, int], method: str = "bilinear") -> jax.Array:
    """Resize (..., H, W, C) → (..., h, w, C).

    ``method``: 'bilinear' | 'cubic' | 'nearest'. Replaces cv2.resize at
    get_data.py:45 (INTER_CUBIC → 'cubic') and dataset.py:121 (default
    INTER_LINEAR → 'bilinear'). jax.image.resize uses half-pixel centers,
    same convention as OpenCV.
    """
    h, w = size
    out_shape = img.shape[:-3] + (h, w, img.shape[-1])
    dtype = img.dtype
    x = img.astype(jnp.float32)
    out = jax.image.resize(x, out_shape, method=method)
    if jnp.issubdtype(dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(dtype)


def resize_batch(imgs: jax.Array, size: Tuple[int, int], method: str = "bilinear") -> jax.Array:
    return resize(imgs, size, method)


def normalize_uint8(img: jax.Array, symmetric: bool = False) -> jax.Array:
    """uint8 [0,255] → float32 [0,1] (dataset.py:121 ``/255.``) or [-1,1]
    (video-generation/diffusion/train.py:70-75 Normalize(0.5,0.5))."""
    x = img.astype(jnp.float32) / 255.0
    return x * 2.0 - 1.0 if symmetric else x


def denormalize_to_uint8(x: jax.Array, symmetric: bool = False) -> jax.Array:
    if symmetric:
        x = (x + 1.0) / 2.0
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma; (..., H, W, 3) → (..., H, W, 1)."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=jnp.float32)
    g = jnp.tensordot(img.astype(jnp.float32), w, axes=[[-1], [0]])
    return g[..., None]


def bgr_to_gray(img: jax.Array) -> jax.Array:
    """BGR-ordered luma, matching gan-model/avhubert_utils.py:333-335."""
    w = jnp.asarray([0.114, 0.587, 0.299], dtype=jnp.float32)
    g = jnp.tensordot(img.astype(jnp.float32), w, axes=[[-1], [0]])
    return g[..., None]


# ---------------------------------------------------------------------------
# GAN window ops (dataset.py:157-168, inference.py:123-156)
# ---------------------------------------------------------------------------

def apply_mask(frames: jax.Array, mask: jax.Array) -> jax.Array:
    """Elementwise mask of frames by a (H, W) {0,255}/bool mask — the
    cv2.bitwise_and ``mask_frames`` utility (lipreading/preprocess.py:
    154-162), batched over any leading dims."""
    m = (mask > 0).astype(frames.dtype)
    return frames * m[..., None]


def mask_lower_half(img: jax.Array) -> jax.Array:
    """Zero the lower half (rows >= H/2) of (..., H, W, C) frames — the
    masked target window fed to the generator (dataset.py:160-162)."""
    h = img.shape[-3]
    row = jnp.arange(h)[:, None, None]
    return jnp.where(row < h // 2, img, jnp.zeros_like(img))


def concat_reference(masked: jax.Array, reference: jax.Array) -> jax.Array:
    """Channel-concat masked target window with the reference ("wrong")
    window → 6-channel generator input (dataset.py:163-168)."""
    return jnp.concatenate([masked, reference], axis=-1)


# ---------------------------------------------------------------------------
# Cropping
# ---------------------------------------------------------------------------

def crop_and_resize(
    img: jax.Array,
    box: jax.Array,
    out_size: Tuple[int, int],
    method: str = "linear",
) -> jax.Array:
    """Crop (y1, y2, x1, x2) from (H, W, C) and resize to out_size.

    Jit-safe with traced boxes — the TPU-native form of cv2 crop+resize
    used all over inference.py:123-131. Implemented with
    ``jax.image.scale_and_translate``, whose separable interpolation lowers
    to two small matmuls (MXU) instead of per-pixel gathers; out-of-image
    samples clamp to the edge. ``method``: 'linear' | 'cubic'.
    """
    method = {"bilinear": "linear", "bicubic": "cubic"}.get(method, method)
    y1, y2, x1, x2 = box[0], box[1], box[2], box[3]
    oh, ow = out_size
    x = img.astype(jnp.float32)
    # pixel-center mapping: out center o+0.5 ↦ in y1 + (o+0.5)(y2-y1)/oh;
    # scale_and_translate maps in coord i to out i*scale + translation.
    sy = oh / jnp.maximum(y2 - y1, 1e-3)
    sx = ow / jnp.maximum(x2 - x1, 1e-3)
    return jax.image.scale_and_translate(
        x,
        (oh, ow) + x.shape[2:],
        (0, 1),
        jnp.stack([sy, sx]),
        jnp.stack([-y1 * sy, -x1 * sx]),
        method=method,
        antialias=False,
    )


def _bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample (H, W, C) at the outer product of ys × xs with zero padding.

    Separable MXU form: the bilinear weight of input row i at sample
    coordinate y is the triangle max(0, 1 − |y − i|) — zero outside the
    image, which reproduces zero padding exactly — so the whole
    outer-product sampling is two small dense matmuls instead of four
    per-pixel gathers. TPU gathers serialize on the scalar unit; the
    gather form made serving paste-back (inference.py emb_roi2im analog)
    ~1000× slower than the matmuls.
    """
    H, W = img.shape[-3], img.shape[-2]
    x = img.astype(jnp.float32)
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(ys[:, None] - jnp.arange(H, dtype=jnp.float32)[None, :]))
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(xs[:, None] - jnp.arange(W, dtype=jnp.float32)[None, :]))
    hi = jnp.einsum("mh,hwc->mwc", wy, x, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("nw,mwc->mnc", wx, hi, precision=jax.lax.Precision.HIGHEST)


def center_crop(img: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Static center crop (..., H, W, C) → (..., h, w, C)
    (avhubert_utils.py:327-330 CenterCrop(88,88))."""
    h, w = size
    H, W = img.shape[-3], img.shape[-2]
    top = (H - h) // 2
    left = (W - w) // 2
    return img[..., top : top + h, left : left + w, :]


def random_crop(key: jax.Array, img: jax.Array, size: int) -> jax.Array:
    """PRNG-keyed random square crop (preprocess.py:166-177)."""
    H, W = img.shape[-3], img.shape[-2]
    ky, kx = jax.random.split(key)
    y = jax.random.randint(ky, (), 0, H - size + 1)
    x = jax.random.randint(kx, (), 0, W - size + 1)
    start = [0] * (img.ndim - 3) + [y, x, 0]
    sizes = list(img.shape[:-3]) + [size, size, img.shape[-1]]
    return jax.lax.dynamic_slice(img, start, sizes)


def expand_box_to_min_size(box: jax.Array, min_h: int = 48, min_w: int = 48) -> jax.Array:
    """Symmetrically expand (y1, y2, x1, x2) to at least (min_h, min_w),
    matching lipreading/preprocess.py:70-78's lip-bbox expansion."""
    y1, y2, x1, x2 = box[0], box[1], box[2], box[3]
    hd = jnp.maximum(0, min_h - (y2 - y1 + 1))
    wd = jnp.maximum(0, min_w - (x2 - x1 + 1))
    y1 = y1 - hd // 2
    y2 = y2 + (hd + 1) // 2
    x1 = x1 - wd // 2
    x2 = x2 + (wd + 1) // 2
    return jnp.stack([y1, y2, x1, x2])


# ---------------------------------------------------------------------------
# LAB color space (for CLAHE contrast boost; preprocess.py:17-34)
# ---------------------------------------------------------------------------

_RGB2XYZ = np.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]],
    dtype=np.float32,
)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ).astype(np.float32)
_D65 = np.array([0.950456, 1.0, 1.088754], dtype=np.float32)


def _lab_f(t: jax.Array) -> jax.Array:
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _lab_f_inv(t: jax.Array) -> jax.Array:
    return jnp.where(t > 0.206893, t**3, (t - 16.0 / 116.0) / 7.787)


def _srgb_to_linear(c: jax.Array) -> jax.Array:
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _linear_to_srgb(c: jax.Array) -> jax.Array:
    c = jnp.maximum(c, 0.0)
    return jnp.where(c > 0.0031308, 1.055 * c ** (1.0 / 2.4) - 0.055, 12.92 * c)


def rgb_to_lab(img: jax.Array) -> jax.Array:
    """RGB uint8/float [0,255] → OpenCV-8U-scaled LAB (L,a,b in [0,255]).

    Includes the sRGB linearization OpenCV applies before the XYZ matrix.
    """
    rgb = _srgb_to_linear(img.astype(jnp.float32) / 255.0)
    xyz = jnp.einsum("ij,...j->...i", jnp.asarray(_RGB2XYZ), rgb) / jnp.asarray(_D65)
    f = _lab_f(xyz)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    # OpenCV 8-bit scaling: L*255/100, a+128, b+128
    return jnp.stack([L * 255.0 / 100.0, a + 128.0, b + 128.0], axis=-1)


def lab_to_rgb(lab: jax.Array) -> jax.Array:
    L = lab[..., 0] * 100.0 / 255.0
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_f_inv(fx), _lab_f_inv(fy), _lab_f_inv(fz)], axis=-1)
    xyz = xyz * jnp.asarray(_D65)
    rgb = jnp.einsum("ij,...j->...i", jnp.asarray(_XYZ2RGB), xyz)
    return jnp.clip(_linear_to_srgb(rgb) * 255.0, 0.0, 255.0)


# ---------------------------------------------------------------------------
# CLAHE (preprocess.py:17-34: clipLimit=0.2, tileGridSize=(8,8) on L channel)
# ---------------------------------------------------------------------------

def clahe(
    img: jax.Array,
    clip_limit: float = 0.2,
    grid: Tuple[int, int] = (8, 8),
    nbins: int = 256,
) -> jax.Array:
    """Contrast-limited adaptive histogram equalization on (..., H, W) uint8/
    float [0,255] single-channel images.

    True CLAHE, TPU-style. On TPU, supported shapes route to the fused
    Pallas kernel (ops/clahe_pallas.py) — same math, but the
    (..., H, W, nbins) intermediates stay in VMEM instead of costing
    ~3 GB of HBM traffic per 1280-frame pass. Everything else takes the
    XLA reference path (``clahe_xla``).
    """
    from .clahe_pallas import clahe_pallas, clahe_supported

    if jax.default_backend() == "tpu" and clahe_supported(
        img.shape[-2], img.shape[-1], grid, nbins
    ):
        return clahe_pallas(img, clip_limit, grid, nbins)
    return clahe_xla(img, clip_limit, grid, nbins)


def clahe_xla(
    img: jax.Array,
    clip_limit: float = 0.2,
    grid: Tuple[int, int] = (8, 8),
    nbins: int = 256,
) -> jax.Array:
    """XLA reference CLAHE: per-tile 256-bin histograms are one-hot matmuls
    (MXU-friendly), clip-and-redistribute matches OpenCV (limit =
    max(1, clip_limit*tile_area/nbins)), per-tile CDF LUTs are cumsums, and
    each output pixel bilinearly interpolates the 4 neighboring tile LUTs.
    """
    gh, gw = grid
    x = img.astype(jnp.float32)
    H, W = x.shape[-2], x.shape[-1]
    # pad to tile multiples (OpenCV pads with edge replication)
    th = -(-H // gh)
    tw = -(-W // gw)
    pad_h = th * gh - H
    pad_w = tw * gw - W
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, pad_h), (0, pad_w)], mode="edge")
    Hp, Wp = th * gh, tw * gw

    lead = xp.shape[:-2]
    tiles = xp.reshape(lead + (gh, th, gw, tw))
    tiles = jnp.swapaxes(tiles, -3, -2)  # (..., gh, gw, th, tw)
    flat = tiles.reshape(lead + (gh, gw, th * tw))

    bins = jnp.clip(jnp.round(flat), 0, nbins - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(bins, nbins, dtype=jnp.float32)
    hist = onehot.sum(axis=-2)  # (..., gh, gw, nbins)

    tile_area = th * tw
    limit = jnp.maximum(1.0, clip_limit * tile_area / nbins)
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(axis=-1, keepdims=True)
    clipped = clipped + excess / nbins

    cdf = jnp.cumsum(clipped, axis=-1)
    # OpenCV LUT: round((cdf - 0) * (nbins-1) / tile_area) — scale by area
    lut = jnp.clip(jnp.round(cdf * (nbins - 1) / tile_area), 0, nbins - 1)

    # Gather-free interpolation: out[p] = Σ_corner w_c · LUT[tile_c, pix_p]
    #                                  = BlendedLUT[p, pix_p]
    # where BlendedLUT = bilinear upsample of the (gh, gw, nbins) LUT grid
    # to (Hp, Wp, nbins). jax.image.resize('linear') uses half-pixel centers
    # with edge clamp — exactly the tile-center weighting OpenCV uses — and
    # lowers to two small matmuls. The final evaluation at each pixel's own
    # value is a fused compare-select-reduce, no gathers.
    bflat = int(np.prod(lead)) if lead else 1
    lut_b = lut.reshape(bflat, gh, gw, nbins).astype(jnp.bfloat16)
    m = jax.image.resize(lut_b, (bflat, Hp, Wp, nbins), method="linear")
    pix = jnp.clip(jnp.round(xp), 0, nbins - 1).astype(jnp.int32).reshape(bflat, Hp, Wp)
    bins_iota = jnp.arange(nbins, dtype=jnp.int32)
    out = jnp.sum(
        jnp.where(pix[..., None] == bins_iota, m, jnp.bfloat16(0)).astype(jnp.float32),
        axis=-1,
    )
    out = out.reshape(lead + (Hp, Wp))[..., :H, :W]
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out


def contrast_boost(
    img: jax.Array, clip_limit: float = 0.2, grid: Tuple[int, int] = (8, 8)
) -> jax.Array:
    """CLAHE on the LAB L-channel of RGB frames — equivalent of
    lipreading/preprocess.py:17-34 (which is BGR; channel order is the
    caller's contract here, we take RGB)."""
    lab = rgb_to_lab(img)
    L = clahe(lab[..., 0], clip_limit, grid)
    lab = jnp.stack([L, lab[..., 1], lab[..., 2]], axis=-1)
    out = lab_to_rgb(lab)
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out


# ---------------------------------------------------------------------------
# Canny edges (preprocess.py:89-96: thresholds 200, 400)
# ---------------------------------------------------------------------------

def _sobel(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=jnp.float32)
    ky = kx.T
    # edge-replicate padding, matching cv2's BORDER_REPLICATE for Sobel
    xp = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)], mode="edge")

    def conv(k):
        return jax.lax.conv_general_dilated(
            xp.reshape((-1, 1) + xp.shape[-2:]),
            k[None, None],
            window_strides=(1, 1),
            padding="VALID",
        ).reshape(img.shape)

    return conv(kx), conv(ky)


def canny_edges(
    img: jax.Array, low: float = 200.0, high: float = 400.0, hysteresis_iters: int = 8
) -> jax.Array:
    """Canny edge map over (..., H, W) grayscale [0,255].

    Sobel gradients → quantized-direction non-max suppression → double
    threshold → hysteresis as a fixed number of masked-dilation steps
    (static loop; XLA-friendly). Returns {0,255} uint8 like cv2.Canny.
    """
    x = img.astype(jnp.float32)
    gx, gy = _sobel(x)
    mag = jnp.abs(gx) + jnp.abs(gy)  # cv2 default L1 norm
    ang = jnp.arctan2(gy, gx)

    # Quantize direction into 4 sectors, pick neighbors for NMS
    a = jnp.mod(ang, np.pi)
    sector = jnp.floor((a + np.pi / 8) / (np.pi / 4)).astype(jnp.int32) % 4

    def shift(arr, dy, dx):
        return jnp.roll(jnp.roll(arr, dy, axis=-2), dx, axis=-1)

    n0a, n0b = shift(mag, 0, 1), shift(mag, 0, -1)      # horizontal gradient
    n1a, n1b = shift(mag, 1, 1), shift(mag, -1, -1)     # 45°
    n2a, n2b = shift(mag, 1, 0), shift(mag, -1, 0)      # vertical
    n3a, n3b = shift(mag, 1, -1), shift(mag, -1, 1)     # 135°
    na = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3], [n0a, n1a, n2a, n3a])
    nb = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3], [n0b, n1b, n2b, n3b])
    is_max = (mag >= na) & (mag >= nb)
    mag = jnp.where(is_max, mag, 0.0)

    strong = mag >= high
    weak = (mag >= low) & ~strong

    def dilate(m):
        out = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = out | shift(m, dy, dx)
        return out

    edges = strong
    for _ in range(hysteresis_iters):
        edges = edges | (dilate(edges) & weak)
    return (edges * 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Lucas-Kanade optical flow (preprocess.py:99-149: win 5x5, 2 pyramid levels)
# ---------------------------------------------------------------------------

def lucas_kanade_flow(
    prev: jax.Array,
    curr: jax.Array,
    points: jax.Array,
    win: int = 5,
    levels: int = 2,
    iters: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Pyramidal LK point tracking.

    prev/curr: (H, W) grayscale float; points: (N, 2) (x, y) float.
    Returns (new_points (N,2), status (N,) bool). Batched over points via
    vmap; pyramid levels are average-pooled halvings. The cv2 analog is
    calcOpticalFlowPyrLK at preprocess.py:127.
    """
    prev = prev.astype(jnp.float32)
    curr = curr.astype(jnp.float32)

    def pool(img):
        return jax.lax.reduce_window(img, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID") / 4.0

    pyr_prev = [prev]
    pyr_curr = [curr]
    for _ in range(levels):
        pyr_prev.append(pool(pyr_prev[-1]))
        pyr_curr.append(pool(pyr_curr[-1]))

    half = win // 2
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-half, half + 1), jnp.arange(-half, half + 1), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2).astype(jnp.float32)  # (win*win, 2) as (dy, dx)

    def sample(img, ys, xs):
        return _bilinear_sample(img[..., None], ys, xs)[..., 0]

    def sample_patch(img, cy, cx):
        ys = cy + offs[:, 0]
        xs = cx + offs[:, 1]
        # per-point scattered sampling (not an outer product): gather each
        H, W = img.shape
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        wy = ys - y0
        wx = xs - x0

        def g(yi, xi):
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            return img[yc, xc]

        return (g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x0 + 1) * (1 - wy) * wx
                + g(y0 + 1, x0) * wy * (1 - wx) + g(y0 + 1, x0 + 1) * wy * wx)

    def track_one(pt):
        g = jnp.zeros(2)  # accumulated flow (x, y), at finest-level scale
        for lvl in range(levels, -1, -1):
            scale = 2.0 ** lvl
            ip = pyr_prev[lvl]
            ic = pyr_curr[lvl]
            cx = pt[0] / scale
            cy = pt[1] / scale
            p = sample_patch(ip, cy, cx)
            ix = (sample_patch(ip, cy, cx + 1.0) - sample_patch(ip, cy, cx - 1.0)) / 2.0
            iy = (sample_patch(ip, cy + 1.0, cx) - sample_patch(ip, cy - 1.0, cx)) / 2.0
            A = jnp.stack([jnp.stack([jnp.sum(ix * ix), jnp.sum(ix * iy)]),
                           jnp.stack([jnp.sum(ix * iy), jnp.sum(iy * iy)])])
            Ainv = jnp.linalg.inv(A + 1e-6 * jnp.eye(2))

            gl = g / scale

            def body(_, gl):
                c = sample_patch(ic, cy + gl[1], cx + gl[0])
                diff = p - c
                b = jnp.stack([jnp.sum(diff * ix), jnp.sum(diff * iy)])
                return gl + Ainv @ b

            gl = jax.lax.fori_loop(0, iters, body, gl)
            g = gl * scale
        new_pt = pt + g
        H, W = prev.shape
        ok = (new_pt[0] >= 0) & (new_pt[0] < W) & (new_pt[1] >= 0) & (new_pt[1] < H)
        return new_pt, ok

    return jax.vmap(track_one)(points.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Box smoothing (gan-model/inference.py:61-68)
# ---------------------------------------------------------------------------

def smooth_boxes(boxes: jax.Array, T: int = 5) -> jax.Array:
    """Temporal moving average of (N, 4) face boxes with the reference's
    truncated-tail semantics: box[i] = mean(boxes[i : i+T]) with the window
    shifted back near the end (inference.py:61-68)."""
    n = boxes.shape[0]
    idx = jnp.arange(n)
    start = jnp.where(idx + T > n, jnp.maximum(0, n - T), idx)
    win = jnp.arange(T)
    gather = jnp.clip(start[:, None] + win[None, :], 0, n - 1)
    return boxes[gather].mean(axis=1)
