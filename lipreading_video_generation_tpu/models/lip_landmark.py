"""Lightweight lip-landmark regressor: face crop → 4 lip points → mouth box.

Capability target: the MediaPipe FaceLandmarker lip crop of the reference
(lipreading/preprocess.py:38-80). The reference picks landmarks
[57, 287, 164, 18] — left mouth corner, right mouth corner, upper lip
(philtrum) and lower lip — takes their pixel bounding box and expands it to
at least 48x48 (preprocess.py:70-78).

TPU redesign: MediaPipe is a host-side C++ graph and cannot run on device.
Instead of the fixed geometric face-box fraction used as the bootstrap
(pipelines/preprocess.mouth_box_from_face), this module provides a small
trainable conv regressor over the S3FD face crop. The whole path — crop the
detected face, resize, regress 4 normalized points, map back to image
coordinates, expand to the minimum crop size — is one fused jitted batch
program, so landmark quality comes at negligible cost next to detection.

The four predicted points keep the reference's semantics: points 0/1 span
the mouth horizontally (corners), points 2/3 span it vertically
(upper/lower lip), so ``mouth_box_from_landmarks`` reproduces the
``dim/scale`` bbox math of preprocess.py:63-68 with our (y1, y2, x1, x2)
box convention.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import image as image_ops

# Input resolution of the regressor (square grayscale face crop).
CROP_SIZE = 64
NUM_POINTS = 4  # left corner, right corner, upper lip, lower lip


class LipLandmarkNet(nn.Module):
    """(B, 64, 64, 1) grayscale face crop in [0,1] → (B, 4, 2) normalized
    (x, y) lip points in face-crop coordinates.

    Round-4 architecture: a tiny U-shaped encoder/decoder producing
    per-point heatmaps at 16×16, read out with a **soft-argmax** (spatial
    softmax → expected coordinates). Heatmap readout is translation-
    equivariant — the prediction moves with the mouth instead of being
    squeezed through a global average pool — which is what lifted the
    shifted-distribution IoU past the global-pool+MLP head (0.68 → see
    STATUS.md round-4 numbers) under rotation/occlusion/illumination
    shift. ~0.5M params: still rides along with S3FD detection without
    moving the preprocessing throughput needle.
    """

    width: int = 32
    softmax_temp: float = 10.0   # heatmap logits gain before spatial softmax

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        skips = {}
        for i, mult in enumerate((1, 2, 4, 8)):
            h = nn.Conv(self.width * mult, (3, 3), strides=2, name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=8, name=f"norm{i}")(h)
            h = nn.silu(h)
            skips[i] = h                                   # 32, 16, 8, 4
        # decode back to the 16×16 (stride-4) map with skip fusion
        for i, mult in ((2, 4), (1, 2)):
            b, hh, ww, _ = skips[i].shape
            up = jax.image.resize(h, (b, hh, ww, h.shape[-1]), method="bilinear")
            h = jnp.concatenate([up, skips[i]], axis=-1)
            h = nn.Conv(self.width * mult, (3, 3), name=f"up{i}")(h)
            h = nn.GroupNorm(num_groups=8, name=f"upnorm{i}")(h)
            h = nn.silu(h)
        maps = nn.Conv(NUM_POINTS, (3, 3), name="heat")(h)  # (B, 16, 16, 4)
        b, mh, mw, _ = maps.shape
        logits = maps.transpose(0, 3, 1, 2).reshape(b, NUM_POINTS, mh * mw)
        probs = jax.nn.softmax(self.softmax_temp * logits, axis=-1)
        probs = probs.reshape(b, NUM_POINTS, mh, mw)
        ys = (jnp.arange(mh, dtype=jnp.float32) + 0.5) / mh
        xs = (jnp.arange(mw, dtype=jnp.float32) + 0.5) / mw
        ey = jnp.einsum("bphw,h->bp", probs, ys)
        ex = jnp.einsum("bphw,w->bp", probs, xs)
        return jnp.stack([ex, ey], axis=-1)                # (B, 4, 2) (x, y)


def mouth_box_from_landmarks(
    points: jax.Array,          # (4, 2) normalized (x, y) in face-crop coords
    face_box: jax.Array,        # (4,) y1, y2, x1, x2 in image pixels
    min_size: int = 48,
) -> jax.Array:
    """Reference bbox math (preprocess.py:63-78) in our box convention.

    x-range from the two mouth corners (points 0/1), y-range from the
    upper/lower lip points (points 2/3); the pixel box is then expanded to
    at least ``min_size`` per side.
    """
    y1, y2, x1, x2 = face_box[0], face_box[1], face_box[2], face_box[3]
    h, w = y2 - y1, x2 - x1
    xs = x1 + points[:2, 0] * w
    ys = y1 + points[2:, 1] * h
    box = jnp.stack([
        jnp.minimum(ys[0], ys[1]),
        jnp.maximum(ys[0], ys[1]),
        jnp.minimum(xs[0], xs[1]),
        jnp.maximum(xs[0], xs[1]),
    ])
    return image_ops.expand_box_to_min_size(box, min_size, min_size).astype(jnp.float32)


def face_crops_for_landmarks(frames: jax.Array, face_boxes: jax.Array) -> jax.Array:
    """(T, H, W, 3) uint8/float frames + (T, 4) face boxes → (T, 64, 64, 1)
    normalized grayscale crops, the regressor's input."""
    crops = jax.vmap(
        lambda f, b: image_ops.crop_and_resize(f, b, (CROP_SIZE, CROP_SIZE), "bilinear")
    )(frames.astype(jnp.float32), face_boxes)
    gray = image_ops.rgb_to_gray(crops)
    return gray / 255.0


@functools.partial(jax.jit, static_argnames=("min_size",))
def predict_mouth_boxes(
    params,
    frames: jax.Array,           # (T, H, W, 3)
    face_boxes: jax.Array,       # (T, 4) y1y2x1x2
    min_size: int = 48,
) -> jax.Array:
    """Fused landmark mouth-box path: crop faces → regress points → boxes.

    Drop-in replacement for the geometric ``mouth_box_from_face`` batch
    (pipelines/preprocess.py:34-52) once a trained checkpoint is supplied.
    """
    crops = face_crops_for_landmarks(frames, face_boxes)
    pts = LipLandmarkNet().apply({"params": params}, crops)
    return jax.vmap(lambda p, b: mouth_box_from_landmarks(p, b, min_size))(pts, face_boxes)


def init_params(key: jax.Array, width: int = 32):
    return LipLandmarkNet(width=width).init(
        key, jnp.zeros((1, CROP_SIZE, CROP_SIZE, 1), jnp.float32)
    )["params"]


# ---------------------------------------------------------------------------
# Synthetic supervision: parametric face renderer with oracle lip points.
#
# The environment has no LRS2/MediaPipe labels, so the regressor trains (and
# its calibration test evaluates) on procedurally rendered faces: an
# ellipse head, two eyes, and a dark mouth ellipse whose center/size vary
# per sample. The oracle points are the mouth ellipse extremes — exactly
# what MediaPipe's [57, 287, 164, 18] landmarks measure on a real face.
# ---------------------------------------------------------------------------


def synthetic_face_batch(
    key: jax.Array, n: int, size: int = CROP_SIZE
) -> Tuple[jax.Array, jax.Array]:
    """Render n synthetic faces → ((n, size, size, 1) float [0,1] images,
    (n, 4, 2) oracle normalized lip points)."""
    keys = jax.random.split(key, 6)
    cx = jax.random.uniform(keys[0], (n,), minval=0.35, maxval=0.65)
    cy = jax.random.uniform(keys[1], (n,), minval=0.55, maxval=0.8)
    mw = jax.random.uniform(keys[2], (n,), minval=0.08, maxval=0.2)   # half-width
    mh = jax.random.uniform(keys[3], (n,), minval=0.03, maxval=0.09)  # half-height
    skin = jax.random.uniform(keys[4], (n,), minval=0.55, maxval=0.85)
    noise = 0.03 * jax.random.normal(keys[5], (n, size, size))
    return _render_faces(cx, cy, mw, mh, skin, noise, size)


def _render_faces(cx, cy, mw, mh, skin, noise, size: int):

    yy, xx = jnp.meshgrid(
        (jnp.arange(size) + 0.5) / size, (jnp.arange(size) + 0.5) / size, indexing="ij"
    )

    def render(cx_i, cy_i, mw_i, mh_i, skin_i, noise_i):
        head = ((xx - 0.5) / 0.42) ** 2 + ((yy - 0.45) / 0.5) ** 2 <= 1.0
        img = jnp.where(head, skin_i, 0.12)
        for ex in (0.35, 0.65):
            eye = ((xx - ex) / 0.07) ** 2 + ((yy - 0.3) / 0.045) ** 2 <= 1.0
            img = jnp.where(eye, 0.15, img)
        mouth = ((xx - cx_i) / mw_i) ** 2 + ((yy - cy_i) / mh_i) ** 2 <= 1.0
        img = jnp.where(mouth, 0.08, img)
        return jnp.clip(img + noise_i, 0.0, 1.0)

    imgs = jax.vmap(render)(cx, cy, mw, mh, skin, noise)[..., None]
    pts = jnp.stack(
        [
            jnp.stack([cx - mw, cy], axis=-1),   # left corner
            jnp.stack([cx + mw, cy], axis=-1),   # right corner
            jnp.stack([cx, cy - mh], axis=-1),   # upper lip
            jnp.stack([cx, cy + mh], axis=-1),   # lower lip
        ],
        axis=1,
    )
    return imgs, pts


def shifted_face_batch(
    key: jax.Array, n: int, size: int = CROP_SIZE
) -> Tuple[jax.Array, jax.Array]:
    """Held-out *distribution-shifted* faces for de-circularized evaluation.

    ``synthetic_face_batch`` is both the train and (previously) the eval
    distribution — a circular test. This renderer deliberately breaks every
    train-time regularity while keeping the oracle physical (the 4 lip
    points move with the face, exactly like MediaPipe's [57, 287, 164, 18]
    track a rotated head):

    - mouth geometry OUTSIDE the train ranges (wider/thinner, nearer edges)
    - teeth: a bright band inside the mouth (breaks "darkest blob" cues)
    - head tilt: whole-image rotation ±15° (points rotated with it)
    - illumination: linear brightness ramp across a random direction
    - optics: Gaussian blur σ ∈ [0, 1.5] and 2× the sensor noise
    - occlusion: a dark bar over a random image row band

    None of these transforms is used in training (train-time augmentation
    is photometric-only, pipelines/train_landmark.py), so IoU here measures
    genuine generalization, not renderer memorization.
    """
    keys = jax.random.split(key, 13)
    # geometry sampled AROUND the train ranges (train: cx .35-.65, cy .55-.8,
    # mw .08-.2, mh .03-.09)
    cx = jax.random.uniform(keys[0], (n,), minval=0.3, maxval=0.7)
    cy = jax.random.uniform(keys[1], (n,), minval=0.5, maxval=0.85)
    mw = jax.random.uniform(keys[2], (n,), minval=0.06, maxval=0.24)
    mh = jax.random.uniform(keys[3], (n,), minval=0.02, maxval=0.11)
    skin = jax.random.uniform(keys[4], (n,), minval=0.45, maxval=0.9)
    noise = 0.06 * jax.random.normal(keys[5], (n, size, size))
    imgs, pts = _render_faces(cx, cy, mw, mh, skin, noise, size)

    # teeth: bright band across the middle of the mouth opening
    yy, xx = jnp.meshgrid(
        (jnp.arange(size) + 0.5) / size, (jnp.arange(size) + 0.5) / size, indexing="ij"
    )
    show_teeth = jax.random.uniform(keys[6], (n,)) > 0.4

    def add_teeth(img, cx_i, cy_i, mw_i, mh_i, on):
        teeth = (((xx - cx_i) / (mw_i * 0.8)) ** 2 <= 1.0) & (
            jnp.abs(yy - cy_i) <= mh_i * 0.35)
        return jnp.where(teeth & on, 0.85, img[..., 0])[..., None]

    imgs = jax.vmap(add_teeth)(imgs, cx, cy, mw, mh, show_teeth)

    # illumination ramp along a random direction, 0.7..1.3
    phi = jax.random.uniform(keys[7], (n,), minval=0.0, maxval=2 * jnp.pi)

    def ramp(img, phi_i):
        proj = (xx - 0.5) * jnp.cos(phi_i) + (yy - 0.5) * jnp.sin(phi_i)
        return img * (1.0 + 0.6 * proj)[..., None]

    imgs = jax.vmap(ramp)(imgs, phi)

    # occlusion bar: a dark horizontal band of height ~8% at a random row
    occ_y = jax.random.uniform(keys[8], (n,), minval=0.05, maxval=0.95)
    occ_on = jax.random.uniform(keys[9], (n,)) > 0.5

    def occlude(img, y0, on):
        bar = jnp.abs(yy - y0) <= 0.04
        return jnp.where(bar & on, 0.05, img[..., 0])[..., None]

    imgs = jax.vmap(occlude)(imgs, occ_y, occ_on)

    # head tilt: rotate image (inverse-mapped bilinear resample) and points
    theta = jax.random.uniform(keys[10], (n,), minval=-0.26, maxval=0.26)  # ±15°
    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(size, dtype=jnp.float32), jnp.arange(size, dtype=jnp.float32),
        indexing="ij",
    )
    c = (size - 1) / 2.0

    def rotate_img(img, th):
        # sample source coords = R(-th) applied to destination coords
        cos, sin = jnp.cos(th), jnp.sin(th)
        sx = cos * (grid_x - c) + sin * (grid_y - c) + c
        sy = -sin * (grid_x - c) + cos * (grid_y - c) + c
        return jax.scipy.ndimage.map_coordinates(
            img[..., 0], [sy, sx], order=1, mode="nearest")[..., None]

    def rotate_pts(p, th):
        cos, sin = jnp.cos(th), jnp.sin(th)
        rel = p - 0.5
        return jnp.stack(
            [0.5 + cos * rel[:, 0] - sin * rel[:, 1],
             0.5 + sin * rel[:, 0] + cos * rel[:, 1]], axis=-1)

    imgs = jax.vmap(rotate_img)(imgs, theta)
    pts = jax.vmap(rotate_pts)(pts, theta)

    # Gaussian blur σ ∈ [0, 1.5] via a 7×7 kernel (outer product of taps)
    sigma = jax.random.uniform(keys[11], (n,), minval=1e-3, maxval=1.5)
    taps = jnp.arange(-3.0, 4.0)

    def blur(img, s):
        w = jnp.exp(-(taps**2) / (2.0 * s**2))
        w = w / w.sum()
        k = (w[:, None] * w[None, :])[:, :, None, None]      # (7, 7, 1, 1)
        out = jax.lax.conv_general_dilated(
            img[None], k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out[0]

    imgs = jax.vmap(blur)(imgs, sigma)
    return jnp.clip(imgs, 0.0, 1.0), jnp.clip(pts, 0.0, 1.0)
