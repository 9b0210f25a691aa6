"""Box math: SSD-style anchor encode/decode, IoU, and fixed-shape NMS.

TPU-native re-design of gan-model/preprocessing/face_detection/detection/
sfd/bbox.py:30-129 and the per-position Python decode loops of
detect.py:36-51,74-89. The reference iterates `np.where(score > 0.05)`
positions one at a time on host; here the decode is **dense** over all
anchors of all scales at once (one fused XLA program), and NMS is a
static-iteration masked loop (fixed max_keep), so everything jits with
static shapes (SURVEY.md §7 hard part #3).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "iou_matrix",
    "encode",
    "decode",
    "nms",
    "make_anchor_grid",
    "dense_decode_scale",
]


def iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of (N,4) and (M,4) x1y1x2y2 boxes, with the reference's
    +1 pixel-area convention (bbox.py:48,58)."""
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(0.0, rb - lt + 1)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def encode(matched: jax.Array, priors: jax.Array, variances: Sequence[float] = (0.1, 0.2)) -> jax.Array:
    """Ground-truth x1y1x2y2 boxes → (dx, dy, dw, dh) regression targets
    against cxcywh priors (bbox.py:67-88)."""
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(g_wh) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode(loc: jax.Array, priors: jax.Array, variances: Sequence[float] = (0.1, 0.2)) -> jax.Array:
    """(..., 4) regression deltas + cxcywh priors → x1y1x2y2 boxes
    (bbox.py:91-129; handles any batch dims, subsuming batch_decode)."""
    cxcy = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    mins = cxcy - wh / 2
    maxs = mins + wh
    return jnp.concatenate([mins, maxs], axis=-1)


def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.3,
    max_keep: int = 32,
    score_threshold: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS with static output shape.

    boxes (N,4), scores (N,) → (keep_idx (max_keep,), keep_valid (max_keep,)).
    Semantics match bbox.py:44-64 (suppress IoU > threshold); invalid slots
    carry index 0 and valid=False. Top-max_keep selection then an O(K²)
    masked suppression — K is small (faces per image), so the IoU matrix is
    tiny and the loop is a static `fori_loop` over K.
    """
    n = boxes.shape[0]
    k = min(max_keep, n)
    top_scores, top_idx = jax.lax.top_k(jnp.where(scores > score_threshold, scores, -jnp.inf), k)
    top_boxes = boxes[top_idx]
    valid = jnp.isfinite(top_scores)

    ious = iou_matrix(top_boxes, top_boxes)

    def body(i, keep):
        # keep box i only if not suppressed by any kept higher-scoring box
        sup = (ious[:, i] > iou_threshold) & keep & (jnp.arange(k) < i)
        keep_i = valid[i] & ~jnp.any(sup)
        return keep.at[i].set(keep_i)

    keep = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))
    if k < max_keep:
        pad = max_keep - k
        top_idx = jnp.pad(top_idx, (0, pad))
        keep = jnp.pad(keep, (0, pad))
    return top_idx, keep


def make_anchor_grid(fh: int, fw: int, stride: int, anchor_scale: int = 4) -> np.ndarray:
    """(fh*fw, 4) cxcywh anchors for one S3FD scale: centers at
    stride/2 + i*stride, size = anchor_scale*stride (detect.py:39-46)."""
    ys = stride / 2 + np.arange(fh) * stride
    xs = stride / 2 + np.arange(fw) * stride
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    size = np.full_like(cy, float(anchor_scale * stride))
    return np.stack([cx, cy, size, size], axis=-1).reshape(-1, 4).astype(np.float32)


def dense_decode_scale(
    cls_logits: jax.Array,
    reg: jax.Array,
    stride: int,
    variances: Sequence[float] = (0.1, 0.2),
) -> Tuple[jax.Array, jax.Array]:
    """Decode one S3FD head densely.

    cls_logits: (B, H, W, 2) [background, face]; reg: (B, H, W, 4).
    Returns (boxes (B, H*W, 4) x1y1x2y2, scores (B, H*W)).

    Replaces the host-side `zip(np.where(...))` position loop of
    detect.py:41-51 with a fully dense decode; thresholding happens later in
    the fixed-k NMS, preserving static shapes.
    """
    b, fh, fw, _ = cls_logits.shape
    scores = jax.nn.softmax(cls_logits, axis=-1)[..., 1].reshape(b, fh * fw)
    priors = jnp.asarray(make_anchor_grid(fh, fw, stride))
    boxes = decode(reg.reshape(b, fh * fw, 4), priors[None], variances)
    return boxes, scores
