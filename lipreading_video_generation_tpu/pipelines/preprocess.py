"""Mouth-ROI preprocessing: face detect → lip crop → CLAHE → model input.

Capability targets:
- lipreading/get_data.py:22-60 (frame loop: MediaPipe lip crop → 48×48
  cubic resize → CLAHE contrast boost; per-word window slicing) and
  lipreading/preprocess.py:46-80 (``landmark_crop``: lip landmark bbox
  expanded to ≥48×48).
- gan-model/preprocessing/preprocess.py:42-76 (offline S3FD face crops per
  frame + audio extraction).

TPU redesign: the per-frame Python/MediaPipe loop becomes (a) batched S3FD
face boxes (models/s3fd.py), (b) a geometric mouth-region estimate from the
face box — keeping the ``landmark_crop`` interface: face box in, ≥48×48
mouth crop out — and (c) one fused jitted program per clip doing
crop+resize+grayscale+CLAHE over all frames at once.

The ThreadPoolExecutor-per-GPU fan-out of preprocess.py:36-37,100-103 maps
to per-host data sharding: each host feeds its own device with its own
slice of the clip list (see pipelines/offline_preprocess).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PreprocessConfig
from ..ops import image as image_ops


def mouth_box_from_face(face_box: jax.Array, min_size: int = 48) -> jax.Array:
    """Estimate the mouth region from an (y1, y2, x1, x2) face box.

    Geometric replacement for the MediaPipe landmark crop
    (lipreading/preprocess.py:46-80): lips sit in the lower-center of the
    face — rows [0.62, 0.92] and cols [0.22, 0.78] of the face box — then
    expand to ≥min_size×min_size (preprocess.py:70-78 semantics via
    ops/image.expand_box_to_min_size).
    """
    y1, y2, x1, x2 = face_box[0], face_box[1], face_box[2], face_box[3]
    h = y2 - y1
    w = x2 - x1
    box = jnp.stack([
        y1 + 0.62 * h,
        y1 + 0.92 * h,
        x1 + 0.22 * w,
        x1 + 0.78 * w,
    ])
    return image_ops.expand_box_to_min_size(box, min_size, min_size).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("crop_hw", "out_hw", "clahe_clip", "grid"))
def mouth_roi_pipeline_from_boxes(
    frames_uint8: jax.Array,     # (T, H, W, 3) RGB uint8
    mouth_boxes: jax.Array,      # (T, 4) y1y2x1x2 float mouth crops
    crop_hw: Tuple[int, int] = (48, 48),
    out_hw: Tuple[int, int] = (32, 32),
    clahe_clip: float = 0.2,
    grid: Tuple[int, int] = (8, 8),
) -> jax.Array:
    """Fused ROI pipeline from precomputed mouth boxes (geometric or
    landmark-regressed) → (T, out_h, out_w, 1) uint8.

    Per frame: crop+resize to crop_hw (the 48×48 cubic resize of
    get_data.py:45) → CLAHE contrast boost on luma (contrast_boost,
    preprocess.py:17-34) → resize to the model input size (main.py:35-36's
    32×32) → grayscale.
    """
    crops = jax.vmap(lambda f, b: image_ops.crop_and_resize(f, b, crop_hw, "cubic"))(
        frames_uint8.astype(jnp.float32), mouth_boxes
    )
    gray = image_ops.rgb_to_gray(crops)[..., 0]          # (T, h, w)
    boosted = image_ops.clahe(gray, clahe_clip, grid)
    out = image_ops.resize(boosted[..., None], out_hw, "bilinear")
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("crop_hw", "out_hw", "clahe_clip", "grid"))
def mouth_roi_pipeline(
    frames_uint8: jax.Array,     # (T, H, W, 3) RGB uint8
    face_boxes: jax.Array,       # (T, 4) y1y2x1x2 float
    crop_hw: Tuple[int, int] = (48, 48),
    out_hw: Tuple[int, int] = (32, 32),
    clahe_clip: float = 0.2,
    grid: Tuple[int, int] = (8, 8),
) -> jax.Array:
    """All-frames fused mouth-ROI pipeline with the geometric mouth-box
    estimate → (T, out_h, out_w, 1) uint8."""
    mouth = jax.vmap(lambda b: mouth_box_from_face(b, crop_hw[0]))(face_boxes)
    return mouth_roi_pipeline_from_boxes(
        frames_uint8, mouth, crop_hw, out_hw, clahe_clip, grid
    )


def slice_word_clips(
    processed_frames: np.ndarray,                 # (T, h, w, 1)
    word_frame_spans: Sequence[Tuple[str, int, int]],
    max_frames: int = 5,
) -> Tuple[List[np.ndarray], List[str]]:
    """Per-word frame windows (get_data.py:54-58), zero-padded/truncated to
    ``max_frames`` like prepare_all_videos (feature_extraction.py:60-77)."""
    clips, words = [], []
    t = len(processed_frames)
    for word, start, end in word_frame_spans:
        start = max(0, min(start, t - 1))
        end = max(start + 1, min(end, t))
        clip = processed_frames[start:end]
        if len(clip) >= max_frames:
            clip = clip[:max_frames]
        else:
            pad = np.zeros((max_frames - len(clip),) + clip.shape[1:], clip.dtype)
            clip = np.concatenate([clip, pad])
        clips.append(clip)
        words.append(word)
    return clips, words


def preprocess_clip_for_lipreading(
    frames: np.ndarray,
    s3fd_params,
    word_spans: Sequence[Tuple[str, int, int]],
    cfg: PreprocessConfig = PreprocessConfig(),
    max_frames: int = 5,
    landmark_params=None,
) -> Tuple[List[np.ndarray], List[str]]:
    """Full host+device path for one clip: detect → mouth boxes (trained
    landmark regressor when ``landmark_params`` is given, geometric estimate
    otherwise) → fused ROI pipeline → word windows. Returns
    (clips [(max_frames, h, w, 1) uint8], words)."""
    from ..models import lip_landmark
    from .inference import detect_face_tracks

    boxes = detect_face_tracks(s3fd_params, frames, cfg)
    frames_j, boxes_j = jnp.asarray(frames), jnp.asarray(boxes)
    if landmark_params is not None:
        mouth = lip_landmark.predict_mouth_boxes(
            landmark_params, frames_j, boxes_j, cfg.lip_crop_size[0]
        )
    else:
        mouth = jax.vmap(lambda b: mouth_box_from_face(b, cfg.lip_crop_size[0]))(boxes_j)
    processed = np.asarray(
        mouth_roi_pipeline_from_boxes(
            frames_j, mouth,
            cfg.lip_crop_size, cfg.model_input_size,
            cfg.clahe_clip_limit, cfg.clahe_grid,
        )
    )
    return slice_word_clips(processed, word_spans, max_frames)
