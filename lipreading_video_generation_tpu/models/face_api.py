"""High-level face-detection API.

Interface parity with ``FaceAlignment`` / ``FaceDetector``
(gan-model/preprocessing/face_detection/api.py:17-78, detection/
core.py:9-130): construct once, call ``get_detections_for_batch`` on a
uint8 BGR image batch, get per-image ``(x1, y1, x2, y2)`` boxes or None —
the exact call contract inference.py:74-87 and preprocess.py:51-60 rely
on. Backed by the Flax S3FD + dense decode + fixed-k NMS instead of the
torch model + per-position host loops.
"""
from __future__ import annotations

import enum
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .s3fd import S3FD, detect_faces


class LandmarksType(enum.Enum):
    """Kept for interface parity (api.py:20-31); detection-only here, as in
    the reference (FAN landmarks are dead code, models.py:13-261)."""

    TWO_D = 1
    TWO_HALF_D = 2
    THREE_D = 3


class FaceAlignment:
    """Batched face detector with the reference's API shape (api.py:35-78)."""

    def __init__(
        self,
        landmarks_type: LandmarksType = LandmarksType.TWO_D,
        params=None,
        score_threshold: float = 0.5,
        nms_threshold: float = 0.3,
        seed: int = 0,
    ):
        self.landmarks_type = landmarks_type
        self.model = S3FD()
        if params is None:
            params = self.model.init(
                jax.random.key(seed), np.zeros((1, 64, 64, 3), np.float32)
            )["params"]
        self.params = params
        self.score_threshold = score_threshold
        self.nms_threshold = nms_threshold

    def get_detections_for_batch(self, images: np.ndarray) -> List[Optional[Tuple[int, int, int, int]]]:
        """(B, H, W, 3) uint8 BGR → per-image (x1, y1, x2, y2) ints or None
        (api.py:64-78 contract)."""
        boxes, scores, valid = detect_faces(
            self.model, self.params, jnp.asarray(images.astype(np.float32)),
            score_threshold=self.score_threshold, nms_threshold=self.nms_threshold,
        )
        boxes = np.asarray(boxes)
        valid = np.asarray(valid)
        out: List[Optional[Tuple[int, int, int, int]]] = []
        for b in range(len(images)):
            if not valid[b].any():
                out.append(None)
                continue
            x1, y1, x2, y2 = boxes[b, 0]
            out.append((int(x1), int(y1), int(x2), int(y2)))
        return out
