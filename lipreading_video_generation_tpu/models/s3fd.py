"""S3FD face detector (Flax NHWC) + dense decode/NMS pipeline.

Architecture parity with the reference torch net (gan-model/preprocessing/
face_detection/detection/sfd/net_s3fd.py:22-129): VGG16 backbone, dilated
fc6/fc7(=conv), extra conv6/conv7 stages, L2Norm-scaled heads at strides
4/8/16/32/64/128 with anchor = 4·stride, max-out background label on the
stride-4 head (:124-127). Mean subtraction (104,117,123) from
detect.py:20,59 happens in ``preprocess_input``.

The detection pipeline replaces the host-side per-position loops
(detect.py:36-51) with a dense on-device decode over all scales + fixed-k
NMS (ops/bbox.py), jittable end to end; SFDDetector's score>0.5 filter and
NMS@0.3 (sfd_detector.py:35-59) are preserved.

``convert_torch_state_dict`` ports the published ``s3fd.pth`` weights
(OIHW→HWIO transpose) so the frozen pretrained detector can be used
directly.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import bbox as bbox_ops

S3FD_MEAN = np.array([104.0, 117.0, 123.0], dtype=np.float32)  # BGR order
STRIDES = (4, 8, 16, 32, 64, 128)


class L2Norm(nn.Module):
    """Per-channel L2 normalization with learned scale (net_s3fd.py:6-19)."""

    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.constant(self.scale), (c,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + 1e-10
        return x / norm * w


def _conv(features, kernel, name, padding=1, stride=1, dilation=1):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=stride,
        padding=padding,
        kernel_dilation=dilation,
        name=name,
    )


class S3FD(nn.Module):
    """(B, H, W, 3) mean-subtracted BGR → 6×(cls, reg) NHWC heads."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        r = nn.relu
        h = r(_conv(64, 3, "conv1_1")(x))
        h = r(_conv(64, 3, "conv1_2")(h))
        h = pool(h)
        h = r(_conv(128, 3, "conv2_1")(h))
        h = r(_conv(128, 3, "conv2_2")(h))
        h = pool(h)
        h = r(_conv(256, 3, "conv3_1")(h))
        h = r(_conv(256, 3, "conv3_2")(h))
        h = r(_conv(256, 3, "conv3_3")(h))
        f3_3 = h
        h = pool(h)
        h = r(_conv(512, 3, "conv4_1")(h))
        h = r(_conv(512, 3, "conv4_2")(h))
        h = r(_conv(512, 3, "conv4_3")(h))
        f4_3 = h
        h = pool(h)
        h = r(_conv(512, 3, "conv5_1")(h))
        h = r(_conv(512, 3, "conv5_2")(h))
        h = r(_conv(512, 3, "conv5_3")(h))
        f5_3 = h
        h = pool(h)
        # fc6: 3x3 conv with padding 3 (net_s3fd.py:43) — effective dilation-free
        h = r(_conv(1024, 3, "fc6", padding=3)(h))
        h = r(_conv(1024, 1, "fc7", padding=0)(h))
        ffc7 = h
        h = r(_conv(256, 1, "conv6_1", padding=0)(h))
        h = r(_conv(512, 3, "conv6_2", stride=2)(h))
        f6_2 = h
        h = r(_conv(128, 1, "conv7_1", padding=0)(h))
        h = r(_conv(256, 3, "conv7_2", stride=2)(h))
        f7_2 = h

        f3_3 = L2Norm(10.0, name="conv3_3_norm")(f3_3)
        f4_3 = L2Norm(8.0, name="conv4_3_norm")(f4_3)
        f5_3 = L2Norm(5.0, name="conv5_3_norm")(f5_3)

        cls1 = _conv(4, 3, "conv3_3_norm_mbox_conf")(f3_3)
        reg1 = _conv(4, 3, "conv3_3_norm_mbox_loc")(f3_3)
        cls2 = _conv(2, 3, "conv4_3_norm_mbox_conf")(f4_3)
        reg2 = _conv(4, 3, "conv4_3_norm_mbox_loc")(f4_3)
        cls3 = _conv(2, 3, "conv5_3_norm_mbox_conf")(f5_3)
        reg3 = _conv(4, 3, "conv5_3_norm_mbox_loc")(f5_3)
        cls4 = _conv(2, 3, "fc7_mbox_conf")(ffc7)
        reg4 = _conv(4, 3, "fc7_mbox_loc")(ffc7)
        cls5 = _conv(2, 3, "conv6_2_mbox_conf")(f6_2)
        reg5 = _conv(4, 3, "conv6_2_mbox_loc")(f6_2)
        cls6 = _conv(2, 3, "conv7_2_mbox_conf")(f7_2)
        reg6 = _conv(4, 3, "conv7_2_mbox_loc")(f7_2)

        # max-out background label on the stride-4 head (net_s3fd.py:124-127)
        b0, b1, b2, fg = jnp.split(cls1, 4, axis=-1)
        bmax = jnp.maximum(jnp.maximum(b0, b1), b2)
        cls1 = jnp.concatenate([bmax, fg], axis=-1)
        return [cls1, reg1, cls2, reg2, cls3, reg3, cls4, reg4, cls5, reg5, cls6, reg6]


def preprocess_input(images_bgr: jax.Array) -> jax.Array:
    """uint8/float BGR (B, H, W, 3) → mean-subtracted float32."""
    return images_bgr.astype(jnp.float32) - jnp.asarray(S3FD_MEAN)


def decode_detections(
    outputs: Sequence[jax.Array],
    variances: Tuple[float, float] = (0.1, 0.2),
) -> Tuple[jax.Array, jax.Array]:
    """6×(cls, reg) heads → (boxes (B, N, 4), scores (B, N)) over all anchors."""
    all_boxes, all_scores = [], []
    for i in range(6):
        cls, reg = outputs[2 * i], outputs[2 * i + 1]
        boxes, scores = bbox_ops.dense_decode_scale(cls, reg, STRIDES[i], variances)
        all_boxes.append(boxes)
        all_scores.append(scores)
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_scores, axis=1)


def detect_faces(
    model: S3FD,
    params,
    images_bgr: jax.Array,
    score_threshold: float = 0.5,
    nms_threshold: float = 0.3,
    max_faces: int = 8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched detection: (B, H, W, 3) BGR → (boxes (B, max_faces, 4),
    scores (B, max_faces), valid (B, max_faces)).

    Jittable equivalent of SFDDetector.detect_from_batch + NMS + score
    filter (sfd_detector.py:29-46). Pre-NMS thresholding at 0.05 matches
    detect.py:41 implicitly via the NMS score_threshold.
    """
    outputs = model.apply({"params": params}, preprocess_input(images_bgr))
    boxes, scores = decode_detections(outputs)

    def per_image(b, s):
        idx, valid = bbox_ops.nms(b, s, nms_threshold, max_keep=max_faces,
                                  score_threshold=0.05)
        kept_boxes = b[idx]
        kept_scores = s[idx]
        ok = valid & (kept_scores > score_threshold)
        return kept_boxes, kept_scores, ok

    return jax.vmap(per_image)(boxes, scores)


def flip_detect(
    model: S3FD,
    params,
    images_bgr: jax.Array,
    **kwargs,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Detect on horizontally-flipped images and mirror the boxes back —
    the flip-TTA variant (detect.py:96-106). Same outputs as detect_faces."""
    w = images_bgr.shape[2]
    boxes, scores, valid = detect_faces(model, params, images_bgr[:, :, ::-1], **kwargs)
    flipped = jnp.stack(
        [w - boxes[..., 2], boxes[..., 1], w - boxes[..., 0], boxes[..., 3]], axis=-1
    )
    return flipped, scores, valid


# ---------------------------------------------------------------------------
# torch s3fd.pth weight port
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state_dict: Dict[str, np.ndarray]):
    """Map the published s3fd.pth torch state_dict onto this module's
    params pytree (conv kernels OIHW→HWIO; L2Norm weights pass through)."""
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in state_dict.items():
        val = np.asarray(val)
        mod, leaf = key.rsplit(".", 1)
        entry = params.setdefault(mod, {})
        if leaf == "weight" and val.ndim == 4:
            entry["kernel"] = val.transpose(2, 3, 1, 0)
        elif leaf == "weight":
            entry["weight"] = val
        elif leaf == "bias":
            entry["bias"] = val
    return params
