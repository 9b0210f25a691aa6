"""Lip-landmark regressor tests + the mouth-ROI calibration comparison.

The reference's mouth crop quality comes from MediaPipe lip landmarks
[57, 287, 164, 18] (lipreading/preprocess.py:46-80). These tests verify the
TPU-native replacement: shape/contract tests for the regressor, the
reference's ≥48px box-expansion semantics, and a calibration test showing
the trained regressor's mouth boxes beat the geometric face-box fraction
against a landmark oracle (IoU on synthetic faces with known lip points).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lipreading_video_generation_tpu.models import lip_landmark as ll
from lipreading_video_generation_tpu.ops import bbox as bbox_ops
from lipreading_video_generation_tpu.pipelines import train_landmark as tl
from lipreading_video_generation_tpu.pipelines.preprocess import (
    mouth_box_from_face,
    mouth_roi_pipeline,
    mouth_roi_pipeline_from_boxes,
)


def test_landmark_net_shapes():
    params = ll.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((3, ll.CROP_SIZE, ll.CROP_SIZE, 1))
    pts = ll.LipLandmarkNet().apply({"params": params}, x)
    assert pts.shape == (3, ll.NUM_POINTS, 2)
    assert bool(jnp.all((pts >= 0) & (pts <= 1)))


def test_mouth_box_from_landmarks_expansion():
    # tiny mouth → box must expand to >= 48 per side (preprocess.py:70-78)
    pts = jnp.array([[0.45, 0.7], [0.55, 0.7], [0.5, 0.68], [0.5, 0.72]])
    face = jnp.array([0.0, 200.0, 0.0, 200.0])
    box = ll.mouth_box_from_landmarks(pts, face, min_size=48)
    y1, y2, x1, x2 = [float(v) for v in box]
    # inclusive-pixel convention (preprocess.py:70-74): span+1 pixels >= 48
    assert y2 - y1 + 1 >= 48 and x2 - x1 + 1 >= 48
    # centered on the mouth
    assert abs((x1 + x2) / 2 - 100.0) < 2 and abs((y1 + y2) / 2 - 140.0) < 2


def test_predict_mouth_boxes_shapes():
    params = ll.init_params(jax.random.PRNGKey(0))
    frames = jnp.zeros((4, 120, 160, 3), jnp.uint8)
    face = jnp.tile(jnp.array([10.0, 110.0, 20.0, 140.0]), (4, 1))
    boxes = ll.predict_mouth_boxes(params, frames, face)
    assert boxes.shape == (4, 4)
    assert bool(jnp.all(boxes[:, 1] - boxes[:, 0] + 1 >= 48))


def _oracle_boxes(pts, frame_size, min_size=48):
    """Oracle mouth boxes in pixels from normalized lip points."""
    face = jnp.tile(
        jnp.array([0.0, float(frame_size), 0.0, float(frame_size)]), (pts.shape[0], 1)
    )
    return jax.vmap(lambda p, b: ll.mouth_box_from_landmarks(p, b, min_size))(pts, face)


def _mean_iou(a, b):
    """Mean per-row IoU of (N, 4) y1y2x1x2 boxes (reorder for iou_matrix's
    x1y1x2y2 convention)."""
    to_xyxy = lambda m: m[:, [2, 0, 3, 1]]
    return float(jnp.mean(jnp.diag(bbox_ops.iou_matrix(to_xyxy(a), to_xyxy(b)))))


@pytest.mark.slow
def test_landmark_calibration_beats_geometric_box():
    """VERDICT #6 calibration: trained landmark crops vs the geometric
    face-box fraction, scored by IoU against the lip-landmark oracle."""
    key = jax.random.PRNGKey(0)
    state = tl.create_state(jax.random.fold_in(key, 1))
    batch = jax.jit(ll.synthetic_face_batch, static_argnums=1)
    for s in range(250):
        imgs, pts = batch(jax.random.fold_in(key, 100 + s), 64)
        state, metrics = tl.train_step(state, imgs, pts)
    assert float(metrics["loss"]) < 0.03  # ~<2px at 64px crop scale

    # held-out faces rendered at frame resolution, face box = full frame
    size = 128
    imgs, pts = ll.synthetic_face_batch(jax.random.fold_in(key, 9999), 32, size=size)
    frames = jnp.clip(jnp.round(imgs * 255), 0, 255).astype(jnp.uint8)
    frames = jnp.repeat(frames, 3, axis=-1)
    face = jnp.tile(jnp.array([0.0, float(size), 0.0, float(size)]), (32, 1))

    oracle = _oracle_boxes(pts, size)
    pred = ll.predict_mouth_boxes(state.params, frames, face)
    geo = jax.vmap(lambda b: mouth_box_from_face(b, 48))(face)

    iou_pred = _mean_iou(pred, oracle)
    iou_geo = _mean_iou(geo, oracle)
    assert iou_pred > iou_geo, (iou_pred, iou_geo)
    assert iou_pred > 0.55, iou_pred


def test_roi_pipeline_from_landmark_boxes_matches_geometric_when_same_boxes():
    """mouth_roi_pipeline is exactly the from-boxes pipeline fed geometric
    boxes — the landmark path reuses the identical fused crop/CLAHE program."""
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (3, 96, 96, 3), dtype=np.uint8)
    face = jnp.tile(jnp.array([5.0, 90.0, 5.0, 90.0]), (3, 1))
    out_a = mouth_roi_pipeline(jnp.asarray(frames), face)
    geo = jax.vmap(lambda b: mouth_box_from_face(b, 48))(face)
    out_b = mouth_roi_pipeline_from_boxes(jnp.asarray(frames), geo)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_train_landmark_checkpoint_roundtrip(tmp_path):
    state = tl.train(num_steps=2, batch_size=8, checkpoint_dir=str(tmp_path / "lm"),
                     log_every=0)
    params = tl.load_params(str(tmp_path / "lm"))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


@pytest.mark.slow
def test_landmark_generalizes_to_shifted_distribution():
    """De-circularized evaluation: train on the standard renderer, evaluate
    on shifted_face_batch's held-out transforms (teeth band, occlusion
    bar, illumination ramp, out-of-range mouth geometry). Round-4 model
    (soft-argmax heatmap head + full_augment robustness curriculum):
    shifted IoU 0.67 @400 steps / **0.78 @2000 steps** vs geometric 0.38
    (round-3 global-pool+MLP with photometric-only augmentation: 0.54).
    The 400-step budget keeps this test CPU-tier; the 2000-step number is
    the production proof (scripts/eval_landmark_shifted.py,
    landmark_proof_r4.json)."""
    state = tl.train(num_steps=400, batch_size=64, log_every=0, augment="full")

    def eval_iou(batch_fn, n=64, size=128):
        imgs, pts = batch_fn(jax.random.PRNGKey(7), n, size=size)
        frames = jnp.repeat(
            jnp.clip(jnp.round(imgs * 255), 0, 255).astype(jnp.uint8), 3, axis=-1)
        face = jnp.tile(jnp.array([0.0, float(size), 0.0, float(size)]), (n, 1))
        oracle = _oracle_boxes(pts, size)
        pred = ll.predict_mouth_boxes(state.params, frames, face)
        geo = jax.vmap(lambda b: mouth_box_from_face(b, 48))(face)
        return _mean_iou(pred, oracle), _mean_iou(geo, oracle)

    std_pred, std_geo = eval_iou(ll.synthetic_face_batch)
    sh_pred, sh_geo = eval_iou(ll.shifted_face_batch)
    assert std_pred > std_geo and std_pred > 0.88, (std_pred, std_geo)
    assert sh_pred > sh_geo, (sh_pred, sh_geo)
    assert sh_pred > 0.55, sh_pred
