"""Feature-extraction + FeatureTransformer training path tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import FeatureTransformerConfig
from lipreading_video_generation_tpu.data import datasets
from lipreading_video_generation_tpu.models.densenet import DenseNet121
from lipreading_video_generation_tpu.models.face_api import FaceAlignment
from lipreading_video_generation_tpu.pipelines import feature_extraction as fx
from lipreading_video_generation_tpu.ops import image as im


@pytest.mark.slow
def test_embed_frames_shapes_and_padding():
    model = DenseNet121()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(0)
    clips = rng.integers(1, 256, (3, 5, 32, 32, 1), dtype=np.uint8)
    clips[1, 3:] = 0  # padded frames
    feats = fx.embed_frames(variables, clips, batch_frames=8)
    assert feats.shape == (3, 5, 1024)
    assert np.abs(feats[1, 3:]).max() == 0.0  # padded frames → zero features
    assert np.abs(feats[0]).max() > 0


def test_feature_transformer_trains_on_separable_features():
    cfg = FeatureTransformerConfig(num_classes=4, num_epochs=60, dense_dim=32,
                                   dropout=0.0, head_dropout=0.0, learning_rate=1e-2)
    rng = np.random.default_rng(0)
    n = 128
    labels = rng.integers(0, 4, n)
    # per-class direction patterns (LayerNorm-robust, unlike a mean shift)
    patterns = rng.normal(0, 1.0, (4, 16)).astype(np.float32)
    feats = (patterns[labels][:, None, :]
             + rng.normal(0, 0.2, (n, 5, 16))).astype(np.float32)
    state, val = fx.train(cfg, feats, labels, batch_size=16)
    # smoke-level convergence: clearly better than the 25% chance level
    assert val["accuracy"] > 0.5


@pytest.mark.slow
def test_face_alignment_api_contract():
    fa = FaceAlignment()
    imgs = np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    dets = fa.get_detections_for_batch(imgs)
    assert len(dets) == 2
    for d in dets:
        assert d is None or (len(d) == 4 and all(isinstance(v, int) for v in d))


def test_apply_mask():
    frames = jnp.ones((2, 4, 4, 3)) * 7.0
    mask = jnp.zeros((4, 4)).at[:2].set(255)
    out = np.asarray(im.apply_mask(frames, mask))
    assert out[:, :2].min() == 7.0 and out[:, 2:].max() == 0.0


def test_full_video_sample(tmp_path):
    import cv2

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (32, 32))
    for _ in range(6):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    sample = datasets.load_full_video_sample(path)
    assert sample["frames"].shape == (6, 32, 32, 3)
    assert sample["audio"].ndim == 1
    assert sample["fps"] == pytest.approx(25.0)
