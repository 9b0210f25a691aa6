"""End-to-end lip-sync inference smoke test at tiny width (inference.py
pipeline: detect → generate → paste back → mux)."""
import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import GanConfig, PreprocessConfig
from lipreading_video_generation_tpu.models.generator import TalkingFaceGenerator
from lipreading_video_generation_tpu.models.s3fd import S3FD
from lipreading_video_generation_tpu.pipelines import inference as inf


@pytest.fixture(scope="module")
def tiny_models():
    gen = TalkingFaceGenerator(width=0.125)
    gen_params = gen.init(
        jax.random.key(0), jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 96, 96, 6))
    )["params"]
    s3fd = S3FD()
    s3fd_params = s3fd.init(jax.random.key(1), np.zeros((1, 64, 64, 3), np.float32))["params"]
    return gen_params, s3fd_params


def _face_video(tmp_path, frames=8, size=128):
    path = str(tmp_path / "face.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (size, size))
    for i in range(frames):
        img = np.full((size, size, 3), 40, np.uint8)
        cv2.circle(img, (64, 64), 40, (180, 150, 130), -1)  # face-ish blob
        w.write(img)
    w.release()
    return path


def _speech_wav(tmp_path, seconds=0.4):
    from lipreading_video_generation_tpu.data.video import save_wav

    path = str(tmp_path / "speech.wav")
    t = np.linspace(0, seconds, int(16000 * seconds))
    save_wav(path, np.sin(2 * np.pi * 220 * t).astype(np.float32), 16000)
    return path


def test_paste_back_composites_roi():
    frame = jnp.zeros((64, 64, 3))
    roi = jnp.ones((96, 96, 3)) * 200.0
    box = jnp.asarray([16.0, 48.0, 16.0, 48.0])
    out = np.asarray(inf.paste_back(frame, roi, box))
    assert out[32, 32, 0] == pytest.approx(200.0, abs=1.0)
    assert out[8, 8, 0] == 0.0 and out[56, 56, 0] == 0.0


def test_detect_face_tracks_shapes(tiny_models):
    _, s3fd_params = tiny_models
    frames = np.random.default_rng(0).integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)
    boxes = inf.detect_face_tracks(s3fd_params, frames,
                                   PreprocessConfig(face_det_batch_size=4))
    assert boxes.shape == (6, 4)
    assert np.isfinite(boxes).all()


def test_lipsync_video_end_to_end(tiny_models, tmp_path):
    gen_params, s3fd_params = tiny_models
    face = _face_video(tmp_path)
    audio = _speech_wav(tmp_path)
    out = str(tmp_path / "result.mp4")
    res = inf.lipsync_video(
        gen_params, s3fd_params, face, audio, out,
        GanConfig(model_width=0.125),
        pre_cfg=PreprocessConfig(face_det_batch_size=4, gen_batch_size=4),
        model_width=0.125,
    )
    assert os.path.exists(out)
    assert res.frames.ndim == 4 and res.frames.dtype == np.uint8
    assert res.boxes.shape == (len(res.frames), 4)
    # output video is readable
    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (128, 128, 3)
