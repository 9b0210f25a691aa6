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


def test_detect_face_tracks_pads_and_nosmooth(tiny_models):
    """pads (pady1,pady2,padx1,padx2) expand the box like inference.py:89-98
    (default [0,10,0,0] pads the chin); nosmooth skips T=5 smoothing."""
    _, s3fd_params = tiny_models
    frames = np.random.default_rng(0).integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)
    cfg = PreprocessConfig(face_det_batch_size=4)
    base = inf.detect_face_tracks(s3fd_params, frames, cfg, pads=(0, 0, 0, 0),
                                  nosmooth=True)
    padded = inf.detect_face_tracks(s3fd_params, frames, cfg, pads=(0, 10, 0, 0),
                                    nosmooth=True)
    # y2 grows by 10 (clipped at the frame edge), everything else unchanged
    np.testing.assert_allclose(padded[:, 1], np.minimum(64, base[:, 1] + 10))
    np.testing.assert_allclose(padded[:, 0], base[:, 0])
    np.testing.assert_allclose(padded[:, 2:], base[:, 2:])


def test_prepare_input_frames_knobs(tmp_path):
    face = _face_video(tmp_path, frames=4, size=64)
    # resize_factor halves the resolution (inference.py:205-206)
    frames, fps = inf.prepare_input_frames(face, resize_factor=2)
    assert frames.shape[1:3] == (32, 32)
    # crop is (y1, y2, x1, x2) with -1 = to-the-edge (inference.py:210-214)
    frames, _ = inf.prepare_input_frames(face, crop=(8, 40, 4, -1))
    assert frames.shape[1:3] == (32, 60)
    # rotate: 90 deg clockwise
    base, _ = inf.prepare_input_frames(face)
    rot, _ = inf.prepare_input_frames(face, rotate=True)
    np.testing.assert_array_equal(rot[0], np.rot90(base[0], k=-1))


def test_prepare_input_frames_image(tmp_path):
    """jpg/png input → one static frame at the default fps (inference.py:
    187-189)."""
    img_path = str(tmp_path / "face.png")
    img = np.random.default_rng(0).integers(0, 256, (48, 48, 3), dtype=np.uint8)
    cv2.imwrite(img_path, img[:, :, ::-1])
    frames, fps = inf.prepare_input_frames(img_path)
    assert frames.shape == (1, 48, 48, 3) and fps == 25.0
    np.testing.assert_array_equal(frames[0], img)


def test_generate_frames_int8_static(tiny_models):
    """serve_int8_static: one eager calibration pass then fixed-scale int8
    generation — output close to the float path (same params)."""
    import dataclasses

    gen_params, _ = tiny_models
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([8.0, 56.0, 8.0, 56.0], np.float32), (4, 1))
    mels = rng.standard_normal((4, 80, 16)).astype(np.float32)
    cfg = GanConfig(model_width=0.125)
    pre = PreprocessConfig(gen_batch_size=4)
    f = inf.generate_frames(gen_params, frames, boxes, mels, cfg, pre,
                            model_width=0.125)
    q = inf.generate_frames(
        gen_params, frames, boxes, mels,
        dataclasses.replace(cfg, serve_int8=True, serve_int8_static=True),
        pre, model_width=0.125)
    assert q.shape == f.shape and q.dtype == np.uint8
    # uint8 frames: int8 quantization error stays small vs the float path
    assert float(np.mean(np.abs(q.astype(np.float32) - f.astype(np.float32)))) < 8.0
