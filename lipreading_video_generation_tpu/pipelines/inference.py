"""Lip-sync video inference: face track → generate → paste back → mux.

Capability target: gan-model/inference.py:183-279 — read video frames,
extract audio → mel, chunk mels at 80/fps steps with 16-wide windows
(:233-244), S3FD face detection with temporal box smoothing T=5 (:61-68,
70-108), batched masked+reference 6-channel generator inputs (:110-156),
no-grad generation, paste-back into the full frames (:267-274), audio mux
(:278-279).

TPU pipeline shape: host decodes frames once; face detection, crop/resize,
mel chunking, generation, and ROI paste-back run as batched jitted device
programs; only the final video encode + mux return to host. The OOM-halving
retry (:76-87) is unnecessary — batch sizes are static and chosen up front.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import AudioConfig, GanConfig, PreprocessConfig
from ..models.generator import TalkingFaceGenerator
from ..models.s3fd import S3FD, detect_faces
from ..ops import audio as audio_ops
from ..ops import image as image_ops
from ..data import video as video_io


@dataclasses.dataclass
class InferenceResult:
    frames: np.ndarray          # (T, H, W, 3) uint8 output frames
    boxes: np.ndarray           # (T, 4) face boxes used
    muxed: bool                 # audio remux success


def detect_face_tracks(
    s3fd_params,
    frames: np.ndarray,
    cfg: PreprocessConfig = PreprocessConfig(),
    pads: tuple = (0, 0, 0, 0),
    nosmooth: bool = False,
) -> np.ndarray:
    """Batched S3FD over all frames → smoothed (T, 4) boxes (y1, y2, x1, x2).

    face_detect + get_smoothened_boxes (inference.py:61-108). Frames with no
    detection inherit the previous frame's box (the reference hard-errors,
    inference.py:92-94; tracking through dropouts is strictly better).
    ``pads`` = (pady1, pady2, padx1, padx2). Padding is a GAN-inference-only
    knob in the reference (inference.py:33-34, 89-98, default [0, 10, 0, 0]
    — ``lipsync_video`` passes that); training preprocessing and the
    lipreading ROI path use unpadded boxes, so the default here is zero.
    ``nosmooth`` skips the T=5 box smoothing (:103).
    """
    model = S3FD()
    t = len(frames)
    bs = cfg.face_det_batch_size
    all_boxes = []
    all_valid = []
    bgr = frames[..., ::-1].astype(np.float32)
    for i in range(0, t, bs):
        chunk = bgr[i : i + bs]
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        boxes, scores, valid = detect_faces(
            model, s3fd_params, jnp.asarray(chunk),
            score_threshold=cfg.face_det_score_threshold,
            nms_threshold=cfg.nms_threshold,
        )
        boxes, valid = np.asarray(boxes), np.asarray(valid)
        n = len(frames[i : i + bs])
        all_boxes.append(boxes[:n, 0])   # best face per frame
        all_valid.append(valid[:n, 0])
    boxes = np.concatenate(all_boxes)    # (T, 4) x1y1x2y2
    valid = np.concatenate(all_valid)
    # carry-forward fill for undetected frames
    last = None
    for i in range(t):
        if valid[i]:
            last = boxes[i]
        elif last is not None:
            boxes[i] = last
    first_valid = np.argmax(valid) if valid.any() else None
    if first_valid is None:
        h, w = frames.shape[1:3]
        boxes[:] = [0, 0, w - 1, h - 1]
    else:
        boxes[:first_valid] = boxes[first_valid]
    # pads, clipped to the frame (inference.py:89-98)
    h, w = frames.shape[1:3]
    pady1, pady2, padx1, padx2 = pads
    x1 = np.maximum(0, boxes[:, 0] - padx1)
    y1 = np.maximum(0, boxes[:, 1] - pady1)
    x2 = np.minimum(w, boxes[:, 2] + padx2)
    y2 = np.minimum(h, boxes[:, 3] + pady2)
    # x1y1x2y2 → y1 y2 x1 x2 and temporal smoothing (inference.py:61-68)
    yx = np.stack([y1, y2, x1, x2], axis=1).astype(np.float32)
    if nosmooth:
        return yx
    return np.asarray(image_ops.smooth_boxes(jnp.asarray(yx), cfg.box_smooth_T))


def _mel_chunks(mel: jnp.ndarray, num_frames: int, fps: float, audio_cfg: AudioConfig,
                mel_step: int = 16) -> jnp.ndarray:
    """(80, T_mel) → (num_frames, 80, 16) aligned windows, wrapping the
    frame index like the reference's idx loop (inference.py:233-244)."""
    starts = jnp.arange(num_frames, dtype=jnp.float32)
    return audio_ops.mel_windows(
        mel, starts, fps, mel_step, audio_cfg.sample_rate, audio_cfg.hop_size
    )


def paste_back(frame: jax.Array, roi: jax.Array, box: jax.Array) -> jax.Array:
    """Resize generated ROI to the face box and paste into the full frame —
    the emb_roi2im/paste step (inference.py:267-271) as a jit-safe
    scatter-style composite with traced box coordinates."""
    H, W = frame.shape[0], frame.shape[1]
    y1, y2, x1, x2 = box[0], box[1], box[2], box[3]
    # sample the ROI at every full-frame pixel that falls inside the box
    ys = (jnp.arange(H, dtype=jnp.float32) - y1) / jnp.maximum(y2 - y1, 1.0) * roi.shape[0] - 0.5
    xs = (jnp.arange(W, dtype=jnp.float32) - x1) / jnp.maximum(x2 - x1, 1.0) * roi.shape[1] - 0.5
    resized = image_ops._bilinear_sample(roi.astype(jnp.float32), ys, xs)
    row = jnp.arange(H, dtype=jnp.float32)[:, None, None]
    col = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    inside = (row >= y1) & (row < y2) & (col >= x1) & (col < x2)
    return jnp.where(inside, resized, frame.astype(jnp.float32))


def prepare_input_frames(
    face_path: str,
    resize_factor: int = 1,
    rotate: bool = False,
    crop: tuple = (0, -1, 0, -1),
    default_fps: float = 25.0,
) -> tuple:
    """Read + condition the input frames exactly like the reference's main()
    (inference.py:186-215): image files become a single static frame at
    ``default_fps``; video frames are downscaled by ``resize_factor``,
    optionally rotated 90° clockwise, then cropped by (y1, y2, x1, x2)
    with −1 meaning "to the edge"."""
    import cv2

    ext = face_path.rsplit(".", 1)[-1].lower()
    if ext in ("jpg", "png", "jpeg"):
        img = cv2.imread(face_path)
        if img is None:
            raise FileNotFoundError(f"cannot read image {face_path!r}")
        frames, fps = img[None, :, :, ::-1], default_fps
    else:
        frames, fps = video_io.read_video_frames(face_path)
    if resize_factor > 1:
        h, w = frames.shape[1] // resize_factor, frames.shape[2] // resize_factor
        frames = np.stack([cv2.resize(f, (w, h)) for f in frames])
    if rotate:
        frames = np.rot90(frames, k=-1, axes=(1, 2)).copy()
    y1, y2, x1, x2 = crop
    if y2 == -1:
        y2 = frames.shape[1]
    if x2 == -1:
        x2 = frames.shape[2]
    frames = frames[:, y1:y2, x1:x2]
    return frames, fps


def gen_input_prep(frames_f: jax.Array, boxes: jax.Array, img: int):
    """Crop faces → masked-window + reference 6-ch generator input — the
    ONE definition of the generator's input prep (reference
    datagen semantics, inference.py:123-156). Shared by ``lipsync_batch``,
    the static-int8 calibration pass, and the serving bench so calibrated
    activation scales can never drift from the program they calibrate."""
    crops = jax.vmap(
        lambda f, b: image_ops.crop_and_resize(f, b, (img, img))
    )(frames_f, boxes)
    faces = crops / 255.0
    masked = image_ops.mask_lower_half(faces)
    return image_ops.concat_reference(masked, faces)


def lipsync_batch(
    gen,                         # TalkingFaceGenerator module
    params,
    frames_u8: jax.Array,        # (B, H, W, 3) input frames
    boxes: jax.Array,            # (B, 4) y1y2x1x2 face boxes
    mels: jax.Array,             # (B, 80, 16) aligned mel chunks
    img: int,                    # generator face size (gan_cfg.img_size)
    int8: bool = False,          # int8 generator matmuls (ops/quant.py)
    act_scales=None,             # calibrated static activation scales
                                 # (ops/quant.calibrate_activation_scales) —
                                 # drops the per-op dynamic reductions
) -> jax.Array:
    """One generation batch as a single device program: crop faces →
    mask/concat-reference input prep → generator → paste back into the
    full frames (the reference's datagen + model + emb_roi2im chain,
    inference.py:110-156, 261-274). Shared by serving
    (``generate_frames``) and the serving benchmark so the benched program
    IS the production program."""
    frames_f = frames_u8.astype(jnp.float32)
    x = gen_input_prep(frames_f, boxes, img)  # ref = current frame (inference.py:123-156)
    if int8:
        from ..ops.quant import int8_serving

        with int8_serving(act_scales):
            g = gen.apply({"params": params}, mels[..., None], x)
    else:
        g = gen.apply({"params": params}, mels[..., None], x)
    out = jax.vmap(paste_back)(frames_f, g * 255.0, boxes)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def generate_frames(
    gen_params,
    frames_seq: np.ndarray,      # (N, H, W, 3) uint8 input frames
    boxes: np.ndarray,           # (N, 4) y1y2x1x2 face boxes
    mel_windows: np.ndarray,     # (N, 80, 16) aligned mel chunks
    gan_cfg: GanConfig = GanConfig(),
    pre_cfg: PreprocessConfig = PreprocessConfig(),
    model_width: float = 1.0,
    mesh_spec=None,
) -> np.ndarray:
    """Generate + paste back every output frame as ONE device program,
    data-parallel over the mesh (the serving analog of the trainers' mesh
    wiring): the per-step batch axis shards over the ``data`` axis, params
    place through the ``shard_params`` policy, and ``lax.map`` runs the
    step-stacked batches in a single dispatch. On one chip this degenerates
    to the single-device program; the reference instead loops 128-frame
    batches through one GPU (gan-model/inference.py:261-265).
    """
    from ..core.config import MeshConfig
    from ..parallel.mesh import (
        build_mesh,
        pad_to_multiple,
        shard_params,
        shard_stacked_batch,
    )

    spec = mesh_spec or build_mesh(MeshConfig())
    num_out = len(frames_seq)
    if num_out == 0:
        return np.zeros((0,) + frames_seq.shape[1:], np.uint8)
    gen = TalkingFaceGenerator(width=model_width)
    img = gan_cfg.img_size

    act_scales = None
    if gan_cfg.serve_int8 and gan_cfg.serve_int8_static:
        # one-time eager calibration: records per-module max-|activation| so
        # the jitted program below uses fixed scales (no runtime
        # reductions). Frames are sampled EVENLY ACROSS the video (not just
        # the opening batch — brightness/content drift on later frames
        # would silently clip, ADVICE r4) and the scales carry a small
        # headroom factor for activations between the sampled frames.
        from ..ops import quant

        n_cal = min(pre_cfg.gen_batch_size, num_out)
        cal_idx = np.unique(np.linspace(0, num_out - 1, n_cal).astype(np.int64))
        x_cal = gen_input_prep(
            jnp.asarray(frames_seq[cal_idx]).astype(jnp.float32),
            jnp.asarray(boxes[cal_idx]), img)
        mel_cal = jnp.asarray(mel_windows[cal_idx])[..., None]
        act_scales = quant.calibrate_activation_scales(
            lambda m, xx: gen.apply({"params": gen_params}, m, xx),
            [(mel_cal, x_cal)])
        act_scales = jax.tree_util.tree_map(lambda s: s * 1.05, act_scales)

    def gen_batch(params, frames_u8, boxes_b, mels):
        return lipsync_batch(gen, params, frames_u8, boxes_b, mels, img,
                             int8=gan_cfg.serve_int8, act_scales=act_scales)

    # one device program for the whole video: pad to a batch multiple and
    # lax.map over step-stacked batches — a single dispatch + single host
    # fetch instead of one round trip per 128-frame batch
    bs = pad_to_multiple(min(pre_cfg.gen_batch_size, num_out), spec.data_size)
    n_pad = (-num_out) % bs
    fb = np.concatenate([frames_seq, np.repeat(frames_seq[-1:], n_pad, 0)])
    bb = np.concatenate([boxes, np.repeat(boxes[-1:], n_pad, 0)])
    mb = np.concatenate([np.asarray(mel_windows),
                         np.repeat(np.asarray(mel_windows[-1:]), n_pad, 0)])
    nb = len(fb) // bs
    stacked = (
        fb.reshape((nb, bs) + fb.shape[1:]),
        bb.reshape(nb, bs, 4),
        mb.reshape((nb, bs) + mb.shape[1:]),
    )

    @jax.jit
    def gen_all(params, batches):
        return jax.lax.map(lambda args: gen_batch(params, *args), batches)

    with spec.mesh:
        params = shard_params(spec, gen_params)
        batches = shard_stacked_batch(spec, stacked)
        out = gen_all(params, batches)
    return np.asarray(out).reshape((-1,) + frames_seq.shape[1:])[:num_out]


def lipsync_video(
    gen_params,
    s3fd_params,
    face_video: str,
    audio_path: str,
    out_path: str,
    gan_cfg: GanConfig = GanConfig(),
    audio_cfg: AudioConfig = AudioConfig(),
    pre_cfg: PreprocessConfig = PreprocessConfig(),
    static_frame: bool = False,
    model_width: float = 1.0,
    pads: tuple = (0, 10, 0, 0),
    resize_factor: int = 1,
    crop: tuple = (0, -1, 0, -1),
    rotate: bool = False,
    nosmooth: bool = False,
    mesh_spec=None,
) -> InferenceResult:
    """End-to-end lip-sync (main, inference.py:183-279), with the
    reference's full knob set (:30-52): pads / resize_factor / crop /
    rotate / nosmooth / static."""
    frames, fps = prepare_input_frames(face_video, resize_factor, rotate, crop)
    if static_frame or len(frames) == 1:
        frames = np.repeat(frames[:1], max(len(frames), 1), 0)
    if not audio_path.endswith(".wav"):
        # ffmpeg wav extraction (inference.py:219-224) into a managed temp
        import os
        import tempfile

        fd, tmp_wav = tempfile.mkstemp(suffix=".wav")
        os.close(fd)
        try:
            if not video_io.extract_audio(audio_path, tmp_wav, audio_cfg.sample_rate):
                raise ValueError(
                    f"cannot extract audio from {audio_path!r} (no ffmpeg and no sidecar .wav)"
                )
            wav = video_io.load_wav(tmp_wav, audio_cfg.sample_rate)
        finally:
            os.unlink(tmp_wav)
    else:
        wav = video_io.load_wav(audio_path, audio_cfg.sample_rate)
    mel = audio_ops.melspectrogram(jnp.asarray(wav), audio_cfg)
    if not np.isfinite(np.asarray(mel)).all():
        raise ValueError("mel contains NaN/inf (inference.py:230 guard)")

    # number of output frames = audio length at video fps (reference loops
    # mel chunks and wraps frames; we cap at frame count and wrap frames)
    num_out = int(np.asarray(mel).shape[-1] / audio_cfg.mel_step_per_frame / 25.0 * fps)
    num_out = max(1, min(num_out, int(len(wav) / audio_cfg.sample_rate * fps)))
    frame_ids = np.arange(num_out) % len(frames)
    frames_seq = frames[frame_ids]

    boxes = detect_face_tracks(s3fd_params, frames_seq, pre_cfg,
                               pads=pads, nosmooth=nosmooth)

    mel_windows = _mel_chunks(mel, num_out, fps, audio_cfg)  # (N, 80, 16)

    result = generate_frames(
        gen_params, frames_seq, np.asarray(boxes), np.asarray(mel_windows),
        gan_cfg, pre_cfg, model_width, mesh_spec=mesh_spec,
    )

    import os

    tmp_video = out_path + ".silent.mp4"
    wav_tmp = out_path + ".wav"
    try:
        video_io.write_video(tmp_video, result, fps)
        video_io.save_wav(wav_tmp, wav, audio_cfg.sample_rate)
        muxed = video_io.mux_audio(tmp_video, wav_tmp, out_path)
    finally:
        for p in (tmp_video, wav_tmp):
            if os.path.exists(p) and p != out_path:
                os.unlink(p)
    return InferenceResult(frames=result, boxes=boxes, muxed=muxed)
