"""Host-side media IO: video decode, wav IO, ffmpeg gating.

The CPU/host↔device boundary (SURVEY.md §7 hard part #1): mp4 decode
cannot run on TPU, so this module is the *only* place that touches
OpenCV/ffmpeg, and it produces fixed-shape uint8 numpy batches for the
device pipelines. Replaces the reference's scattered cv2.VideoCapture
loops (lipreading/get_data.py:37-49, gan-model/inference.py:192-215,
video-generation decord reads at dataset.py:84-101).

ffmpeg (used by the reference for wav extraction + muxing,
preprocess.py:98-101, inference.py:219-224,278-279) is gated on
availability; wav IO itself is scipy.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional, Tuple

import cv2
import numpy as np
from scipy.io import wavfile

FFMPEG = shutil.which("ffmpeg")


def read_video_frames(
    path: str,
    max_frames: Optional[int] = None,
    resize: Optional[Tuple[int, int]] = None,
    to_rgb: bool = True,
) -> Tuple[np.ndarray, float]:
    """Decode a video into (T, H, W, 3) uint8 + fps. cv2 yields BGR; we
    return RGB by default (the framework-wide channel order)."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {path!r}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if resize is not None:
            frame = cv2.resize(frame, (resize[1], resize[0]))
        if to_rgb:
            frame = frame[:, :, ::-1]
        frames.append(frame)
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path!r}")
    return np.stack(frames), float(fps)


def video_frame_count(path: str) -> int:
    cap = cv2.VideoCapture(path)
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def write_video(path: str, frames: np.ndarray, fps: float = 25.0) -> None:
    """(T, H, W, 3) RGB uint8 → video file (cv2 VideoWriter, DIVX like
    inference.py:272-274 when writing .avi; mp4v for .mp4)."""
    t, h, w, _ = frames.shape
    fourcc = cv2.VideoWriter_fourcc(*("DIVX" if path.endswith(".avi") else "mp4v"))
    out = cv2.VideoWriter(path, fourcc, fps, (w, h))
    for f in frames:
        out.write(np.ascontiguousarray(f[:, :, ::-1]))
    out.release()


def load_wav(path: str, target_sr: int = 16000) -> np.ndarray:
    """wav → float32 mono in [-1, 1] at target_sr (linear resample if
    needed). The librosa.core.load analog (audio_utils.py:23-25)."""
    sr, data = wavfile.read(path)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if np.issubdtype(data.dtype, np.integer):
        data = data.astype(np.float32) / float(np.iinfo(data.dtype).max)
    else:
        data = data.astype(np.float32)
    if sr != target_sr:
        n_out = int(round(len(data) * target_sr / sr))
        x_old = np.linspace(0.0, 1.0, len(data), endpoint=False)
        x_new = np.linspace(0.0, 1.0, n_out, endpoint=False)
        data = np.interp(x_new, x_old, data).astype(np.float32)
    return data


def save_wav(path: str, wav: np.ndarray, sr: int = 16000) -> None:
    """float wav → int16 file with peak rescale (audio_utils.py:27-30)."""
    scaled = wav * (32767 / max(0.01, float(np.max(np.abs(wav)))))
    wavfile.write(path, sr, scaled.astype(np.int16))


def extract_audio(video_path: str, wav_path: str, sr: int = 16000) -> bool:
    """mp4 → wav via ffmpeg when available (inference.py:219-224's
    ``ffmpeg -i video -acodec pcm_s16le``); otherwise look for a sidecar
    ``.wav`` next to the video. Returns success."""
    sidecar = os.path.splitext(video_path)[0] + ".wav"
    if os.path.exists(sidecar):
        if os.path.abspath(sidecar) != os.path.abspath(wav_path):
            shutil.copyfile(sidecar, wav_path)
        return True
    if FFMPEG is None:
        return False
    cmd = [FFMPEG, "-y", "-i", video_path, "-ac", "1", "-ar", str(sr),
           "-acodec", "pcm_s16le", "-loglevel", "error", wav_path]
    return subprocess.run(cmd, check=False).returncode == 0


def mux_audio(video_path: str, wav_path: str, out_path: str) -> bool:
    """Remux generated video with audio (inference.py:278-279). Without
    ffmpeg — or if the mux command fails — the silent video is copied to
    ``out_path`` so an output artifact always exists, and False returned."""
    if FFMPEG is None:
        shutil.copyfile(video_path, out_path)
        return False
    cmd = [FFMPEG, "-y", "-i", wav_path, "-i", video_path, "-strict", "-2",
           "-q:v", "1", "-loglevel", "error", out_path]
    if subprocess.run(cmd, check=False).returncode == 0:
        return True
    shutil.copyfile(video_path, out_path)
    return False
