"""Offline dataset preprocessing: videos → per-clip face-crop frames + wav.

Capability target: gan-model/preprocessing/preprocess.py:42-118 and
preprocess_audio_video.py:33-82 — read each LRS2 clip, S3FD-detect the face
per frame, save crops as ``{i}.jpg`` plus ``audio.wav`` into
``preprocessed_root/<speaker>/<clip>/``; plus the frame-index builder of
video-generation/preprocessing/extract_video_frames.py.

Parallelism redesign (SURVEY.md §2.5): the reference round-robins clips
over one S3FD replica per GPU via ThreadPoolExecutor (preprocess.py:
36-37,100-103). Here a single TPU does detection **batched across the
whole clip** (one device program per clip instead of per frame), and
multi-host scale-out is per-host sharding of the clip list
(``shard_for_host``) — each host feeds its own devices, no collectives
needed for this embarrassingly-parallel stage.
"""
from __future__ import annotations

import os
import traceback
from typing import List, Optional, Sequence, Tuple

import cv2

from ..core.config import PreprocessConfig
from ..data import video as video_io
from ..data.manifest import ClipRecord


def shard_for_host(items: Sequence, host_id: int, num_hosts: int) -> List:
    """Per-host slice of the work list — the multi-process analog of the
    reference's ``i % ngpu`` round-robin (preprocess.py:100-103)."""
    return [it for i, it in enumerate(items) if i % num_hosts == host_id]


def process_clip(
    s3fd_params,
    record: ClipRecord,
    out_root: str,
    cfg: PreprocessConfig = PreprocessConfig(),
    crop_pad: int = 0,
) -> Optional[str]:
    """One clip: decode → batched face detect → save crops + audio.

    Returns the output dir, or None on failure (logged, not raised — the
    blanket try/except of preprocess.py:86-93 becomes an explicit contract).
    """
    from .inference import detect_face_tracks

    try:
        frames, fps = video_io.read_video_frames(record.video_path)
        boxes = detect_face_tracks(s3fd_params, frames, cfg)  # (T,4) y1y2x1x2
        out_dir = os.path.join(out_root, record.clip_id)
        os.makedirs(out_dir, exist_ok=True)
        h, w = frames.shape[1:3]
        for i, (frame, box) in enumerate(zip(frames, boxes)):
            y1 = max(0, int(box[0]) - crop_pad)
            y2 = min(h, int(box[1]) + crop_pad)
            x1 = max(0, int(box[2]) - crop_pad)
            x2 = min(w, int(box[3]) + crop_pad)
            crop = frame[y1:y2, x1:x2]
            cv2.imwrite(os.path.join(out_dir, f"{i}.jpg"), crop[:, :, ::-1])
        wav_path = os.path.join(out_dir, "audio.wav")
        video_io.extract_audio(record.video_path, wav_path)
        # transcript sidecar for the text-conditioned lipreading-expert loss
        # (Dataset_Lip reads it from the source dir at train time,
        # dataset_lip_reading.py:161-164; baking it into the clip dir keeps
        # preprocessed datasets self-contained)
        if record.transcript_path and os.path.exists(record.transcript_path):
            from ..data.manifest import parse_transcript

            text, _ = parse_transcript(record.transcript_path)
            if text:
                with open(os.path.join(out_dir, "text.txt"), "w") as f:
                    f.write(text.lower() + "\n")
        return out_dir
    except Exception:
        traceback.print_exc()
        return None


def preprocess_dataset(
    s3fd_params,
    records: Sequence[ClipRecord],
    out_root: str,
    cfg: PreprocessConfig = PreprocessConfig(),
    host_id: int = 0,
    num_hosts: int = 1,
) -> Tuple[int, int]:
    """Process this host's shard of the dataset. Returns (ok, failed)."""
    ok = failed = 0
    for rec in shard_for_host(records, host_id, num_hosts):
        if process_clip(s3fd_params, rec, out_root, cfg) is None:
            failed += 1
        else:
            ok += 1
    return ok, failed
