"""Dataset samplers: fixed-shape numpy batches for the device pipelines.

Host-side analogs of the reference's torch Datasets, with the idiom shifts
from SURVEY.md §7: deterministic PRNG-seeded sampling instead of
``while 1`` resample-on-failure loops (gan-model/preprocessing/
dataset.py:106-155), validated manifests, and **device-side** heavy
preprocessing — the host only decodes and windows uint8 frames; resize /
normalize / mel / masking happen under jit in the train step.

Also includes synthetic-data factories used by tests and benchmarks: the
environment (like CI) has no LRS2 tree, and the model/bench behavior is
shape-driven.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .video import load_wav, read_video_frames


# ---------------------------------------------------------------------------
# FrameItem index (video-generation/preprocessing/extract_video_frames.py)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FrameItem:
    """(video_path, frame_start, frame_end) — diffusion frame-pair record
    (video-generation/dataset.py:43-47)."""

    video_path: str
    frame_start: int
    frame_end: int


def build_frame_index(
    video_paths: Sequence[str],
    step: int = 6,
    fps_effective: float = 30.0,
) -> List[FrameItem]:
    """Scan videos → frame-pair records at an effective stride, the
    extract_video_frames.py:15-111 equivalent (arrays, not pickles — but a
    pickle writer is provided for interop)."""
    from .video import video_frame_count

    items: List[FrameItem] = []
    for path in video_paths:
        n = video_frame_count(path)
        for start in range(0, max(0, n - step), step):
            items.append(FrameItem(path, start, start + step))
    return items


def save_frame_index(items: Sequence[FrameItem], path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump([(it.video_path, it.frame_start, it.frame_end) for it in items], f)


def load_frame_index(path: str) -> List[FrameItem]:
    with open(path, "rb") as f:
        raw = pickle.load(f)
    out = []
    for item in raw:
        if isinstance(item, FrameItem):
            out.append(item)
        elif isinstance(item, (tuple, list)):
            out.append(FrameItem(*item))
        else:  # objects from the reference's pickles
            out.append(FrameItem(item.video_path, item.frame_start, item.frame_end))
    return out


def split_records(
    items: Sequence, train: float = 0.8, val: float = 0.1, seed: int = 0
) -> Tuple[list, list, list]:
    """Deterministic 80/10/10 split (video-generation/dataset.py:231-243)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(items))
    n_train = int(train * len(items))
    n_val = int(val * len(items))
    pick = lambda ids: [items[i] for i in ids]
    return (
        pick(idx[:n_train]),
        pick(idx[n_train : n_train + n_val]),
        pick(idx[n_train + n_val :]),
    )


# ---------------------------------------------------------------------------
# GAN window dataset (gan-model/preprocessing/dataset.py:20-171)
# ---------------------------------------------------------------------------

@dataclass
class GanClip:
    """One preprocessed clip: face-crop frames + raw waveform (+ optional
    transcript for the text-conditioned lipreading-expert loss, the
    Dataset_Lip variant — dataset_lip_reading.py:161-164)."""

    frames: np.ndarray  # (T, H, W, 3) uint8 face crops
    wav: np.ndarray     # float32 @ 16 kHz
    text: Optional[str] = None


class GanWindowSampler:
    """Samples {window, wrong_window, start_frame} batches.

    Semantics of Dataset.__getitem__ (dataset.py:106-168): a random clip, a
    random ``syncnet_T``-frame window plus an independent "wrong" reference
    window from the same clip; mel cropping / resizing / masking happen on
    device (ops/audio.mel_windows, ops/image.mask_lower_half). Failure
    handling is up-front validation, not resampling.

    With ``with_text=True`` batches also carry ``text_tokens`` — the clip's
    transcript as PAD-padded char ids (Dataset_Lip's text return,
    dataset_lip_reading.py:161-164), consumed by the GAN's text-conditioned
    expert loss.
    """

    def __init__(self, clips: Sequence[GanClip], syncnet_T: int = 5, seed: int = 0,
                 with_text: bool = False, max_text_len: int = 48):
        self.clips = [c for c in clips if len(c.frames) >= 3 * syncnet_T]
        if not self.clips:
            raise ValueError("no clip long enough for windowed sampling")
        self.T = syncnet_T
        self.rng = np.random.default_rng(seed)
        self.with_text = with_text
        self.max_text_len = max_text_len

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        from ..models.lip_expert import encode_transcript

        windows, wrongs, starts, wavs, tokens = [], [], [], [], []
        max_wav = max(len(c.wav) for c in self.clips)
        for _ in range(batch_size):
            clip = self.clips[self.rng.integers(len(self.clips))]
            n = len(clip.frames)
            start = int(self.rng.integers(0, n - self.T + 1))
            wrong = int(self.rng.integers(0, n - self.T + 1))
            while wrong == start and n > self.T:
                wrong = int(self.rng.integers(0, n - self.T + 1))
            windows.append(clip.frames[start : start + self.T])
            wrongs.append(clip.frames[wrong : wrong + self.T])
            starts.append(start)
            wavs.append(np.pad(clip.wav, (0, max_wav - len(clip.wav))))
            if self.with_text:
                tokens.append(encode_transcript(clip.text or "", self.max_text_len))
        batch = {
            "window": np.stack(windows),          # (B, T, H, W, 3) uint8
            "wrong_window": np.stack(wrongs),     # (B, T, H, W, 3) uint8
            "start_frame": np.asarray(starts, np.int32),
            "wav": np.stack(wavs).astype(np.float32),
        }
        if self.with_text:
            batch["text_tokens"] = np.stack(tokens)
        return batch


def load_gan_clip(frames_dir: str, img_size: Optional[int] = None) -> GanClip:
    """Read a preprocessed clip dir of ``{i}.jpg`` + ``audio.wav`` — the
    layout written by gan-model/preprocessing/preprocess.py:42-76."""
    import cv2

    names = sorted(
        (f for f in os.listdir(frames_dir) if f.endswith(".jpg")),
        key=lambda f: int(os.path.splitext(f)[0]),
    )
    frames = []
    for name in names:
        img = cv2.imread(os.path.join(frames_dir, name))[:, :, ::-1]
        if img_size is not None:
            img = cv2.resize(img, (img_size, img_size))
        frames.append(img)
    wav = load_wav(os.path.join(frames_dir, "audio.wav"))
    # optional transcript sidecar (the Dataset_Lip text,
    # dataset_lip_reading.py:161-164; written by offline preprocessing when
    # the source LRS2 .txt exists)
    text = None
    text_path = os.path.join(frames_dir, "text.txt")
    if os.path.exists(text_path):
        with open(text_path) as f:
            text = f.readline().strip().lower()
    return GanClip(np.stack(frames), wav, text=text)


# ---------------------------------------------------------------------------
# Diffusion frame-pair dataset (video-generation/dataset.py:84-136)
# ---------------------------------------------------------------------------

class DiffusionPairSampler:
    """FrameItem → (cond frame 0, target frame_end, aligned audio slice).

    Audio window: ``buffer_frames`` frames before the target at the video
    fps, padded/truncated to ``audio_samples`` @16 kHz (dataset.py:51-66,
    125); the reference's 300 Hz high-pass + mean/std normalize
    (dataset.py:30-41) runs on device in the train step (ops level).
    """

    def __init__(
        self,
        items: Sequence[FrameItem],
        audio_samples: int = 4000,
        buffer_frames: int = 5,
        fps: float = 25.0,
        seed: int = 0,
        cache_size: int = 64,
    ):
        self.items = list(items)
        self.audio_samples = audio_samples
        self.buffer_frames = buffer_frames
        self.fps = fps
        self.rng = np.random.default_rng(seed)
        self._cache: Dict[str, Tuple[np.ndarray, np.ndarray, float]] = {}
        self._cache_size = cache_size

    def _load(self, path: str):
        if path not in self._cache:
            if len(self._cache) >= self._cache_size:
                self._cache.pop(next(iter(self._cache)))
            frames, fps = read_video_frames(path)
            wav_path = os.path.splitext(path)[0] + ".wav"
            wav = load_wav(wav_path) if os.path.exists(wav_path) else np.zeros(16000, np.float32)
            self._cache[path] = (frames, wav, fps)
        return self._cache[path]

    def get(self, item: FrameItem) -> Dict[str, np.ndarray]:
        frames, wav, fps = self._load(item.video_path)
        t_end = min(item.frame_end, len(frames) - 1)
        cond = frames[min(item.frame_start, len(frames) - 1)]
        target = frames[t_end]
        # audio slice: buffer_frames before target (dataset.py:51-66)
        sr = 16000
        start_s = max(0.0, (t_end - self.buffer_frames) / fps)
        start = int(start_s * sr)
        sl = wav[start : start + self.audio_samples]
        sl = np.pad(sl, (0, self.audio_samples - len(sl)))
        return {"cond_frame": cond, "target_frame": target, "audio": sl.astype(np.float32)}

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        picks = self.rng.integers(0, len(self.items), batch_size)
        rows = [self.get(self.items[i]) for i in picks]
        return {k: np.stack([r[k] for r in rows]) for k in rows[0]}


def condition_from_video(
    video_path: str,
    cfg,
    audio_path: Optional[str] = None,
    frame_step: int = 6,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cond_frame uint8, audio float32) conditioning pair from a real clip
    for the sampling CLI — the analog of the reference picking dataset item
    5000 (test.py:131-148): condition = the clip's first frame; audio = the
    ``buffer_frames`` window before the target frame (frame_start +
    frame_step, extract_video_frames.py:60-76's pair step), padded/truncated
    to ``audio_samples`` like TalkingFaceFrameDataset (dataset.py:51-66)."""
    frames, fps = read_video_frames(video_path)
    cond = frames[0]
    target_idx = min(frame_step, len(frames) - 1)
    wav = _clip_audio(video_path, audio_path)
    sl = _audio_window(wav, target_idx, fps, cfg)
    return cond, sl


def _clip_audio(video_path: str, audio_path: Optional[str] = None,
                sr: int = 16000) -> np.ndarray:
    """Full waveform for a clip: explicit wav, sidecar wav, or ffmpeg
    extraction — the reference's preprocess_audio path (inference.py:219-224)."""
    if audio_path is not None:
        return load_wav(audio_path, sr)
    sidecar = os.path.splitext(video_path)[0] + ".wav"
    if os.path.exists(sidecar):
        return load_wav(sidecar, sr)
    import tempfile

    from .video import extract_audio

    # managed temp in a writable dir — the source tree may be read-only
    fd, tmp = tempfile.mkstemp(suffix=".wav")
    os.close(fd)
    try:
        if extract_audio(video_path, tmp, sr):
            return load_wav(tmp, sr)
    finally:
        os.unlink(tmp)
    raise ValueError(
        f"no audio for {video_path!r}: pass --cond-audio, add a sidecar "
        ".wav, or install ffmpeg"
    )


def _audio_window(wav: np.ndarray, target_idx: int, fps: float, cfg,
                  sr: int = 16000) -> np.ndarray:
    """The ``buffer_frames``-before-target audio slice, padded to
    ``audio_samples`` (dataset.py:51-66 semantics)."""
    start = int(max(0.0, (target_idx - cfg.buffer_frames) / fps) * sr)
    sl = wav[start : start + cfg.audio_samples]
    return np.pad(sl, (0, cfg.audio_samples - len(sl))).astype(np.float32)


def condition_windows_from_video(
    video_path: str,
    cfg,
    n_frames: int,
    audio_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """(cond frame uint8, per-frame audio windows (n_frames, audio_samples),
    fps) for whole-clip generation: the clip's first frame conditions every
    target frame (the DiffusionPairSampler pairing, dataset.py:105-130) and
    window j is the slice for target frame j — so ``sample_video`` denoises
    the clip's first ``n_frames`` frames in one batched trajectory."""
    frames, fps = read_video_frames(video_path)
    cond = frames[0]
    wav = _clip_audio(video_path, audio_path)
    windows = np.stack([_audio_window(wav, j, fps, cfg) for j in range(n_frames)])
    return cond, windows, fps


def load_full_video_sample(
    video_path: str,
    transcript_path: Optional[str] = None,
    audio_samples_per_frame: int = 640,  # 16 kHz / 25 fps
) -> Dict[str, object]:
    """Full-video sample: all frames + aligned raw audio + transcript —
    the ``TalkingFaceDataset`` variant (video-generation/dataset.py:141-228;
    audio embeddings are produced on device by models.AudioFeatureEncoder
    rather than a baked-in torch Wav2Vec2)."""
    from .manifest import parse_transcript

    frames, fps = read_video_frames(video_path)
    wav_path = os.path.splitext(video_path)[0] + ".wav"
    wav = load_wav(wav_path) if os.path.exists(wav_path) else np.zeros(
        int(len(frames) * audio_samples_per_frame), np.float32)
    text = ""
    if transcript_path and os.path.exists(transcript_path):
        text, _ = parse_transcript(transcript_path)
    return {"frames": frames, "audio": wav, "text": text, "fps": fps}


# ---------------------------------------------------------------------------
# Lipreading word-clip dataset (lipreading/get_data.py:22-60)
# ---------------------------------------------------------------------------

class WordClipSampler:
    """Per-word mouth-ROI windows → fixed (T, H, W) uint8 clips + label ids.

    The host supplies cropped mouth frames (via pipelines/preprocess);
    clips shorter than ``max_frames`` are zero-padded like
    prepare_all_videos (lipreading/feature_extraction.py:60-77).
    """

    def __init__(
        self,
        clips: Sequence[np.ndarray],   # each (t, H, W) or (t, H, W, C) uint8
        labels: Sequence[int],
        max_frames: int = 5,
        seed: int = 0,
    ):
        assert len(clips) == len(labels)
        self.clips = list(clips)
        self.labels = np.asarray(labels, np.int32)
        self.max_frames = max_frames
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.clips)

    def _fix(self, clip: np.ndarray) -> np.ndarray:
        if clip.ndim == 3:
            clip = clip[..., None]
        t = len(clip)
        if t >= self.max_frames:
            return clip[: self.max_frames]
        pad = np.zeros((self.max_frames - t,) + clip.shape[1:], clip.dtype)
        return np.concatenate([clip, pad])

    def batches(self, batch_size: int, shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.arange(len(self.clips))
        if shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx) - batch_size + 1, batch_size):
            pick = idx[i : i + batch_size]
            yield {
                "clips": np.stack([self._fix(self.clips[j]) for j in pick]),
                "labels": self.labels[pick],
            }


# ---------------------------------------------------------------------------
# Synthetic data (tests / benches; no LRS2 in the environment)
# ---------------------------------------------------------------------------

def synthetic_gan_clips(
    n_clips: int = 4, frames: int = 25, img: int = 96, seed: int = 0,
    with_text: bool = False,
) -> List[GanClip]:
    rng = np.random.default_rng(seed)
    words = ["hello", "world", "about", "place", "think", "right"]
    out = []
    for i in range(n_clips):
        f = rng.integers(0, 256, (frames, img, img, 3), dtype=np.uint8)
        wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        text = None
        if with_text:
            text = " ".join(words[int(j)] for j in rng.integers(0, len(words), 3))
        out.append(GanClip(f, wav, text=text))
    return out


def synthetic_av_clips(
    n_clips: int = 6, frames: int = 50, img: int = 96, seed: int = 0,
    sr: int = 16000, fps: float = 25.0, with_text: bool = False,
) -> List[GanClip]:
    """Audio-visually CORRELATED clips: per-frame mouth aperture tracks the
    audio amplitude envelope, so a sync expert trained on them must learn
    the actual audio↔lip correspondence (and can be tested for
    discrimination, not just finite losses). This is the in-framework
    stand-in for real LRS2 clips in the expert-chain proof tests — the role
    the reference's pretrained lipsync_expert.pth plays in gating GAN
    training (gan-model/train_lipreading.py:187-192).

    Construction: a smooth per-frame envelope a_t ∈ (0, 1] drives BOTH the
    waveform (amplitude-modulated tone, per-sample interpolated) and the
    mouth opening (a dark mouth ellipse whose height is ∝ a_t) on a static
    synthetic face. Eyes/face are static so ONLY the mouth carries temporal
    information.
    """
    rng = np.random.default_rng(seed)
    words = ["hello", "world", "about", "place", "think", "right"]
    out = []
    for i in range(n_clips):
        env = rng.uniform(0.05, 1.0, frames)
        env = np.convolve(env, [0.25, 0.5, 0.25], mode="same")
        env = env / env.max()
        wav = _formant_wave(env, sr=sr, fps=fps, f0=110.0 + 13.0 * i)
        f = _render_face_clip(env, img, rng)
        text = None
        if with_text:
            text = " ".join(words[int(j)] for j in rng.integers(0, len(words), 3))
        out.append(GanClip(f, wav, text=text))
    return out


def _formant_wave(env: np.ndarray, sr: int = 16000, fps: float = 25.0,
                  f0: float = 110.0) -> np.ndarray:
    """Envelope → waveform: a harmonic stack whose SPECTRAL CENTROID
    (formant-like peak) tracks the per-frame envelope, plus amplitude
    modulation. Mouth aperture ↔ formant frequency is the physically-
    sensible coupling, and a spectral-PATTERN cue survives the per-sample
    normalization inside the towers (GroupNorm) that an amplitude-only cue
    does not."""
    frames = len(env)
    spf = int(sr / fps)
    t_frame = (np.arange(frames) + 0.5) * spf
    t_sample = np.arange(frames * spf, dtype=np.float32)
    env_s = np.interp(t_sample, t_frame, env)
    centroid = 400.0 + 3000.0 * env_s              # per-sample formant target
    carrier = np.zeros_like(t_sample)
    for h in range(1, 31):
        fh = f0 * h
        if fh > 7000:
            break
        weight = np.exp(-((fh - centroid) / 800.0) ** 2)
        carrier += weight * np.sin(2 * np.pi * fh * t_sample / sr)
    carrier = carrier / (np.abs(carrier).max() + 1e-6)
    return ((0.3 + 0.6 * env_s) * carrier).astype(np.float32)


def _render_face_clip(env: np.ndarray, img: int, rng) -> np.ndarray:
    """Envelope → (frames, img, img, 3) uint8 synthetic face whose mouth
    ellipse opens ∝ env[t]. Eyes/face are static so ONLY the mouth carries
    temporal information; mild sensor noise gives the discriminator
    texture."""
    frames = len(env)
    yy, xx = np.mgrid[0:img, 0:img].astype(np.float32)
    skin = int(rng.integers(150, 200))
    base = np.full((img, img, 3), int(rng.integers(60, 100)), np.uint8)
    face = ((xx - img / 2) ** 2 / (img * 0.42) ** 2
            + (yy - img / 2) ** 2 / (img * 0.48) ** 2) <= 1.0
    base[face] = (skin, max(0, skin - 30), max(0, skin - 45))
    for ex in (img * 3 // 8, img * 5 // 8):       # static eyes
        eye = ((xx - ex) ** 2 + (yy - img * 3 // 8) ** 2) <= (img * 0.04) ** 2
        base[eye] = 25
    cy, cx = img * 0.72, img * 0.5
    mouth_w = img * 0.24
    f = np.repeat(base[None], frames, axis=0)
    for t in range(frames):
        ap = 1.5 + env[t] * img * 0.13            # half-height of the opening
        mouth = ((xx - cx) ** 2 / mouth_w ** 2
                 + (yy - cy) ** 2 / ap ** 2) <= 1.0
        f[t][mouth] = 15
    return np.clip(f.astype(np.int16) + rng.integers(-6, 7, f.shape), 0, 255
                   ).astype(np.uint8)


#: Words whose index selects the mouth articulation in
#: synthetic_word_av_clips: word i's aperture oscillates at WORD_RATE_HZ[i]
#: with peak opening WORD_PEAK[i] — rate (temporal) and peak (spatial)
#: jointly code the word, like real visemes differ in both dynamics and
#: mouth shape.
WORD_CODED_WORDS = ["hello", "world", "about", "place", "think", "right"]
WORD_RATE_HZ = [0.5, 2.0, 3.5, 5.0, 6.5, 8.0]
WORD_PEAK = [1.0, 0.52, 0.88, 0.4, 0.76, 0.64]


def synthetic_word_av_clips(
    n_clips: int = 24, frames: int = 40, img: int = 96, seed: int = 0,
    sr: int = 16000, fps: float = 25.0, n_words: int = 4,
) -> List[GanClip]:
    """Single-word clips where the WORD is coded in the mouth articulation:
    word ``i``'s aperture envelope oscillates at ``WORD_RATE_HZ[i]`` with
    peak opening ``WORD_PEAK[i]`` (random phase), so any ``syncnet_T``-frame
    window exposes the word through visible motion rate + opening extent —
    a learnable video→transcript correspondence for the text-conditioned
    lipreading expert (the role LRS2 word clips play for the reference's
    AV-HuBERT criterion, gan-model/dataset_lip_reading.py:161-164). Audio
    follows the same envelope via the formant synth, so sync training
    remains valid on these clips too."""
    if not 1 <= n_words <= len(WORD_CODED_WORDS):
        raise ValueError(f"n_words must be in [1, {len(WORD_CODED_WORDS)}]")
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_clips):
        w = i % n_words       # balanced classes
        t = np.arange(frames) / fps
        phase = rng.uniform(0, 2 * np.pi)
        env = 0.08 + 0.92 * WORD_PEAK[w] * (0.5 + 0.5 * np.sin(
            2 * np.pi * WORD_RATE_HZ[w] * t + phase))
        wav = _formant_wave(env, sr=sr, fps=fps, f0=110.0 + 13.0 * (i % 7))
        f = _render_face_clip(env, img, rng)
        out.append(GanClip(f, wav, text=WORD_CODED_WORDS[w]))
    return out


def mouth_aperture_proxy(frames01: np.ndarray, img: Optional[int] = None) -> np.ndarray:
    """Per-frame mouth-opening measure for synthetic_av_clips faces: mean
    darkness over the mouth region box. frames01: (..., H, W, 3) in [0, 1].
    Used by the expert-chain proof tests to check that generated mouths
    track audio energy."""
    h, w = frames01.shape[-3], frames01.shape[-2]
    y0, y1 = int(h * 0.58), int(h * 0.86)
    x0, x1 = int(w * 0.28), int(w * 0.72)
    region = frames01[..., y0:y1, x0:x1, :]
    return 1.0 - region.mean(axis=(-1, -2, -3))


def synthetic_word_clips(
    n: int = 64, t: int = 5, hw: int = 32, num_classes: int = 8, seed: int = 0
):
    """Clips whose mean brightness encodes the label — linearly separable,
    so training-convergence smoke tests can assert learning."""
    rng = np.random.default_rng(seed)
    clips, labels = [], []
    for i in range(n):
        label = int(rng.integers(num_classes))
        base = 255.0 * (label + 0.5) / num_classes
        clip = np.clip(
            rng.normal(base, 20.0, (t, hw, hw)), 0, 255
        ).astype(np.uint8)
        clips.append(clip)
        labels.append(label)
    return clips, labels
