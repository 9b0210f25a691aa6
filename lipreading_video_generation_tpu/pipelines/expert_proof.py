"""Expert-chain *function* proofs: does the sync expert discriminate, and
does the trained GAN's mouth actually track the audio?

The reference never has to prove this — it downloads a pretrained
``lipsync_expert.pth`` whose discriminative power is assumed, and its gate
(gan-model/train_lipreading.py:187-192) flips on the expert's eval loss.
A framework that trains its own expert must demonstrate the chain works:

1. ``alignment_scores`` / ``auc`` — a trained SyncNet must separate
   audio-aligned face windows from temporally shifted ones (the property
   the Wav2Lip expert is trained for).
2. ``aperture_envelope_correlation`` — a trained generator's mouth
   aperture on *held-out* clips must correlate with the audio envelope
   (the property the whole GAN exists to produce).

Both run on ``data.datasets.synthetic_av_clips`` — clips whose mouth
aperture is driven by the waveform's formant/amplitude envelope — the
in-environment stand-in for LRS2. Used by tests/test_expert_chain.py and
scripts/prove_expert_chain.py (curves recorded in BENCH_NOTES.md).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import AudioConfig, GanConfig
from ..data.datasets import GanClip, mouth_aperture_proxy
from ..models.syncnet import SyncNet, stack_window_lower_half
from .train_gan import prepare_batch


def _window_batch(
    clips: Sequence[GanClip], t: int, n: int, rng: np.random.Generator,
    max_shift: int = 0,
) -> Dict[str, np.ndarray]:
    """Sample n (window, wav, start) triples leaving ``max_shift`` frames of
    headroom on both sides of the window so a shifted mel stays in range.

    Clips too short for that headroom (< t + 2·max_shift + 2 frames) are
    skipped — real preprocessed datasets have ragged clip lengths, and a
    short held-out clip must not kill the AUC eval mid-training-run."""
    min_len = t + 2 * max_shift + 2
    eligible = [c for c in clips if len(c.frames) >= min_len]
    if not eligible:
        raise ValueError(
            f"no clip has the >= {min_len} frames needed for T={t} windows "
            f"with {max_shift}-frame shift headroom "
            f"(longest: {max(len(c.frames) for c in clips)})")
    windows, starts, wavs = [], [], []
    max_wav = max(len(c.wav) for c in eligible)
    for _ in range(n):
        clip = eligible[rng.integers(len(eligible))]
        lo, hi = max_shift + 1, len(clip.frames) - t - max_shift
        start = int(rng.integers(lo, hi))
        windows.append(clip.frames[start : start + t])
        starts.append(start)
        wavs.append(np.pad(clip.wav, (0, max_wav - len(clip.wav))))
    return {
        "window": np.stack(windows),
        "wrong_window": np.stack(windows),  # unused by the sync scorer
        "start_frame": np.asarray(starts, np.int32),
        "wav": np.stack(wavs).astype(np.float32),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "audio_cfg"))
def _sync_sims(syncnet_params, batch, cfg: GanConfig,
               audio_cfg: AudioConfig = AudioConfig()) -> jax.Array:
    """Cosine similarity of (mel @ start_frame, ground-truth window) pairs."""
    prep = prepare_batch(batch, cfg, audio_cfg)
    faces = stack_window_lower_half(prep["gt"])
    a, v = SyncNet(width=cfg.model_width).apply(
        {"params": syncnet_params}, prep["mel"], faces)
    return jnp.sum(a * v, axis=-1)


def alignment_scores(
    syncnet_params,
    cfg: GanConfig,
    clips: Sequence[GanClip],
    n_pairs: int = 64,
    shift: int = 6,
    seed: int = 0,
    audio_cfg: AudioConfig = AudioConfig(),
) -> Tuple[np.ndarray, np.ndarray]:
    """(positive, negative) cosine scores for aligned vs ``shift``-frame
    shifted mel windows over the SAME face windows. A functioning expert
    scores positives higher (quantify with ``auc``)."""
    rng = np.random.default_rng(seed)
    batch = _window_batch(clips, cfg.syncnet_T, n_pairs, rng, max_shift=shift)
    aligned = {k: jnp.asarray(v) for k, v in batch.items()}
    sign = rng.choice([-1, 1], size=n_pairs)
    shifted = dict(aligned)
    shifted["start_frame"] = jnp.asarray(
        batch["start_frame"] + sign * shift, jnp.int32)
    pos = np.asarray(_sync_sims(syncnet_params, aligned, cfg, audio_cfg))
    neg = np.asarray(_sync_sims(syncnet_params, shifted, cfg, audio_cfg))
    return pos, neg


def auc(pos: np.ndarray, neg: np.ndarray) -> float:
    """Rank AUC: P(pos > neg) + 0.5·P(tie), over all pairs."""
    pos = np.asarray(pos)[:, None]
    neg = np.asarray(neg)[None, :]
    return float(((pos > neg).mean() + 0.5 * (pos == neg).mean()))


def frame_rms(wav: np.ndarray, n_frames: int, sr: int = 16000,
              fps: float = 25.0) -> np.ndarray:
    """Per-video-frame RMS of the waveform — the audio-envelope proxy the
    aperture is checked against (synthetic_av_clips drives BOTH from one
    envelope, so corr(aperture_gt, rms) ≈ 1 bounds what a generator can
    achieve)."""
    spf = int(sr / fps)
    out = np.zeros(n_frames, np.float32)
    for t in range(n_frames):
        seg = wav[t * spf : (t + 1) * spf]
        out[t] = np.sqrt(np.mean(seg * seg)) if len(seg) else 0.0
    return out


def _pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / denom) if denom > 0 else 0.0


def aperture_envelope_correlation(
    gen_apply,
    cfg: GanConfig,
    clips: Sequence[GanClip],
    n_windows: int = 32,
    seed: int = 0,
    audio_cfg: AudioConfig = AudioConfig(),
) -> Dict[str, float]:
    """Pooled Pearson correlation between per-frame mouth aperture and the
    per-frame audio RMS envelope, on held-out clips.

    ``gen_apply(batch) -> (B, T, H, W, 3) in [0,1]`` generates from masked
    targets + per-frame mels (e.g. a closure over train_gan.generate_step).
    Returns r for the generated frames and for the ground truth (the
    ceiling — ~1.0 on synthetic_av_clips by construction).
    """
    rng = np.random.default_rng(seed)
    t = cfg.syncnet_T
    batch_np = _window_batch(clips, t, n_windows, rng, max_shift=1)
    # the GAN consumes wrong_window as the reference identity frames — use a
    # different window of the same clip like GanWindowSampler does
    wrongs = []
    for i in range(n_windows):
        clip_frames = batch_np["window"][i]
        wrongs.append(np.roll(clip_frames, 2, axis=0))
    batch_np["wrong_window"] = np.stack(wrongs)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g = np.asarray(gen_apply(batch))                       # (B, T, H, W, 3)
    gt = np.asarray(batch_np["window"], np.float32) / 255.0

    ap_gen = mouth_aperture_proxy(g)                       # (B, T)
    ap_gt = mouth_aperture_proxy(gt)
    rms = np.stack([
        frame_rms(batch_np["wav"][i], len(batch_np["wav"][i]) // int(
            audio_cfg.sample_rate / cfg.fps), audio_cfg.sample_rate, cfg.fps)[
            batch_np["start_frame"][i] : batch_np["start_frame"][i] + t]
        for i in range(n_windows)
    ])
    return {
        "r_generated": _pearson(ap_gen, rms),
        "r_ground_truth": _pearson(ap_gt, rms),
    }


def train_val_split(clips: List[GanClip], n_held_out: int = 2
                    ) -> Tuple[List[GanClip], List[GanClip]]:
    return clips[:-n_held_out], clips[-n_held_out:]
