"""Log-mel audio frontend as pure JAX/XLA.

TPU-native re-design of the reference's librosa/scipy DSP chain
(gan-model/preprocessing/audio_utils.py:23-151, parameters
gan-model/preprocessing/params.py:24-64): pre-emphasis → centered STFT
(periodic Hann, reflect padding) → Slaney mel filterbank matmul →
amp-to-dB → ref-level shift → symmetric normalize to ±max_abs_value.

Design notes vs the reference:
- The whole chain is jittable and **batched**: ``melspectrogram`` maps over
  any leading batch dims, so a full clip's audio (or a whole batch of clips)
  is one fused XLA program instead of a ~0.25 s/clip host loop
  (audio_utils.py:9).
- Framing is a strided gather; the FFT is XLA's native rFFT; the mel
  projection is a single (n_mels, n_fft/2+1) matmul that XLA fuses with the
  dB/normalize elementwise tail.
- The mel filterbank is precomputed on host with numpy (it is a constant)
  using the same Slaney-scale + slaney-norm construction as
  ``librosa.filters.mel`` (audio_utils.py:113-116) — verified against a
  from-scratch golden in tests/test_audio.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import AudioConfig

__all__ = [
    "mel_filterbank",
    "preemphasis",
    "inv_preemphasis",
    "stft_magnitude",
    "melspectrogram",
    "linearspectrogram",
    "amp_to_db",
    "db_to_amp",
    "normalize_spec",
    "denormalize_spec",
    "mel_windows",
    "crop_mel_window",
]


# ---------------------------------------------------------------------------
# Mel filterbank (host-side constant; Slaney scale + slaney norm, matching
# librosa.filters.mel defaults used at audio_utils.py:115-116)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_region = m >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


@functools.lru_cache(maxsize=8)
def _mel_filterbank_cached(sample_rate: int, n_fft: int, num_mels: int, fmin: float, fmax: float):
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_lo = _hz_to_mel_slaney(np.array(fmin))
    mel_hi = _hz_to_mel_slaney(np.array(fmax))
    mel_pts = np.linspace(mel_lo, mel_hi, num_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_filterbank(cfg: AudioConfig) -> np.ndarray:
    """(num_mels, n_fft//2+1) Slaney-normalized triangular filterbank."""
    assert cfg.fmax <= cfg.sample_rate // 2, "fmax above Nyquist"
    return _mel_filterbank_cached(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)


# ---------------------------------------------------------------------------
# Waveform ops
# ---------------------------------------------------------------------------

def preemphasis(wav: jax.Array, k: float = 0.97, apply: bool = True) -> jax.Array:
    """y[n] = x[n] - k*x[n-1] (scipy.signal.lfilter([1,-k],[1],x) at
    audio_utils.py:35-38). FIR, so it is a shift-and-subtract, not a scan."""
    if not apply:
        return wav
    prev = jnp.pad(wav[..., :-1], [(0, 0)] * (wav.ndim - 1) + [(1, 0)])
    return wav - k * prev


def inv_preemphasis(wav: jax.Array, k: float = 0.97, apply: bool = True) -> jax.Array:
    """IIR inverse y[n] = x[n] + k*y[n-1] (audio_utils.py:40-43) via
    ``lax.associative_scan``: y[n] = sum_j k^(n-j) x[j] computed in
    O(log n) depth as a first-order linear recurrence."""
    if not apply:
        return wav

    def combine(a, b):
        # each element is (multiplier, addend): y = m*y_prev + a
        m1, a1 = a
        m2, a2 = b
        return m1 * m2, a2 + m2 * a1

    ms = jnp.full_like(wav, k)
    _, y = jax.lax.associative_scan(combine, (ms, wav), axis=-1)
    return y


def _hann_periodic(win_size: int) -> np.ndarray:
    # scipy.signal.get_window('hann', n, fftbins=True) — periodic Hann,
    # what librosa.stft uses by default.
    n = np.arange(win_size)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


def frame_signal(wav: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(..., samples) → (..., num_frames, frame_length) strided gather."""
    num_frames = 1 + (wav.shape[-1] - frame_length) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return wav[..., idx]


def stft_magnitude(
    wav: jax.Array,
    n_fft: int = 800,
    hop: int = 200,
    win_size: int = 800,
    pad_mode: str = "reflect",
) -> jax.Array:
    """|STFT| with librosa conventions (center=True): (..., n_fft//2+1, T),
    T = 1 + samples//hop. Matches librosa.stft at audio_utils.py:72-76."""
    if win_size > n_fft:
        raise ValueError("win_size must be <= n_fft")
    pad = n_fft // 2
    wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode=pad_mode)
    frames = frame_signal(wav, n_fft, hop)
    window = _hann_periodic(win_size)
    if win_size < n_fft:  # center-pad window to n_fft, like librosa
        lpad = (n_fft - win_size) // 2
        window = np.pad(window, (lpad, n_fft - win_size - lpad))
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.abs(spec)
    return jnp.swapaxes(mag, -1, -2)  # (..., bins, T) to match mel_basis @ S


# ---------------------------------------------------------------------------
# dB / normalize (audio_utils.py:118-151)
# ---------------------------------------------------------------------------

def amp_to_db(x: jax.Array, min_level_db: float = -100.0) -> jax.Array:
    min_level = np.exp(min_level_db / 20.0 * np.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jax.Array) -> jax.Array:
    return jnp.power(10.0, x * 0.05)


def normalize_spec(S: jax.Array, cfg: AudioConfig) -> jax.Array:
    if cfg.symmetric_mels:
        out = (2.0 * cfg.max_abs_value) * ((S - cfg.min_level_db) / (-cfg.min_level_db)) - cfg.max_abs_value
        return jnp.clip(out, -cfg.max_abs_value, cfg.max_abs_value)
    out = cfg.max_abs_value * ((S - cfg.min_level_db) / (-cfg.min_level_db))
    return jnp.clip(out, 0.0, cfg.max_abs_value)


def denormalize_spec(D: jax.Array, cfg: AudioConfig) -> jax.Array:
    if cfg.symmetric_mels:
        D = jnp.clip(D, -cfg.max_abs_value, cfg.max_abs_value)
        return ((D + cfg.max_abs_value) * -cfg.min_level_db / (2.0 * cfg.max_abs_value)) + cfg.min_level_db
    D = jnp.clip(D, 0.0, cfg.max_abs_value)
    return (D * -cfg.min_level_db / cfg.max_abs_value) + cfg.min_level_db


# ---------------------------------------------------------------------------
# Top-level spectrograms
# ---------------------------------------------------------------------------

def melspectrogram(wav: jax.Array, cfg: AudioConfig = AudioConfig()) -> jax.Array:
    """(..., samples) → (..., num_mels, T) normalized log-mel.

    Functional equivalent of audio_utils.py:60-66; jit/vmap-friendly.
    """
    basis = jnp.asarray(mel_filterbank(cfg))
    y = preemphasis(wav, cfg.preemphasis, cfg.preemphasize)
    mag = stft_magnitude(y, cfg.n_fft, cfg.hop_size, cfg.win_size)
    mel = jnp.einsum("mf,...ft->...mt", basis, mag)
    S = amp_to_db(mel, cfg.min_level_db) - cfg.ref_level_db
    if cfg.signal_normalization:
        S = normalize_spec(S, cfg)
    return S


def linearspectrogram(wav: jax.Array, cfg: AudioConfig = AudioConfig()) -> jax.Array:
    """(..., samples) → (..., n_fft//2+1, T) normalized log-linear spectrogram
    (audio_utils.py:52-58)."""
    y = preemphasis(wav, cfg.preemphasis, cfg.preemphasize)
    mag = stft_magnitude(y, cfg.n_fft, cfg.hop_size, cfg.win_size)
    S = amp_to_db(mag, cfg.min_level_db) - cfg.ref_level_db
    if cfg.signal_normalization:
        S = normalize_spec(S, cfg)
    return S


# ---------------------------------------------------------------------------
# Mel windowing for video alignment
# ---------------------------------------------------------------------------

def crop_mel_window(
    mel: jax.Array,
    start_frame,
    fps: float = 25.0,
    mel_step_size: int = 16,
    sample_rate: int = 16000,
    hop: int = 200,
) -> jax.Array:
    """Crop the 16-step mel window aligned to video frame ``start_frame``.

    start_idx = int(mel_steps_per_sec * start_frame / fps), mirroring
    gan-model/preprocessing/dataset.py:70-79 (``80.*(start_frame/fps)``).
    Jit-safe: start_frame may be traced. mel is (..., num_mels, T).
    """
    mel_per_sec = sample_rate / hop  # 80 for 16k/200
    start = jnp.floor(mel_per_sec * start_frame / fps).astype(jnp.int32)
    start = jnp.clip(start, 0, mel.shape[-1] - mel_step_size)
    return jax.lax.dynamic_slice_in_dim(mel, start, mel_step_size, axis=-1)


def mel_windows(
    mel: jax.Array,
    start_frames: jax.Array,
    fps: float = 25.0,
    mel_step_size: int = 16,
    sample_rate: int = 16000,
    hop: int = 200,
) -> jax.Array:
    """Batch of aligned mel windows: (T,) start frames → (T, mels, mel_step).

    Replaces the per-frame Python loop of dataset.py:81-94
    (``get_segmented_mels``) with a vmapped dynamic-slice gather.
    """
    fn = lambda s: crop_mel_window(mel, s, fps, mel_step_size, sample_rate, hop)
    return jax.vmap(fn)(start_frames)
