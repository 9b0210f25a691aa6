"""Golden tests for the XLA log-mel frontend against from-scratch numpy
implementations of the librosa/scipy conventions the reference uses
(gan-model/preprocessing/audio_utils.py)."""
import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import AudioConfig
from lipreading_video_generation_tpu.ops import audio


CFG = AudioConfig()


# --- numpy goldens (librosa-convention reimplementations) -------------------

def golden_preemphasis(wav, k=0.97):
    return scipy.signal.lfilter([1, -k], [1], wav)


def golden_stft_mag(y, n_fft=800, hop=200, win=800):
    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)  # periodic hann
    nframes = 1 + (len(y) - n_fft) // hop
    out = np.empty((n_fft // 2 + 1, nframes))
    for t in range(nframes):
        fr = y[t * hop : t * hop + n_fft] * window
        out[:, t] = np.abs(np.fft.rfft(fr, n=n_fft))
    return out


def golden_mel_basis(sr=16000, n_fft=800, n_mels=80, fmin=55.0, fmax=7600.0):
    # librosa.filters.mel defaults: slaney scale + slaney norm
    def hz_to_mel(f):
        f = np.atleast_1d(np.asarray(f, dtype=np.float64))
        f_sp = 200.0 / 3
        mel = f / f_sp
        log_t = f >= 1000.0
        mel[log_t] = 15.0 + np.log(f[log_t] / 1000.0) / (np.log(6.4) / 27.0)
        return mel

    def mel_to_hz(m):
        m = np.atleast_1d(np.asarray(m, dtype=np.float64))
        f_sp = 200.0 / 3
        f = m * f_sp
        log_t = m >= 15.0
        f[log_t] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[log_t] - 15.0))
        return f

    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin)[0], hz_to_mel(fmax)[0], n_mels + 2))
    weights = np.zeros((n_mels, n_fft // 2 + 1))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights


def golden_melspectrogram(wav, cfg=CFG):
    y = golden_preemphasis(wav, cfg.preemphasis)
    D = golden_stft_mag(y, cfg.n_fft, cfg.hop_size, cfg.win_size)
    mel = golden_mel_basis(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax) @ D
    min_level = np.exp(cfg.min_level_db / 20 * np.log(10))
    S = 20 * np.log10(np.maximum(min_level, mel)) - cfg.ref_level_db
    return np.clip(
        (2 * cfg.max_abs_value) * ((S - cfg.min_level_db) / (-cfg.min_level_db)) - cfg.max_abs_value,
        -cfg.max_abs_value,
        cfg.max_abs_value,
    )


# --- tests ------------------------------------------------------------------

def _wav(rng, n=16000):
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_preemphasis_matches_lfilter(rng):
    w = _wav(rng, 4000)
    got = np.asarray(audio.preemphasis(jnp.asarray(w), 0.97))
    np.testing.assert_allclose(got, golden_preemphasis(w), rtol=1e-5, atol=1e-6)


def test_inv_preemphasis_inverts(rng):
    w = _wav(rng, 2000)
    y = audio.preemphasis(jnp.asarray(w), 0.97)
    back = np.asarray(audio.inv_preemphasis(y, 0.97))
    np.testing.assert_allclose(back, w, rtol=1e-3, atol=1e-4)


def test_stft_magnitude_matches_golden(rng):
    w = _wav(rng, 8000)
    got = np.asarray(audio.stft_magnitude(jnp.asarray(w), 800, 200, 800))
    want = golden_stft_mag(w.astype(np.float64))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_matches_librosa_construction():
    got = audio.mel_filterbank(CFG)
    want = golden_mel_basis()
    assert got.shape == (80, 401)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_melspectrogram_matches_golden(rng):
    w = _wav(rng, 16000)
    got = np.asarray(audio.melspectrogram(jnp.asarray(w), CFG))
    want = golden_melspectrogram(w.astype(np.float64))
    assert got.shape == want.shape == (80, 81)
    # tolerance-based parity: values live in [-4, 4]
    assert np.max(np.abs(got - want)) < 2e-2


def test_melspectrogram_batched(rng):
    w = np.stack([_wav(rng), _wav(rng)])
    got = np.asarray(audio.melspectrogram(jnp.asarray(w), CFG))
    assert got.shape == (2, 80, 81)
    single = np.asarray(audio.melspectrogram(jnp.asarray(w[0]), CFG))
    np.testing.assert_allclose(got[0], single, rtol=1e-5, atol=1e-5)


def test_normalize_denormalize_roundtrip(rng):
    S = rng.uniform(-100, 0, (80, 20)).astype(np.float32)
    n = audio.normalize_spec(jnp.asarray(S), CFG)
    back = np.asarray(audio.denormalize_spec(n, CFG))
    np.testing.assert_allclose(back, S, rtol=1e-4, atol=1e-3)
    assert np.abs(np.asarray(n)).max() <= 4.0


def test_mel_window_alignment():
    """start_idx = int(80 * (frame / fps)) per dataset.py:70-79."""
    mel = jnp.tile(jnp.arange(100, dtype=jnp.float32)[None, :], (80, 1))
    win = np.asarray(audio.crop_mel_window(mel, 10, fps=25.0))
    assert win.shape == (80, 16)
    assert win[0, 0] == 32.0  # 80 * 10/25 = 32


def test_mel_windows_batched():
    mel = jnp.tile(jnp.arange(200, dtype=jnp.float32)[None, :], (80, 1))
    wins = np.asarray(audio.mel_windows(mel, jnp.asarray([0, 5, 10])))
    assert wins.shape == (3, 80, 16)
    assert wins[1, 0, 0] == 16.0  # 80 * 5/25


def test_linearspectrogram_matches_golden(rng):
    w = _wav(rng, 8000)
    got = np.asarray(audio.linearspectrogram(jnp.asarray(w), CFG))
    y = golden_preemphasis(w.astype(np.float64))
    D = golden_stft_mag(y)
    min_level = np.exp(CFG.min_level_db / 20 * np.log(10))
    S = 20 * np.log10(np.maximum(min_level, D)) - CFG.ref_level_db
    want = np.clip((2 * 4.0) * ((S + 100) / 100) - 4.0, -4.0, 4.0)
    assert got.shape == want.shape == (401, 41)
    assert np.max(np.abs(got - want)) < 2e-2


def test_amp_db_roundtrip(rng):
    x = rng.uniform(1e-4, 10, (80, 5)).astype(np.float32)
    db = audio.amp_to_db(jnp.asarray(x))
    back = np.asarray(audio.db_to_amp(db))
    np.testing.assert_allclose(back, x, rtol=1e-3)
