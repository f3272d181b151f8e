"""Frontend parity tests.

The STFT path is checked token-for-token against torch.stft (the same
primitive torchaudio's MelSpectrogram wraps). The mel filterbank is
checked against an independently-written reference that follows the
librosa construction (outer-difference ramps) rather than the slope
formulation used in the implementation.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audiocaption_tpu.ops import (
    MelConfig, LogMelFrontend, mel_filterbank, hann_window,
    amplitude_to_db, CNN14_MEL_32K, EFFB2_MEL_16K)


def _torch_power_spec(wav: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    window = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        torch.as_tensor(wav, dtype=torch.float64),
        n_fft=n_fft, hop_length=hop, win_length=n_fft, window=window,
        center=True, pad_mode="reflect", normalized=False,
        onesided=True, return_complex=True)
    return (spec.abs() ** 2).numpy().transpose(0, 2, 1)  # [B, T, F]


@pytest.mark.parametrize("sr,dur", [(16000, 0.5), (32000, 0.33)])
def test_power_spectrogram_matches_torch_stft(sr, dur):
    rng = np.random.RandomState(42)
    n = int(sr * dur)
    wav = rng.randn(2, n).astype(np.float32)
    cfg = MelConfig(sample_rate=sr)
    fe = LogMelFrontend(cfg)
    got = np.asarray(fe.power_spectrogram(jnp.asarray(wav)))
    want = _torch_power_spec(wav, cfg.n_fft, cfg.hop)
    assert got.shape == want.shape
    assert got.shape[1] == n // cfg.hop + 1
    # fp32 matmul-DFT vs fp64 FFT: compare with scale-relative tolerance
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-6)


def _librosa_style_mel(n_freqs, f_min, f_max, n_mels, sr, norm, scale):
    """Independent mel filterbank construction (librosa ramp style)."""
    def hz2mel(f):
        f = np.asarray(f, dtype=np.float64)
        if scale == "htk":
            return 2595.0 * np.log10(1.0 + f / 700.0)
        mel = f / (200.0 / 3)
        log_t = f >= 1000.0
        mel = np.where(log_t, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                       / (np.log(6.4) / 27.0), mel)
        return mel

    def mel2hz(m):
        m = np.asarray(m, dtype=np.float64)
        if scale == "htk":
            return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
        f = m * (200.0 / 3)
        log_t = m >= 15.0
        return np.where(log_t, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)

    fftfreqs = np.linspace(0, sr // 2, n_freqs)
    mel_f = mel2hz(np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    weights = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights.T  # [n_freqs, n_mels]


@pytest.mark.parametrize("norm,scale,f_min,f_max,sr", [
    ("slaney", "slaney", 50.0, 14000.0, 32000),   # Cnn14 config
    (None, "htk", 0.0, 8000.0, 16000),            # EffB2 config
])
def test_mel_filterbank_matches_independent_reference(norm, scale, f_min, f_max, sr):
    n_fft = 32 * sr // 1000
    n_freqs = n_fft // 2 + 1
    got = mel_filterbank(n_freqs, f_min, f_max, 64, sr, norm=norm, mel_scale=scale)
    want = _librosa_style_mel(n_freqs, f_min, f_max, 64, sr, norm, scale)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_hann_window_matches_torch():
    for n in (512, 1024):
        got = hann_window(n)
        want = torch.hann_window(n, periodic=True).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_amplitude_to_db():
    x = jnp.asarray([[1.0, 0.0, 1e-12, 100.0]])
    db = np.asarray(amplitude_to_db(x))
    np.testing.assert_allclose(db[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(db[0, 1], -100.0, atol=1e-3)  # clamp at 1e-10
    np.testing.assert_allclose(db[0, 3], 20.0, atol=1e-3)


def test_amplitude_to_db_top_db_is_per_sample():
    x = jnp.asarray([
        [[1e4, 1e-8]],    # max 40 dB -> floor at -80 dB
        [[1.0, 1e-8]],    # max 0 dB  -> floor at -120 dB... (top_db=120)
    ])
    db = np.asarray(amplitude_to_db(x, top_db=120.0))
    np.testing.assert_allclose(db[0, 0, 1], -80.0, atol=1e-3)
    np.testing.assert_allclose(db[1, 0, 1], -80.0, atol=1e-3)


def test_logmel_shapes_and_feat_len():
    wav = jnp.zeros((3, 32000))
    for cfg in (CNN14_MEL_32K, EFFB2_MEL_16K):
        fe = LogMelFrontend(cfg)
        out = fe(wav)
        n_frames = 32000 // cfg.hop + 1
        assert out.shape == (3, n_frames, 64)
        assert out.dtype == jnp.float32
        fl = np.asarray(cfg.feat_len(jnp.asarray([32000, 16000, 100])))
        np.testing.assert_array_equal(
            fl, [32000 // cfg.hop + 1, 16000 // cfg.hop + 1, 100 // cfg.hop + 1])
