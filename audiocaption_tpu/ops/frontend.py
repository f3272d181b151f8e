"""Log-mel spectrogram frontend, designed for the TPU MXU.

The reference computes the frontend with torchaudio's cuFFT-backed
``MelSpectrogram`` + ``AmplitudeToDB`` (captioning/models/cnn_encoder.py:
338-350, hf_wrapper.py:260-315).  Here the STFT is expressed as a single
real matmul against a windowed DFT basis — on TPU that runs on the
128x128 systolic array and fuses with the mel projection, instead of
hitting XLA's slower generic FFT path.  All math is float32: the mel
energies span ~12 orders of magnitude and the dB compression happens
at the end, so bfloat16 here would destroy downstream token parity.

Semantics match torchaudio exactly:
  * center=True with reflect padding of n_fft//2,
  * periodic Hann window, power=2.0 spectrogram,
  * mel filterbanks in both "htk" and "slaney" scales with optional
    slaney area normalization (torchaudio.functional.melscale_fbanks),
  * AmplitudeToDB: 10*log10(clamp(x, 1e-10)), optional per-sample top_db
    floor.

Frame count follows the reference's length arithmetic:
``feat_len = wav_len // hop + 1`` (cnn_encoder.py:446-450).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Mel scale conversions (numpy: executed once at trace time)
# --------------------------------------------------------------------------

def _hz_to_mel(freq: np.ndarray, mel_scale: str) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    if mel_scale != "slaney":
        raise ValueError(f"unknown mel_scale: {mel_scale}")
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(mels: np.ndarray, mel_scale: str) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


def mel_filterbank(n_freqs: int,
                   f_min: float,
                   f_max: float,
                   n_mels: int,
                   sample_rate: int,
                   norm: Optional[str] = None,
                   mel_scale: str = "htk") -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels], torchaudio-compatible."""
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)

    f_diff = f_pts[1:] - f_pts[:-1]                        # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]           # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(f"unknown mel norm: {norm}")
    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)).astype(np.float32)


# --------------------------------------------------------------------------
# Framing + DFT-as-matmul
# --------------------------------------------------------------------------

def frame_signal(wav: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-padded framing. wav: [B, T] -> frames [B, n_frames, n_fft].

    n_frames = T // hop + 1, matching torch.stft(center=True) and the
    reference's feat_len arithmetic (cnn_encoder.py:446-450).
    """
    pad = n_fft // 2
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (wav.shape[1] - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return wav[:, idx]


def _dft_basis(n_fft: int, window: np.ndarray) -> np.ndarray:
    """Windowed real-DFT basis [n_fft, 2 * (n_fft // 2 + 1)] (cos | -sin)."""
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    angle = 2.0 * math.pi * t * k / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    return (window[:, None] * basis).astype(np.float32)


def amplitude_to_db(power: jnp.ndarray,
                    top_db: Optional[float] = None,
                    amin: float = 1e-10) -> jnp.ndarray:
    """Power -> dB, torchaudio AmplitudeToDB(stype="power") semantics.

    ``top_db`` floors each sample at (its own max - top_db); the max is
    taken over all non-batch axes.
    """
    db = 10.0 * jnp.log10(jnp.maximum(power, amin))
    if top_db is not None:
        axes = tuple(range(1, db.ndim))
        floor = jnp.max(db, axis=axes, keepdims=True) - top_db
        db = jnp.maximum(db, floor)
    return db


# --------------------------------------------------------------------------
# Config + frontend module
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MelConfig:
    """torchaudio-MelSpectrogram-compatible configuration."""
    sample_rate: int = 32000
    win_ms: int = 32
    hop_ms: int = 10
    n_mels: int = 64
    f_min: float = 50.0
    f_max: Optional[float] = 14000.0   # None -> sample_rate / 2
    norm: Optional[str] = "slaney"     # None | "slaney"
    mel_scale: str = "slaney"          # "htk" | "slaney"
    top_db: Optional[float] = None

    @property
    def n_fft(self) -> int:
        return self.win_ms * self.sample_rate // 1000

    @property
    def hop(self) -> int:
        return self.hop_ms * self.sample_rate // 1000

    @property
    def effective_f_max(self) -> float:
        return self.f_max if self.f_max is not None else self.sample_rate / 2.0

    def feat_len(self, wav_len: jnp.ndarray) -> jnp.ndarray:
        """Frame count for valid samples: wav_len // hop + 1."""
        return jnp.asarray(wav_len) // self.hop + 1


# Presets matching the reference encoders.
# Cnn14Encoder (cnn_encoder.py:338-350): slaney scale+norm, f_min 50.
CNN14_MEL_32K = MelConfig(sample_rate=32000, f_min=50.0, f_max=14000.0,
                          norm="slaney", mel_scale="slaney", top_db=None)
CNN14_MEL_16K = MelConfig(sample_rate=16000, f_min=50.0, f_max=8000.0,
                          norm="slaney", mel_scale="slaney", top_db=None)
# EfficientNetB2 (hf_wrapper.py:260-285): torchaudio defaults — htk scale,
# no norm, f_min 0, f_max None, AmplitudeToDB(top_db=120).
EFFB2_MEL_16K = MelConfig(sample_rate=16000, f_min=0.0, f_max=None,
                          norm=None, mel_scale="htk", top_db=120.0)


class LogMelFrontend:
    """Waveform [B, T] -> log-mel [B, n_frames, n_mels] in float32.

    The basis matrices are baked as constants (closed over at trace
    time), so under jit the whole frontend is two MXU matmuls + one
    elementwise block, fused by XLA.

    ``compute_dtype`` selects the DFT conv input precision (measured
    neutral on the current XLA version — the conv is bandwidth-bound —
    but kept as a knob for other compiler versions).

    ``use_pallas`` selects the fused whole-pipeline Pallas kernel
    (ops/pallas_logmel.py) instead of the conv-DFT XLA path.  Default
    (None) resolves from on-chip A/B measurements (PERF.md "log-mel
    frontend"): the kernel wins on the 32 kHz presets (7.1 vs 9.2 ms at
    B=128, +29%; +18% at B=256) and loses on the 16 kHz EffB2 preset
    (-13% / -39%), so auto = TPU backend AND sample_rate == 32000.
    The two paths agree numerically to float-associativity tolerance
    (tests/test_pallas_logmel.py), not bit-exactly.
    """

    def __init__(self, config: MelConfig, compute_dtype=jnp.float32,
                 use_pallas: Optional[bool] = None):
        self.config = config
        self.compute_dtype = compute_dtype
        self.use_pallas = use_pallas           # None = resolve per call
        window = hann_window(config.n_fft)
        self._basis = _dft_basis(config.n_fft, window)          # [n_fft, 2F]
        self._mel_fb = mel_filterbank(
            n_freqs=config.n_fft // 2 + 1,
            f_min=config.f_min,
            f_max=config.effective_f_max,
            n_mels=config.n_mels,
            sample_rate=config.sample_rate,
            norm=config.norm,
            mel_scale=config.mel_scale,
        )                                                        # [F, n_mels]

    def _resolve_pallas(self) -> bool:
        if self.use_pallas is not None:
            return bool(self.use_pallas)
        if self.config.sample_rate != 32000:
            return False
        if jax.default_backend() == "cpu":
            return False
        # model init runs under jax.default_device(cpu) even on TPU
        # hosts (fast local compiles); Pallas cannot compile there
        dd = jax.config.jax_default_device
        return not (dd is not None and getattr(dd, "platform", "")
                    == "cpu")

    def power_spectrogram(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> power spec [B, n_frames, n_freqs] (float32).

        The windowed DFT runs as a stride-``hop`` conv1d whose filters
        are the windowed cos/-sin basis rows: framing happens inside the
        conv engine (MXU) instead of materializing the 4x-duplicated
        [B, T_frames, n_fft] frame tensor in HBM that an explicit
        gather + matmul would create.
        """
        cd = self.compute_dtype
        wav = wav.astype(cd)
        pad = self.config.n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        n_freqs = self.config.n_fft // 2 + 1
        # [B, T, 1] (NWC) * filters [n_fft, 1, 2F] (WIO), stride hop
        proj = jax.lax.conv_general_dilated(
            wav[..., None],
            jnp.asarray(self._basis).astype(cd)[:, None, :],
            window_strides=(self.config.hop,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )                                   # [B, n_frames, 2F]
        re, im = proj[..., :n_freqs], proj[..., n_freqs:]
        return re * re + im * im

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> log-mel [B, n_frames, n_mels] (float32)."""
        if self._resolve_pallas():
            from audiocaption_tpu.ops.pallas_logmel import pallas_logmel
            return pallas_logmel(wav, self.config)
        power = self.power_spectrogram(wav)
        mel = jnp.einsum("btf,fm->btm", power, jnp.asarray(self._mel_fb),
                         preferred_element_type=jnp.float32)
        return amplitude_to_db(mel, top_db=self.config.top_db)
