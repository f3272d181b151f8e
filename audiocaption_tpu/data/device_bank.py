"""Device-resident waveform bank.

Opt-in (``data.{train,val}.device_resident`` in the config): the whole
fixed-length corpus's waveforms ship to HBM ONCE as a zero-padded
float16 matrix; every subsequent batch carries only token ids + bank
row indices, and the jitted train step / val decoder gathers the wav
rows on device (``jnp.take``, training/trainer.py step_fn and
cli/run.py ``_make_val_scorer``).

This replaces the reference's per-step waveform host->device copy
(`python_scripts/train_eval/run.py:23-27`).  On the remote-TPU tunnel
the ~20 MB/step wav transfer dominated the ~100 ms step compute; with
the bank the per-step traffic is a few KB (NOTES_ROUND3: ~10x cheaper
steps).  float16 storage is lossless for corpora packed as int16/f16
waveforms (cli/pack_waveform.py packs f16, matching the reference's
`python_scripts/utils/pack_waveform.py:60-104`).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def bank_rows(bank: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather wav rows ``idx`` from a device bank and re-expand the
    compact storage dtype to f32 (f16 banks are lossless for corpora
    packed as int16/f16 waveforms)."""
    wav = jnp.take(bank, idx, axis=0)
    if wav.dtype in (jnp.float16, jnp.bfloat16):
        wav = wav.astype(jnp.float32)
    elif wav.dtype == jnp.int16:
        wav = wav.astype(jnp.float32) / 32768.0
    return wav


def build_wav_bank(dataset) -> Tuple[jax.Array, np.ndarray]:
    """Build a ``[N, max_len]`` float16 device bank over
    ``dataset.audio_ids`` (InferenceDataset / CaptionDataset).

    Returns ``(bank, lens)``: row ``i`` holds ``get_audio(audio_ids[i])``
    zero-padded to the corpus max; ``lens[i]`` is its true sample count.
    Pair with ``dataset.enable_wav_index(lens)`` so items emit
    ``{wav_idx, wav_len}`` instead of samples.
    """
    n = len(dataset.audio_ids)
    wavs = []
    max_len = 0
    for aid in dataset.audio_ids:
        w = np.asarray(dataset.get_audio(aid), np.float16)
        wavs.append(w)
        max_len = max(max_len, w.shape[0])
    lens = np.asarray([w.shape[0] for w in wavs], np.int32)
    # rows may be [T] waveforms or [T, D] precomputed features (the
    # feature-input families, e.g. M2) — pad along axis 0 either way
    bank = np.zeros((n, max_len) + wavs[0].shape[1:], np.float16)
    for i, w in enumerate(wavs):
        bank[i, : w.shape[0]] = w
    return jax.device_put(jnp.asarray(bank)), lens
