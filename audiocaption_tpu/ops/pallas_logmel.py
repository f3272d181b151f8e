"""Fused log-mel spectrogram Pallas kernel.

One kernel fuses: framing -> windowed real DFT (MXU matmul) -> power ->
mel projection (MXU matmul) -> dB, writing [TILE, n_mels] per program.
The XLA path (ops/frontend.py) already avoids frame materialization via
a strided conv; this kernel additionally keeps the *whole* pipeline in
VMEM with zero HBM round-trips between stages and demonstrates the
framing-by-strided-slices trick:

Because hop divides the tile stride, the waveform window for a tile
reshapes to rows of ``hop`` samples, and frame f is the concatenation of
rows [f, f+chunks) (last chunk partial) — all static slices, no gather:

    A = window.reshape(rows, hop)               # [rows, hop]
    frames = concat([A[i : i+TILE, :w_i] for i in range(chunks)], -1)

Inputs are pre-padded by the host wrapper: reflect pad n_fft//2 (torch
center semantics) + zero pad up to a whole number of tiles.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiocaption_tpu.ops.frontend import (
    MelConfig, _dft_basis, hann_window, mel_filterbank)

TILE = 128          # frames per program
LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _logmel_kernel(wav_hbm, basis_ref, mel_ref, out_ref, scratch, sem, *,
                   n_fft: int, hop: int, tile_rows: int):
    """Grid (B, n_tiles).  The waveform stays in HBM; each program DMAs
    its overlapping window (start = t*TILE*hop — overlap across tiles is
    why a BlockSpec can't carve this) into VMEM scratch, then runs the
    whole framing -> DFT -> power -> mel -> dB pipeline on-chip."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    dma = pltpu.make_async_copy(
        wav_hbm.at[b, pl.ds(t * TILE, tile_rows)], scratch, sem)
    dma.start()
    dma.wait()

    chunks = -(-n_fft // hop)                     # ceil
    a = scratch[:]                                # [tile_rows, hop]
    # frames @ basis as a sum of per-chunk matmuls: frame f is rows
    # [f, f+chunks) of ``a``, so  proj = sum_i a[i:i+TILE] @ basis_i
    # where basis_i = basis[i*hop : i*hop + w_i].  This avoids both the
    # frame concat (Mosaic rejects lane-concat at unaligned offsets)
    # and any gather.
    proj = None
    for i in range(chunks):
        width = min(hop, n_fft - i * hop)
        shifted = pltpu.roll(a, tile_rows - i, 0) if i else a
        part = shifted[:TILE, :width]
        b_i = basis_ref[pl.ds(i * hop, width), :]
        term = jnp.dot(part, b_i, preferred_element_type=jnp.float32)
        proj = term if proj is None else proj + term   # [TILE, 2F_pad]
    f_pad = proj.shape[-1] // 2
    re, im = proj[:, :f_pad], proj[:, f_pad:]
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:],
                  preferred_element_type=jnp.float32)   # [TILE, n_mels_pad]
    out_ref[0] = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("config",))
def pallas_logmel(wav: jnp.ndarray, config: MelConfig) -> jnp.ndarray:
    """[B, T] waveform -> log-mel [B, T // hop + 1, n_mels] (float32).

    Matches LogMelFrontend numerically (same basis/filterbank); top_db
    clamping (EffB2 config) is applied outside the kernel.
    """
    n_fft, hop = config.n_fft, config.hop
    n_mels = config.n_mels
    B, T = wav.shape
    n_frames = T // hop + 1
    n_tiles = -(-n_frames // TILE)

    # windowed DFT basis, freq-padded so both halves are lane-aligned
    n_freqs = n_fft // 2 + 1
    f_pad = _round_up(n_freqs, LANE)
    basis = _dft_basis(n_fft, hann_window(n_fft))      # [n_fft, 2*n_freqs]
    basis_pad = np.zeros((n_fft, 2 * f_pad), np.float32)
    basis_pad[:, :n_freqs] = basis[:, :n_freqs]
    basis_pad[:, f_pad:f_pad + n_freqs] = basis[:, n_freqs:]
    mel_fb = mel_filterbank(n_freqs, config.f_min, config.effective_f_max,
                            n_mels, config.sample_rate, config.norm,
                            config.mel_scale)          # [n_freqs, n_mels]
    n_mels_pad = _round_up(n_mels, LANE)
    mel_pad = np.zeros((f_pad, n_mels_pad), np.float32)
    mel_pad[:n_freqs, :n_mels] = mel_fb

    # host-side padding: torch center reflect + zero fill to whole tiles
    pad = n_fft // 2
    chunks = -(-n_fft // hop)
    # DMA row counts must be sublane-aligned (multiples of 8)
    tile_rows = _round_up(TILE + chunks - 1, 8)
    total_rows = n_tiles * TILE + (tile_rows - TILE)
    total = total_rows * hop
    wav_p = jnp.pad(wav.astype(jnp.float32), ((0, 0), (pad, pad)),
                    mode="reflect")
    wav_p = jnp.pad(wav_p, ((0, 0), (0, max(0, total - wav_p.shape[1]))))
    wav_p = wav_p[:, :total].reshape(B, total_rows, hop)
    # lane-align each sample row for the DMA (zeros beyond ``hop`` are
    # never read: the chunk matmuls slice [:, :width])
    hop_pad = _round_up(hop, LANE)
    wav_p = jnp.pad(wav_p, ((0, 0), (0, 0), (0, hop_pad - hop)))

    out = pl.pallas_call(
        functools.partial(_logmel_kernel, n_fft=n_fft, hop=hop,
                          tile_rows=tile_rows),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # waveform in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, n_mels_pad),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, n_mels_pad),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, hop_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(wav_p, jnp.asarray(basis_pad), jnp.asarray(mel_pad))

    lms = out[:, :n_frames, :n_mels]
    if config.top_db is not None:
        floor = jnp.max(lms, axis=(1, 2), keepdims=True) - config.top_db
        lms = jnp.maximum(lms, floor)
    return lms
