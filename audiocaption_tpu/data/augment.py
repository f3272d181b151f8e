"""Per-item data augmentation transforms
(captioning/datasets/augment.py:1-136): numpy functions applied in the
dataset/dataloader workers (host side), mirroring the reference's
registry semantics.  Spectrogram-level SpecAugment for the on-device
path lives in ops/specaug.py.
"""

from __future__ import annotations

import random
from typing import Callable, Dict, List, Optional

import numpy as np


def gaussian_noise(snr_db: float = 20.0) -> Callable:
    """Additive white noise at the given SNR (augment.py gaussian_noise)."""
    def tf(wav: np.ndarray) -> np.ndarray:
        power = np.mean(wav ** 2) + 1e-12
        noise_power = power / (10 ** (snr_db / 10))
        noise = np.random.randn(*wav.shape) * np.sqrt(noise_power)
        return (wav + noise).astype(np.float32)
    return tf


def random_crop(crop_ratio: float = 0.9) -> Callable:
    def tf(wav: np.ndarray) -> np.ndarray:
        n = int(len(wav) * crop_ratio)
        if n >= len(wav):
            return wav
        start = random.randint(0, len(wav) - n)
        return wav[start:start + n]
    return tf


def time_roll(max_shift: Optional[int] = None) -> Callable:
    def tf(wav: np.ndarray) -> np.ndarray:
        shift = random.randint(0, max_shift if max_shift else len(wav))
        return np.roll(wav, shift)
    return tf


def freq_mask(max_width: int = 8, num: int = 2) -> Callable:
    """Spectrogram [T, F] frequency stripes -> 0."""
    def tf(spec: np.ndarray) -> np.ndarray:
        spec = spec.copy()
        F = spec.shape[1]
        for _ in range(num):
            w = random.randint(0, max_width)
            f0 = random.randint(0, max(F - w, 1))
            spec[:, f0:f0 + w] = 0
        return spec
    return tf


def time_mask(max_width: int = 64, num: int = 2) -> Callable:
    """Spectrogram [T, F] time stripes -> 0."""
    def tf(spec: np.ndarray) -> np.ndarray:
        spec = spec.copy()
        T = spec.shape[0]
        for _ in range(num):
            w = random.randint(0, max_width)
            t0 = random.randint(0, max(T - w, 1))
            spec[t0:t0 + w, :] = 0
        return spec
    return tf


def spec_augment_np(time_width: int = 64, time_num: int = 2,
                    freq_width: int = 8, freq_num: int = 2) -> Callable:
    fm = freq_mask(freq_width, freq_num)
    tm = time_mask(time_width, time_num)
    def tf(spec: np.ndarray) -> np.ndarray:
        return fm(tm(spec))
    return tf


_REGISTRY = {
    "gaussian_noise": gaussian_noise,
    "random_crop": random_crop,
    "time_roll": time_roll,
    "freq_mask": freq_mask,
    "time_mask": time_mask,
    "spec_augment": spec_augment_np,
}


def build_transforms(specs: Optional[List[Dict]]) -> List[Callable]:
    """[{type: name, args: {...}}] -> callables (caption_dataset.py:38-49)."""
    if not specs:
        return []
    out = []
    for spec in specs:
        name = spec["type"].split(".")[-1]
        out.append(_REGISTRY[name](**(spec.get("args", {}) or {})))
    return out


def time_warp(max_shift: int = 5) -> Callable:
    """SpecAugment time warping on a spectrogram [T, F]: a random anchor
    in the middle is shifted by up to max_shift frames, with the time
    axis piecewise-linearly resampled (host-side counterpart of the
    reference's sparse-image-warp time_warp, nb_SparseImageWarp.py)."""
    def tf(spec: np.ndarray) -> np.ndarray:
        T = spec.shape[0]
        if T < 2 * max_shift + 2:
            return spec
        anchor = random.randint(max_shift + 1, T - max_shift - 1)
        shift = random.randint(-max_shift, max_shift)
        if shift == 0:
            return spec
        # piecewise-linear remap of source coords: 0->0, anchor+shift->
        # anchor, T-1->T-1
        dst = np.arange(T, dtype=np.float64)
        src = np.interp(dst, [0, anchor + shift, T - 1],
                        [0, anchor, T - 1])
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, T - 1)
        frac = (src - lo)[:, None]
        return ((1 - frac) * spec[lo] + frac * spec[hi]).astype(spec.dtype)
    return tf


_REGISTRY["time_warp"] = time_warp
