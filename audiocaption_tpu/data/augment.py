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


# ------------------------------------------------------- sparse image warp --
# Faithful numpy port of the reference's 2-D polyharmonic-spline warp
# (captioning/datasets/nb_SparseImageWarp.py) used by its time_warp
# (augment.py:9-35).  Reference BEHAVIOR is preserved verbatim,
# including two quirks of that notebook code:
#   * cross_squared_distance_matrix sums the norms over ALL elements
#     (scalars), not per-row — the "distances" it feeds to the spline
#     kernel are Sx + Sy - 2 x_i.y_j;
#   * only the first F//2 frequency rows get control points.
# (The torch original no longer runs as-is under torch>=2 — torch.solve
# was removed; the parity test shims it.)


def _phi2(r: np.ndarray) -> np.ndarray:
    """Order-2 polyharmonic kernel 0.5 * r * log(max(r, eps))
    (nb_SparseImageWarp.phi, order==2)."""
    return 0.5 * r * np.log(np.maximum(r, 1e-10))


def _cross_sqdist_quirk(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Reference cross_squared_distance_matrix INCLUDING its scalar-norm
    quirk (nb_SparseImageWarp.py:118-136)."""
    return float(np.sum(x * x)) + float(np.sum(y * y)) - 2.0 * (x @ y.T)


def sparse_image_warp_np(img: np.ndarray, src_pts: np.ndarray,
                         dst_pts: np.ndarray) -> np.ndarray:
    """img [H, W], control points [n, 2] as (y, x) -> warped [H, W]
    (nb_SparseImageWarp.sparse_image_warp, order 2, no regularization).

    The spline system is SINGULAR under the scalar-norm quirk (rank ~7
    of n+3); the reference gets a solution anyway because float32
    rounding + its randn*eps corner block make the LU numerically
    nonsingular.  Measured: that noisy solution is the minimum-norm
    least-squares solution up to the noise (max flow diff ~0.3 px
    across torch seeds, same smooth field) — so the well-defined
    equivalent used here is lstsq, and the parity test pins the flow
    field against the torch oracle to that tolerance."""
    H, W = img.shape
    c = np.asarray(dst_pts, np.float64)
    # control point flows = dest - source (nb_SparseImageWarp.py:16)
    f = c - np.asarray(src_pts, np.float64)
    n = c.shape[0]
    # solve_interpolation (nb_SparseImageWarp.py:73-116)
    A = _phi2(_cross_sqdist_quirk(c, c))
    B = np.concatenate([c, np.ones((n, 1))], axis=1)           # [n, 3]
    lhs = np.block([[A, B], [B.T, np.zeros((3, 3))]])
    rhs = np.concatenate([f, np.zeros((3, 2))], axis=0)
    X, _, _, _ = np.linalg.lstsq(lhs, rhs, rcond=None)
    w, v = X[:n], X[n:]
    # apply_interpolation at every grid point (:165-195)
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    q = np.stack([yy.ravel(), xx.ravel()], axis=-1)            # [HW, 2]
    flows = _phi2(_cross_sqdist_quirk(q, c)) @ w \
        + np.concatenate([q, np.ones((len(q), 1))], axis=1) @ v
    flow = flows.reshape(H, W, 2)
    # dense_image_warp: query = grid - flow, bilinear, clamped (:198-343)
    qy = yy - flow[..., 0]
    qx = xx - flow[..., 1]
    fy = np.clip(np.floor(qy), 0, H - 2)
    fx = np.clip(np.floor(qx), 0, W - 2)
    ay = np.clip(qy - fy, 0.0, 1.0)
    ax = np.clip(qx - fx, 0.0, 1.0)
    fy = fy.astype(np.intp)
    fx = fx.astype(np.intp)
    tl = img[fy, fx]
    tr = img[fy, fx + 1]
    bl = img[fy + 1, fx]
    br = img[fy + 1, fx + 1]
    top = tl + ax * (tr - tl)
    bot = bl + ax * (br - bl)
    # (warped, dense_flows), like the reference's sparse_image_warp
    return (top + ay * (bot - top)).astype(img.dtype), flow


def time_warp_points(T: int, F: int, pt: float, shift: float
                     ) -> tuple:
    """Control points of the reference time_warp (augment.py:14-26):
    the first F//2 frequency rows, all at time ``pt``, displaced by
    ``shift`` along time.  Image coords are (y=freq, x=time) on the
    TRANSPOSED [F, T] spectrogram."""
    freqs = np.arange(F // 2, dtype=np.float64)
    src = np.stack([freqs, np.full(F // 2, pt)], axis=-1)
    dst = np.stack([freqs, np.full(F // 2, pt + shift)], axis=-1)
    return src, dst


def time_warp(W: int = 5) -> Callable:
    """SpecAugment time warping on a spectrogram [T, F] via the 2-D
    sparse image warp (reference augment.py:9-35): a random time point
    pt ~ U[W, T-W) is displaced by w ~ U[-W, W), the displacement
    spline-extrapolated to a dense flow, and the image bilinearly
    resampled."""
    def tf(spec: np.ndarray) -> np.ndarray:
        T, F = spec.shape
        if T - 2 * W <= 0 or F < 2:
            return spec
        pt = (T - 2 * W) * random.random() + W
        shift = 2 * W * random.random() - W
        src, dst = time_warp_points(T, F, pt, shift)
        warped, _ = sparse_image_warp_np(spec.T, src, dst)
        return warped.T
    return tf


_REGISTRY["time_warp"] = time_warp
