"""Cnn8-RNN sound-event-detection model + temporal-tag extraction
(TPU re-design of hf_wrapper.py:1791-1859 and the double-threshold /
tag logic at hf_wrapper.py:100-216).

The network runs on device; the thresholding/region logic is tiny,
data-dependent host-side numpy — exactly where the reference puts it
(device->host crossing at hf_wrapper.py:1812).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.cnn14 import convert_cnn14  # noqa: F401 (doc)
from audiocaption_tpu.models.layers import (
    BatchNorm, ConvBlock, GRU, pool_2d, torch_linear_init)

Array = jnp.ndarray


class Cnn8RnnSedModel(nn.Module):
    """4 double-conv blocks (avg+max pool) -> BiGRU -> sigmoid framewise
    probabilities at 10 ms resolution (time downsample 4, interpolated
    back)."""
    classes_num: int = 447
    time_resolution: float = 0.01
    interpolate_ratio: int = 4
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lms: Array, train: bool = False) -> Dict[str, Array]:
        """lms: [B, T, 64] -> {framewise_output [B, T, C]}."""
        cd = self.compute_dtype
        frames_num = lms.shape[1]
        drop = lambda x, p: (nn.Dropout(p, deterministic=False)(x)
                             if train else x)
        x = BatchNorm(compute_dtype=jnp.float32, name="bn0")(lms, train=train)
        x = x[..., None].astype(cd)                        # [B, T, 64, 1]
        pools = [(2, 2), (2, 2), (1, 2), (1, 2)]
        for i, (c, pool) in enumerate(zip((64, 128, 256, 512), pools)):
            x = ConvBlock(c, compute_dtype=cd, name=f"conv_block{i + 1}")(
                x, train=train)
            x = pool_2d(x, pool, "avg+max")
            x = drop(x, 0.2)
        x = jnp.mean(x, axis=2)                            # [B, T/4, 512]
        x = drop(x, 0.5)
        x = nn.relu(nn.Dense(512, kernel_init=torch_linear_init, dtype=cd,
                             param_dtype=jnp.float32, name="fc1")(x))
        # torch runs the GRU over the padded sequence without packing
        lens = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
        x, _ = GRU(hidden_size=256, bidirectional=True, name="rnn")(
            x.astype(jnp.float32), lens)
        seg = jnp.clip(nn.sigmoid(nn.Dense(
            self.classes_num, kernel_init=torch_linear_init,
            name="fc_audioset")(x)), 1e-7, 1.0)            # [B, T/4, C]
        frame = jnp.repeat(seg, self.interpolate_ratio, axis=1)
        # pad_framewise_output: repeat the last frame up to frames_num
        pad_n = frames_num - frame.shape[1]
        if pad_n > 0:
            frame = jnp.concatenate(
                [frame, jnp.repeat(frame[:, -1:], pad_n, axis=1)], axis=1)
        else:
            frame = frame[:, :frames_num]
        return {"segmentwise_output": seg, "framewise_output": frame}


def convert_cnn8rnn(sd, prefix: str = ""):
    """torch Cnn8rnnSedModel -> (params, batch_stats)."""
    k = lambda name: f"{prefix}.{name}" if prefix else name
    bn0_p, bn0_s = convert.batchnorm(sd, k("bn0"))
    params: Dict[str, Any] = {"bn0": bn0_p}
    stats: Dict[str, Any] = {"bn0": bn0_s}
    for i in range(1, 5):
        p, s = convert.conv_block(sd, k(f"conv_block{i}"))
        params[f"conv_block{i}"] = p
        stats[f"conv_block{i}"] = s
    params["fc1"] = convert.linear(sd, k("fc1"))
    params["rnn"] = convert.gru(sd, k("rnn"), 1, True)
    params["fc_audioset"] = convert.linear(sd, k("fc_audioset"))
    return params, stats


# --------------------------------------------------------------------------
# Host-side tag extraction (numpy, matches hf_wrapper.py:100-216)
# --------------------------------------------------------------------------

def find_contiguous_regions(activity: np.ndarray) -> np.ndarray:
    """Boolean [T] -> [n, 2] array of [onset, offset) index pairs."""
    activity = np.asarray(activity, bool)
    change = np.logical_xor(activity[1:], activity[:-1]).nonzero()[0] + 1
    if activity.size == 0:
        return np.zeros((0, 2), int)
    if activity[0]:
        change = np.r_[0, change]
    if activity[-1]:
        change = np.r_[change, activity.size]
    return change.reshape((-1, 2))


def _connect(pairs: List[Tuple[int, int]], n: int = 1):
    """Merge clusters whose gap is <= n."""
    if not pairs:
        return []
    merged = [list(pairs[0])]
    for start, end in pairs[1:]:
        if start - merged[-1][1] <= n:
            merged[-1][1] = end
        else:
            merged.append([start, end])
    return [tuple(p) for p in merged]


def double_threshold_1d(x: np.ndarray, high: float, low: float,
                        n_connect: int = 1) -> np.ndarray:
    """Hysteresis thresholding: keep low-threshold regions containing at
    least one sample above the high threshold."""
    high_locations = np.where(x > high)[0]
    regions = find_contiguous_regions(x > low)
    kept = [tuple(p) for p in regions
            if ((p[0] <= high_locations) & (high_locations <= p[1])).any()]
    kept = _connect(kept, n_connect)
    out = np.zeros_like(x, dtype=int)
    for s, e in kept:
        out[s:e] = 1
    return out


def double_threshold(x: np.ndarray, high: float, low: float,
                     n_connect: int = 1) -> np.ndarray:
    """x: [..., T, C] (3d) or [T, C] (2d) or [T]; thresholds over time."""
    axis = 1 if x.ndim == 3 else 0
    return np.apply_along_axis(
        lambda v: double_threshold_1d(v, high, low, n_connect), axis, x)


def segments_to_temporal_tag(segments, thre: float = 0.5) -> int:
    """[(class, onset, offset)] -> tag: 0 single event, +1 simultaneous,
    +2 sequential (hf_wrapper.py:191-203; README table at 114-124)."""
    after_flag, while_flag = 0, 0
    for j in range(len(segments)):
        for k in range(len(segments)):
            if segments[j][0] == segments[k][0]:
                continue
            min_duration = min(segments[j][2] - segments[j][1],
                               segments[k][2] - segments[k][1])
            overlap = segments[j][2] - segments[k][1]
            if overlap < thre * min_duration:
                after_flag = 2
            if segments[j][1] < segments[k][1] and \
                    overlap > thre * min_duration:
                while_flag = 1
    return after_flag + while_flag


def framewise_to_temporal_tags(framewise: np.ndarray,
                               time_resolution: float = 0.01,
                               high: float = 0.75,
                               low: float = 0.25) -> np.ndarray:
    """framewise probs [B, T, C] -> temporal tag per sample [B]
    (hf_wrapper.py:205-216 decode_with_timestamps + 1810-1818)."""
    thresholded = double_threshold(framewise, high, low)
    tags = []
    for lab in thresholded:
        segments = []
        for cls, column in enumerate(lab.T):
            for onset, offset in find_contiguous_regions(column):
                segments.append((cls, onset * time_resolution,
                                 offset * time_resolution))
        tags.append(segments_to_temporal_tag(segments))
    return np.asarray(tags, np.int32)
