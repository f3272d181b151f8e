"""EfficientAT MobileNetV3 ("mn") audio encoders (TPU re-design of
captioning/models/eff_at_encoder.py + the MobileNetV3 wrapper,
cnn_encoder.py:659-766).

Width-scaled MobileNetV3-Large backbone (RE/HS activations, SE blocks
with hard-sigmoid), slaney 32 kHz mel frontend via the shared Captioner
pipeline, downsample 32, poolings "mean_max_fc" (masked max+mean -> FC
512) or "mean" (cnn_encoder.py:703-766).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models.layers import (
    BatchNorm, Conv2dSame, torch_linear_init)
from audiocaption_tpu.ops.masking import max_with_lens, mean_with_lens

Array = jnp.ndarray

NAME_TO_WIDTH = {
    "mn01": 0.1, "mn02": 0.2, "mn04": 0.4, "mn05": 0.5, "mn06": 0.6,
    "mn08": 0.8, "mn10": 1.0, "mn12": 1.2, "mn14": 1.4, "mn16": 1.6,
    "mn20": 2.0, "mn30": 3.0, "mn40": 4.0,
}


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (in, kernel, expanded, out, use_se, activation, stride)
_V3_LARGE = [
    (16, 3, 16, 16, False, "RE", 1),
    (16, 3, 64, 24, False, "RE", 2),
    (24, 3, 72, 24, False, "RE", 1),
    (24, 5, 72, 40, True, "RE", 2),
    (40, 5, 120, 40, True, "RE", 1),
    (40, 5, 120, 40, True, "RE", 1),
    (40, 3, 240, 80, False, "HS", 2),
    (80, 3, 200, 80, False, "HS", 1),
    (80, 3, 184, 80, False, "HS", 1),
    (80, 3, 184, 80, False, "HS", 1),
    (80, 3, 480, 112, True, "HS", 1),
    (112, 3, 672, 112, True, "HS", 1),
    (112, 5, 672, 160, True, "HS", 2),
    (160, 5, 960, 160, True, "HS", 1),
    (160, 5, 960, 160, True, "HS", 1),
]


def hard_swish(x: Array) -> Array:
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hard_sigmoid(x: Array) -> Array:
    return jax.nn.relu6(x + 3.0) / 6.0


class V3InvertedResidual(nn.Module):
    inp: int
    kernel: int
    expanded: int
    out: int
    use_se: bool
    use_hs: bool
    stride: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        act = hard_swish if self.use_hs else nn.relu
        bn = lambda name: BatchNorm(momentum=0.99, epsilon=1e-3,
                                    compute_dtype=cd, name=name)
        inputs = x
        h = x
        if self.expanded != self.inp:
            h = Conv2dSame(self.expanded, (1, 1), padding=0,
                           compute_dtype=cd, name="expand")(h)
            h = act(bn("bn_expand")(h, train=train))
        pad = (self.kernel - 1) // 2
        h = Conv2dSame(self.expanded, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding=pad,
                       groups=self.expanded, compute_dtype=cd,
                       name="depthwise")(h)
        h = act(bn("bn_dw")(h, train=train))
        if self.use_se:
            n_squeeze = make_divisible(self.expanded // 4)
            s = jnp.mean(h, axis=(1, 2), keepdims=True)
            s = Conv2dSame(n_squeeze, (1, 1), padding=0, use_bias=True,
                           compute_dtype=cd, name="se_reduce")(s)
            s = Conv2dSame(self.expanded, (1, 1), padding=0, use_bias=True,
                           compute_dtype=cd,
                           name="se_expand")(nn.relu(s))
            h = hard_sigmoid(s) * h
        h = Conv2dSame(self.out, (1, 1), padding=0, compute_dtype=cd,
                       name="project")(h)
        h = bn("bn_proj")(h, train=train)
        if self.stride == 1 and self.inp == self.out:
            h = h + inputs
        return h


class MobileNetV3Encoder(nn.Module):
    """EfficientAT MobileNetV3 waveform encoder.

    ``model_name`` ("mn04".."mn40") sets the width multiplier like the
    reference's NAME_TO_WIDTH (eff_at_encoder.py:12-40).
    """
    model_name: str = "mn10"
    pooling: str = "mean_max_fc"       # or "mean"
    compute_dtype: Any = jnp.float32
    downsample_ratio: int = 32

    @property
    def width(self) -> float:
        return NAME_TO_WIDTH[self.model_name[:4]]

    @property
    def last_channels(self) -> int:
        w = self.width
        return make_divisible(make_divisible(160 * w) * 6)

    @property
    def fc_emb_size(self) -> int:
        return 512 if self.pooling == "mean_max_fc" else self.last_channels

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        cd = self.compute_dtype
        w = self.width
        adj = lambda c: make_divisible(c * w)
        drop = lambda v, p: (nn.Dropout(p, deterministic=False)(v)
                             if train else v)
        x = BatchNorm(compute_dtype=jnp.float32, name="bn0")(lms,
                                                             train=train)
        x = x[..., None].astype(cd)

        stem = adj(16)
        x = Conv2dSame(stem, (3, 3), strides=(2, 2), padding=1,
                       compute_dtype=cd, name="stem")(x)
        x = hard_swish(BatchNorm(momentum=0.99, epsilon=1e-3,
                                 compute_dtype=cd,
                                 name="bn_stem")(x, train=train))
        for i, (ci, k, ce, co, se, a, s) in enumerate(_V3_LARGE):
            x = V3InvertedResidual(
                inp=adj(ci), kernel=k, expanded=adj(ce), out=adj(co),
                use_se=se, use_hs=(a == "HS"), stride=s, compute_dtype=cd,
                name=f"block{i}")(x, train=train)
        x = Conv2dSame(self.last_channels, (1, 1), padding=0,
                       compute_dtype=cd, name="lastconv")(x)
        x = hard_swish(BatchNorm(momentum=0.99, epsilon=1e-3,
                                 compute_dtype=cd,
                                 name="bn_last")(x, train=train))

        x = jnp.mean(x, axis=2)
        attn_emb = x.astype(jnp.float32)
        out_len = feat_len // self.downsample_ratio
        if self.pooling == "mean_max_fc":
            pooled = max_with_lens(attn_emb, out_len) + \
                mean_with_lens(attn_emb, out_len)
            pooled = drop(pooled, 0.5)
            fc = nn.relu(nn.Dense(512, kernel_init=torch_linear_init,
                                  dtype=cd, param_dtype=jnp.float32,
                                  name="fc1")(pooled.astype(cd)))
            fc_emb = drop(fc.astype(jnp.float32), 0.5)
        else:
            fc_emb = mean_with_lens(attn_emb, out_len)
        return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                "attn_emb_len": out_len}


def convert_mobilenet_v3(sd, prefix: str = "") -> Tuple[Dict, Dict]:
    """EfficientAT / torchvision MobileNetV3 state_dict -> (params,
    batch_stats) for MobileNetV3Encoder.

    torch layout (eff_at_encoder.py:247-465, torchvision style):
      features.0.{0,1}                   stem conv + BN
      features.{i}.block.{j}.{0,1}       ConvNormActivation conv + BN
      features.{i}.block.{k}.conc_se_layers.0.{fc1,fc2}   SE linears
      features.16.{0,1}                  last 1x1 conv + BN
    The classifier head is not mapped (the captioning wrapper uses its
    own poolings, cnn_encoder.py:703-766).
    """
    from audiocaption_tpu.models import convert

    k = lambda n: f"{prefix}.{n}" if prefix else n
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def cna(tkey, conv_name, bn_name, tree, tree_s, depthwise=False):
        tree[conv_name] = convert.conv2d(sd, f"{tkey}.0",
                                         depthwise=depthwise)
        p, s = convert.batchnorm(sd, f"{tkey}.1")
        tree[bn_name] = p
        tree_s[bn_name] = s

    def se_linear_to_conv(tkey):
        w = sd[f"{tkey}.weight"]                  # [out, in]
        b = sd[f"{tkey}.bias"]
        return {"kernel": w.T[None, None], "bias": b}

    cna(k("features.0"), "stem", "bn_stem", params, stats)
    for i, (ci, kk, ce, co, use_se, act, s) in enumerate(_V3_LARGE):
        t = k(f"features.{i + 1}.block")
        blk: Dict[str, Any] = {}
        blk_s: Dict[str, Any] = {}
        j = 0
        if ce != ci:                              # expand present
            cna(f"{t}.{j}", "expand", "bn_expand", blk, blk_s)
            j += 1
        cna(f"{t}.{j}", "depthwise", "bn_dw", blk, blk_s, depthwise=True)
        j += 1
        if use_se and f"{t}.{j}.conc_se_layers.0.fc1.weight" in sd:
            blk["se_reduce"] = se_linear_to_conv(
                f"{t}.{j}.conc_se_layers.0.fc1")
            blk["se_expand"] = se_linear_to_conv(
                f"{t}.{j}.conc_se_layers.0.fc2")
            j += 1
        cna(f"{t}.{j}", "project", "bn_proj", blk, blk_s)
        params[f"block{i}"] = blk
        stats[f"block{i}"] = blk_s
    cna(k("features.16"), "lastconv", "bn_last", params, stats)
    return params, stats
