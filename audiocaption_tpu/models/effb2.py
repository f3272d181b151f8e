"""EfficientNet-B2 audio encoder (TPU re-design of the reference's HEAR
efficient-latent backbone: eff_latent_encoder.py:25-71, hf_wrapper.py:
229-315).

Spectrograms enter as images with mel bins on the H axis and time on W
(reference: rearrange 'b f t -> b 1 f t').  The backbone is a standard
EfficientNet (width 1.1, depth 1.2, head 1408, swish, SE 0.25) with
**static TF-SAME padding computed from the nominal 260x260 image size**
— efficientnet_pytorch bakes the padding at construction from
global_params.image_size, so real spectrogram inputs of any length get
the 260-derived padding.  We reproduce that exactly; it matters for
checkpoint-level parity.

Output contract (hf_wrapper.py:287-315):
{fc_emb [B, 1408], attn_emb [B, T//32, 1408], attn_emb_len [B]}.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import BatchNorm, Conv2dSame
from audiocaption_tpu.ops.masking import mean_with_lens

Array = jnp.ndarray

# EfficientNet-B0 block args: (repeats, kernel, stride, expand, in, out)
_B0_BLOCKS = [
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
]
_SE_RATIO = 0.25


def round_filters(filters: float, width: float, divisor: int = 8) -> int:
    """efficientnet_pytorch round_filters."""
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def tf_same_padding(image_size: int, kernel: int, stride: int
                    ) -> Tuple[int, int, int, int]:
    """Static TF-SAME padding (top, bottom, left, right) for a square
    nominal image (efficientnet_pytorch Conv2dStaticSamePadding)."""
    ih = image_size
    oh = math.ceil(ih / stride)
    pad = max((oh - 1) * stride + kernel - ih, 0)
    lo, hi = pad // 2, pad - pad // 2
    return (lo, hi, lo, hi)


class MBConvBlock(nn.Module):
    """Inverted-residual block with SE, swish, drop-connect."""
    in_filters: int
    out_filters: int
    kernel: int
    stride: int
    expand_ratio: int
    nominal_size: int
    drop_rate: float = 0.0
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        bn = lambda name: BatchNorm(momentum=0.99, epsilon=1e-3,
                                    compute_dtype=cd, name=name)
        inputs = x
        oup = self.in_filters * self.expand_ratio
        if self.expand_ratio != 1:
            x = Conv2dSame(oup, (1, 1), padding=0, compute_dtype=cd,
                           name="expand_conv")(x)
            x = nn.silu(bn("bn0")(x, train=train))
        pad = tf_same_padding(self.nominal_size, self.kernel, self.stride)
        x = Conv2dSame(oup, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding=pad,
                       groups=oup, compute_dtype=cd,
                       name="depthwise_conv")(x)
        x = nn.silu(bn("bn1")(x, train=train))

        # Squeeze-and-excitation (channels from *input* filters)
        n_squeeze = max(1, int(self.in_filters * _SE_RATIO))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv2dSame(n_squeeze, (1, 1), padding=0, use_bias=True,
                       compute_dtype=cd, name="se_reduce")(s)
        s = Conv2dSame(oup, (1, 1), padding=0, use_bias=True,
                       compute_dtype=cd, name="se_expand")(nn.silu(s))
        x = jax.nn.sigmoid(s) * x

        x = Conv2dSame(self.out_filters, (1, 1), padding=0, compute_dtype=cd,
                       name="project_conv")(x)
        x = bn("bn2")(x, train=train)

        if self.stride == 1 and self.in_filters == self.out_filters:
            if train and self.drop_rate > 0:
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jnp.floor(
                    keep + jax.random.uniform(rng, (x.shape[0], 1, 1, 1)))
                x = x / keep * mask
            x = x + inputs
        return x


def _b2_block_plan(width: float = 1.1, depth: float = 1.2,
                   image_size: int = 260) -> List[Dict]:
    """Expand the B0 args into the per-block build plan for B2, tracking
    the nominal image size for static padding."""
    plan = []
    size = math.ceil(image_size / 2)  # after stem stride 2
    for (r, k, s, e, i, o) in _B0_BLOCKS:
        i_r = round_filters(i, width)
        o_r = round_filters(o, width)
        for rep in range(round_repeats(r, depth)):
            stride = s if rep == 0 else 1
            plan.append(dict(in_filters=i_r if rep == 0 else o_r,
                             out_filters=o_r, kernel=k, stride=stride,
                             nominal_size=size))
            if stride > 1:
                size = math.ceil(size / stride)
            plan[-1]["expand_ratio"] = e
    return plan


class EfficientNetB2(nn.Module):
    """EfficientNet-B2 feature extractor, in_channels=1, include_top=False.

    Input: lms [B, T, n_mels]; output dict with attn_emb [B, T//32, 1408].
    """
    drop_connect_rate: float = 0.2
    compute_dtype: Any = jnp.float32
    downsample_ratio: int = 32
    fc_emb_size: int = 1408

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        cd = self.compute_dtype
        # 'b t f' -> NHWC image [B, H=f, W=t, C=1] (reference: b 1 f t)
        x = jnp.transpose(lms, (0, 2, 1))[..., None].astype(cd)

        stem_filters = round_filters(32, 1.1)
        x = Conv2dSame(stem_filters, (3, 3), strides=(2, 2),
                       padding=tf_same_padding(260, 3, 2),
                       compute_dtype=cd, name="conv_stem")(x)
        x = nn.silu(BatchNorm(momentum=0.99, epsilon=1e-3, compute_dtype=cd,
                              name="bn0")(x, train=train))

        plan = _b2_block_plan()
        n_blocks = len(plan)
        for idx, args in enumerate(plan):
            x = MBConvBlock(
                compute_dtype=cd,
                drop_rate=self.drop_connect_rate * idx / n_blocks,
                name=f"block{idx}", **args)(x, train=train)

        head_filters = round_filters(1280, 1.1)
        x = Conv2dSame(head_filters, (1, 1), padding=0, compute_dtype=cd,
                       name="conv_head")(x)
        x = nn.silu(BatchNorm(momentum=0.99, epsilon=1e-3, compute_dtype=cd,
                              name="bn1")(x, train=train))

        # reduce 'b c f t -> b t c' (mean over freq axis H)
        attn_emb = jnp.mean(x, axis=1).astype(jnp.float32)  # [B, T', C]
        out_len = feat_len // self.downsample_ratio
        fc_emb = mean_with_lens(attn_emb, out_len)
        return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                "attn_emb_len": out_len}


def convert_effb2(sd, prefix: str = "") -> Tuple[Dict, Dict]:
    """torch efficientnet_pytorch EfficientNet state_dict (HEAR effb2)
    -> (params, batch_stats).  Keys: _conv_stem, _bn0, _blocks.{i}.*,
    _conv_head, _bn1."""
    k = lambda name: f"{prefix}.{name}" if prefix else name
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(flax_name: str, torch_name: str):
        p, s = convert.batchnorm(sd, k(torch_name))
        params[flax_name] = p
        stats[flax_name] = s

    params["conv_stem"] = convert.conv2d(sd, k("_conv_stem"))
    put_bn("bn0", "_bn0")
    plan = _b2_block_plan()
    for i, args in enumerate(plan):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        tp = k(f"_blocks.{i}")
        if args["expand_ratio"] != 1:
            bp["expand_conv"] = convert.conv2d(sd, f"{tp}._expand_conv")
            p, s = convert.batchnorm(sd, f"{tp}._bn0")
            bp["bn0"], bs["bn0"] = p, s
        bp["depthwise_conv"] = convert.conv2d(sd, f"{tp}._depthwise_conv")
        p, s = convert.batchnorm(sd, f"{tp}._bn1")
        bp["bn1"], bs["bn1"] = p, s
        bp["se_reduce"] = convert.conv2d(sd, f"{tp}._se_reduce", bias=True)
        bp["se_expand"] = convert.conv2d(sd, f"{tp}._se_expand", bias=True)
        bp["project_conv"] = convert.conv2d(sd, f"{tp}._project_conv")
        p, s = convert.batchnorm(sd, f"{tp}._bn2")
        bp["bn2"], bs["bn2"] = p, s
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
    params["conv_head"] = convert.conv2d(sd, k("_conv_head"))
    put_bn("bn1", "_bn1")
    return params, stats
