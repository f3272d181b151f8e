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
    """Inverted-residual block with SE, swish, drop-connect.

    ``oup_override``/``squeeze_override`` let structurally pruned models
    (build_pruned_effb2) set explicit internal channel counts."""
    in_filters: int
    out_filters: int
    kernel: int
    stride: int
    expand_ratio: int
    nominal_size: int
    drop_rate: float = 0.0
    compute_dtype: Any = jnp.float32
    oup_override: Optional[int] = None
    squeeze_override: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        bn = lambda name: BatchNorm(momentum=0.99, epsilon=1e-3,
                                    compute_dtype=cd, name=name)
        inputs = x
        oup = (self.oup_override if self.oup_override is not None
               else self.in_filters * self.expand_ratio)
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
        n_squeeze = (self.squeeze_override
                     if self.squeeze_override is not None
                     else max(1, int(self.in_filters * _SE_RATIO)))
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
    remat: bool = False   # rematerialize each MBConv block in backward
                          # (trade FLOPs for HBM -> larger train batches)

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
        block_cls = (nn.remat(MBConvBlock, static_argnums=(2,))
                     if self.remat else MBConvBlock)
        for idx, args in enumerate(plan):
            x = block_cls(
                compute_dtype=cd,
                drop_rate=self.drop_connect_rate * idx / n_blocks,
                name=f"block{idx}", **args)(x, train)

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


class PrunedEfficientNetB2(nn.Module):
    """EfficientNet-B2 with explicit per-layer channel counts, produced
    by ``build_pruned_effb2`` (reference get_pruned_model,
    eff_latent_encoder.py:209-349)."""
    stem_filters: int
    head_filters: int
    block_plan: Tuple[Dict, ...]     # dicts with MBConvBlock kwargs
    drop_connect_rate: float = 0.2
    compute_dtype: Any = jnp.float32
    downsample_ratio: int = 32

    @property
    def fc_emb_size(self) -> int:
        return self.head_filters

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        cd = self.compute_dtype
        x = jnp.transpose(lms, (0, 2, 1))[..., None].astype(cd)
        x = Conv2dSame(self.stem_filters, (3, 3), strides=(2, 2),
                       padding=tf_same_padding(260, 3, 2),
                       compute_dtype=cd, name="conv_stem")(x)
        x = nn.silu(BatchNorm(momentum=0.99, epsilon=1e-3,
                              compute_dtype=cd,
                              name="bn0")(x, train=train))
        n_blocks = len(self.block_plan)
        for idx, args in enumerate(self.block_plan):
            x = MBConvBlock(
                compute_dtype=cd,
                drop_rate=self.drop_connect_rate * idx / n_blocks,
                name=f"block{idx}", **args)(x, train=train)
        x = Conv2dSame(self.head_filters, (1, 1), padding=0,
                       compute_dtype=cd, name="conv_head")(x)
        x = nn.silu(BatchNorm(momentum=0.99, epsilon=1e-3,
                              compute_dtype=cd,
                              name="bn1")(x, train=train))
        attn_emb = jnp.mean(x, axis=1).astype(jnp.float32)
        out_len = feat_len // self.downsample_ratio
        fc_emb = mean_with_lens(attn_emb, out_len)
        return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                "attn_emb_len": out_len}


def build_pruned_effb2(params: Dict, stats: Dict, prune_ratio: float,
                       prune_start_layer: int = 0, prune_se: bool = True,
                       method: str = "operator_norm",
                       prune_head: bool = True
                       ) -> Tuple["PrunedEfficientNetB2", Dict, Dict]:
    """Structured filter pruning of a full EfficientNetB2 param tree
    (reference get_pruned_model, eff_latent_encoder.py:209-349).

    The dependency chain stem -> (expand -> depthwise -> se_reduce ->
    se_expand -> project)* -> head is walked exactly like the
    reference: every prunable conv keeps round(n*(1-ratio)) of its
    output filters by the given criterion, the next conv's input
    channels follow the previous conv's keep set, and depthwise convs
    inherit the preceding conv's keep set.  Blocks before
    ``prune_start_layer`` are untouched.  Returns the pruned module and
    its (params, batch_stats).
    """
    import numpy as np
    from audiocaption_tpu.utils.pruning import select_filters

    params = jax.tree_util.tree_map(np.asarray, params)
    stats = jax.tree_util.tree_map(np.asarray, stats)
    plan = _b2_block_plan()
    ratio = prune_ratio

    def n_keep(n: int) -> int:
        return max(1, int(round(n * (1.0 - ratio))))

    new_p: Dict[str, Any] = {}
    new_s: Dict[str, Any] = {}

    def prune_out(conv_p, keep):
        out = {"kernel": conv_p["kernel"][..., keep]}
        if "bias" in conv_p:
            out["bias"] = conv_p["bias"][keep]
        return out

    def prune_in(conv_p, keep):
        out = dict(conv_p)
        out["kernel"] = conv_p["kernel"][:, :, keep, :]
        return out

    def prune_bn(name, keep, src_p=None, src_s=None):
        src_p = src_p if src_p is not None else params[name]
        src_s = src_s if src_s is not None else stats[name]
        return ({k: v[keep] for k, v in src_p.items()},
                {k: v[keep] for k, v in src_s.items()})

    # stem
    stem_kernel = params["conv_stem"]["kernel"]
    if prune_start_layer <= 0:
        keep_prev = select_filters(stem_kernel, ratio, method)
    else:
        keep_prev = np.arange(stem_kernel.shape[-1])
    new_p["conv_stem"] = prune_out(params["conv_stem"], keep_prev)
    new_p["bn0"], new_s["bn0"] = prune_bn("bn0", keep_prev)
    stem_filters = len(keep_prev)

    block_plan = []
    for idx, args in enumerate(plan):
        bp = dict(params[f"block{idx}"])
        bs = dict(stats[f"block{idx}"])
        prune_this = idx >= max(prune_start_layer - 1, 0) if \
            prune_start_layer > 0 else True
        nb_p: Dict[str, Any] = {}
        nb_s: Dict[str, Any] = {}
        e = args["expand_ratio"]

        if e != 1:
            ek = prune_in(bp["expand_conv"], keep_prev)
            if prune_this:
                keep = select_filters(bp["expand_conv"]["kernel"], ratio,
                                      method)
            else:
                keep = np.arange(bp["expand_conv"]["kernel"].shape[-1])
            nb_p["expand_conv"] = prune_out(ek, keep)
            nb_p["bn0"], nb_s["bn0"] = prune_bn(
                None, keep, bp["bn0"], bs["bn0"])
            keep_prev = keep
        # depthwise inherits the previous conv's keep set
        nb_p["depthwise_conv"] = {
            "kernel": bp["depthwise_conv"]["kernel"][..., keep_prev]}
        nb_p["bn1"], nb_s["bn1"] = prune_bn(
            None, keep_prev, bp["bn1"], bs["bn1"])
        oup = len(keep_prev)

        # SE: reduce output pruned by its own ranking (when prune_se),
        # expand output sized back to oup by its own ranking
        se_r = prune_in(bp["se_reduce"], keep_prev)
        if prune_se and prune_this:
            keep_sq = select_filters(bp["se_reduce"]["kernel"], ratio,
                                     method)
        else:
            keep_sq = np.arange(bp["se_reduce"]["kernel"].shape[-1])
        nb_p["se_reduce"] = prune_out(se_r, keep_sq)
        se_e = prune_in(bp["se_expand"], keep_sq)
        if prune_this:
            keep_se_out = select_filters(bp["se_expand"]["kernel"],
                                         ratio, method)[:oup]
        else:
            keep_se_out = np.arange(oup)
        nb_p["se_expand"] = prune_out(se_e, keep_se_out)

        pk = prune_in(bp["project_conv"], keep_se_out)
        if prune_this:
            keep_out = select_filters(bp["project_conv"]["kernel"],
                                      ratio, method)
        else:
            keep_out = np.arange(bp["project_conv"]["kernel"].shape[-1])
        nb_p["project_conv"] = prune_out(pk, keep_out)
        nb_p["bn2"], nb_s["bn2"] = prune_bn(
            None, keep_out, bp["bn2"], bs["bn2"])

        block_plan.append(dict(
            in_filters=stem_filters if idx == 0 else block_plan[-1][
                "out_filters"],
            out_filters=len(keep_out), kernel=args["kernel"],
            stride=args["stride"], expand_ratio=e,
            nominal_size=args["nominal_size"],
            oup_override=oup, squeeze_override=len(keep_sq)))
        new_p[f"block{idx}"] = nb_p
        new_s[f"block{idx}"] = nb_s
        keep_prev = keep_out

    hk = prune_in(params["conv_head"], keep_prev)
    if prune_head:
        keep_head = select_filters(params["conv_head"]["kernel"], ratio,
                                   method)
    else:
        # keep the 1408-dim interface so a decoder built for the full
        # encoder still fits
        keep_head = np.arange(params["conv_head"]["kernel"].shape[-1])
    new_p["conv_head"] = prune_out(hk, keep_head)
    new_p["bn1"], new_s["bn1"] = prune_bn("bn1", keep_head)

    model = PrunedEfficientNetB2(stem_filters=stem_filters,
                                 head_filters=len(keep_head),
                                 block_plan=tuple(block_plan))
    return model, new_p, new_s
