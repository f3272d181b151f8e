"""Fused MBConv block Pallas kernel for EfficientNet inference.

The XLA path materializes every MBConv intermediate in HBM — for the
early high-resolution blocks the 6x-expanded activation is ~400 MB at
batch 128, and each block makes ~6 HBM passes over it (the EffB2
backbone measures at 2% MXU utilization, activation-bandwidth bound,
NOTES_ROUND1.md).  This kernel runs an ENTIRE stride-1 block per grid
step with the whole per-sample feature map resident in VMEM:

    expand (1x1 matmul, BN folded) -> swish
    -> depthwise conv (static shift-and-accumulate) -> swish
    -> squeeze-excitation (global mean available in-VMEM: single pass)
    -> project (1x1 matmul, BN folded) -> +residual

HBM traffic per block drops from ~6 passes of the expanded tensor to
one read of the input and one write of the output.

Alignment strategy (Mosaic): the host pads the input spatially with the
block's TF-SAME padding AND rounds the width up so every (bb*H*W, C)
flatten keeps the sublane dim a multiple of 8; padded columns are
masked out of the SE mean with an iota mask.  Stride-2 blocks (6 of 23)
are out of scope — a whole-encoder deployment would fall back to XLA
for them.  NOTE whole-block fusion was measured 3.3x SLOWER than XLA's
own fusion at EffB2 shapes (Mosaic relayout copies; PERF.md), so no
production path uses this kernel — it is kept as a tested building
block for architectures with larger channel counts.

BatchNorm folding (inference) happens host-side in ``pack_mbconv``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class MBConvSpec(NamedTuple):
    in_ch: int
    out_ch: int
    exp_ch: int
    kernel: int
    stride: int
    pad: Tuple[int, int, int, int]     # (top, bottom, left, right)
    has_expand: bool
    has_residual: bool


def fold_bn(kernel: np.ndarray, bias, bn_p: Dict, bn_s: Dict,
            eps: float = 1e-3) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BatchNorm (eval) into conv kernel [..., O] + bias [O]."""
    scale = np.asarray(bn_p["scale"], np.float64)
    shift = np.asarray(bn_p["bias"], np.float64)
    mean = np.asarray(bn_s["mean"], np.float64)
    var = np.asarray(bn_s["var"], np.float64)
    inv = scale / np.sqrt(var + eps)
    k = np.asarray(kernel, np.float64) * inv
    b = (np.zeros_like(mean) if bias is None else
         np.asarray(bias, np.float64))
    b = (b - mean) * inv + shift
    return k.astype(np.float32), b.astype(np.float32)


def pack_mbconv(params: Dict, stats: Dict, spec: MBConvSpec
                ) -> Dict[str, np.ndarray]:
    """EffB2 MBConvBlock flax params -> folded kernel weights."""
    out: Dict[str, np.ndarray] = {}
    if spec.has_expand:
        w, b = fold_bn(params["expand_conv"]["kernel"][0, 0], None,
                       params["bn0"], stats["bn0"])
        out["w_exp"], out["b_exp"] = w, b[None]              # [C,E],[1,E]
    wd, bd = fold_bn(params["depthwise_conv"]["kernel"][:, :, 0, :], None,
                     params["bn1"], stats["bn1"])
    out["w_dw"], out["b_dw"] = wd, bd[None]                  # [k,k,E],[1,E]
    out["w_ser"] = np.asarray(params["se_reduce"]["kernel"][0, 0],
                              np.float32)
    out["b_ser"] = np.asarray(params["se_reduce"]["bias"],
                              np.float32)[None]
    out["w_see"] = np.asarray(params["se_expand"]["kernel"][0, 0],
                              np.float32)
    out["b_see"] = np.asarray(params["se_expand"]["bias"],
                              np.float32)[None]
    wp, bp = fold_bn(params["project_conv"]["kernel"][0, 0], None,
                     params["bn2"], stats["bn2"])
    out["w_proj"], out["b_proj"] = wp, bp[None]              # [E,Co],[1,Co]
    return out


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mbconv_s1_kernel(*refs, spec: MBConvSpec, hp: int, wp: int,
                      wo_valid: int, bb: int):
    """Stride-1 fused block.  Input block: pre-padded [bb, hp, wp, C]
    with wp a multiple of 8 and wp >= wo_valid + k - 1; the depthwise
    column shifts use pltpu.roll so all intermediates keep the aligned
    width wp (wrap-around garbage lands in columns >= wp - k + 1, past
    the valid region).  Output [bb, ho, wp, Co]; the caller slices the
    valid [:wo_valid] columns and adds the residual in XLA."""
    idx = 0
    x_ref = refs[idx]; idx += 1
    names = (["w_exp", "b_exp"] if spec.has_expand else []) + \
        ["w_dw", "b_dw", "w_ser", "b_ser", "w_see", "b_see",
         "w_proj", "b_proj"]
    wrefs = {n: refs[idx + i] for i, n in enumerate(names)}
    idx += len(names)
    out_ref = refs[idx]

    k = spec.kernel
    E = spec.exp_ch
    ho = hp - k + 1
    wd = x_ref.dtype                                 # work dtype (bf16/f32)

    x = x_ref[:]                                     # [bb, hp, wp, C]
    if spec.has_expand:
        x2 = x.reshape(bb * hp * wp, spec.in_ch)
        e = jnp.dot(x2, wrefs["w_exp"][:].astype(wd),
                    preferred_element_type=jnp.float32) + wrefs["b_exp"][:]
        e = _swish(e).astype(wd).reshape(bb, hp, wp, E)
    else:
        e = x    # expand_ratio == 1: depthwise applies directly

    wo_pad = wp - k + 1
    acc = None
    for ki in range(k):
        rows = e[:, ki:ki + ho]                      # outer-dim slice
        for kj in range(k):
            part = rows[:, :, kj:kj + wo_pad, :]     # sublane-offset slice
            term = part * wrefs["w_dw"][ki, kj, :].astype(wd)
            acc = term if acc is None else acc + term
    d = _swish(acc.astype(jnp.float32) + wrefs["b_dw"][:])

    # SE over valid columns only (padded cols masked)
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, ho, wo_pad, 1), 2)
    dm = jnp.where(col < wo_valid, d, 0.0)
    se = jnp.sum(dm.reshape(bb, ho * wo_pad, E), axis=1) / \
        jnp.float32(ho * wo_valid)                   # [bb, E]
    se = jnp.dot(se, wrefs["w_ser"][:],
                 preferred_element_type=jnp.float32) + wrefs["b_ser"][:]
    se = jnp.dot(_swish(se), wrefs["w_see"][:],
                 preferred_element_type=jnp.float32) + wrefs["b_see"][:]
    se = jax.nn.sigmoid(se)
    d = (d * se[:, None, None, :]).astype(wd)

    p = jnp.dot(d.reshape(bb * ho * wo_pad, E),
                wrefs["w_proj"][:].astype(wd),
                preferred_element_type=jnp.float32) + wrefs["b_proj"][:]
    out_ref[:] = p.reshape(bb, ho, wo_pad,
                           spec.out_ch).astype(out_ref.dtype)


def fused_mbconv_s1(x: jnp.ndarray, weights: Dict[str, jnp.ndarray],
                    spec: MBConvSpec, block_batch: int = 1) -> jnp.ndarray:
    """Stride-1 fused MBConv. x: [B, H, W, C] -> [B, H', W', Co]
    (same-padded per spec.pad; residual added here in XLA)."""
    assert spec.stride == 1
    B, H, W, C = x.shape
    k = spec.kernel
    pt, pb, plft, prt = spec.pad
    Ho = H + pt + pb - k + 1
    Wo = W + plft + prt - k + 1
    # wo_pad = wp - k + 1 must be 16-aligned (bf16 sublane tiles) and
    # >= Wo; the expand flatten uses wp (Mosaic relayouts if unaligned)
    wp = _round_up(max(W + plft + prt, Wo) - k + 1, 16) + k - 1
    xp = jnp.pad(x, ((0, 0), (pt, pb),
                     (plft, wp - W - plft), (0, 0)))
    hp = H + pt + pb
    bb = block_batch
    assert B % bb == 0

    names = (["w_exp", "b_exp"] if spec.has_expand else []) + \
        ["w_dw", "b_dw", "w_ser", "b_ser", "w_see", "b_see",
         "w_proj", "b_proj"]
    w_inputs = [weights[n] for n in names]
    kernel = functools.partial(_mbconv_s1_kernel, spec=spec, hp=hp, wp=wp,
                               wo_valid=Wo, bb=bb)
    out = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[pl.BlockSpec((bb, hp, wp, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(w_inputs),
        out_specs=pl.BlockSpec((bb, Ho, wp - k + 1, spec.out_ch),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, wp - k + 1, spec.out_ch),
                                       x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(xp, *w_inputs)
    out = out[:, :, :Wo, :]
    if spec.has_residual:
        out = out + x
    return out


def xla_mbconv(x: jnp.ndarray, weights: Dict[str, jnp.ndarray],
               spec: MBConvSpec) -> jnp.ndarray:
    """XLA fallback with the same folded weights (any stride)."""
    pt, pb, plft, prt = spec.pad
    if spec.has_expand:
        e = jnp.einsum("bhwc,ce->bhwe", x, weights["w_exp"],
                       preferred_element_type=jnp.float32)
        e = _swish(e + weights["b_exp"][0])
    else:
        e = x.astype(jnp.float32)
    E = spec.exp_ch
    dw_kernel = weights["w_dw"][:, :, None, :]        # [k, k, 1, E]
    d = jax.lax.conv_general_dilated(
        e, dw_kernel, window_strides=(spec.stride, spec.stride),
        padding=((pt, pb), (plft, prt)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=E, preferred_element_type=jnp.float32)
    d = _swish(d + weights["b_dw"][0])
    se = jnp.mean(d, axis=(1, 2))
    se = _swish(se @ weights["w_ser"] + weights["b_ser"][0])
    se = jax.nn.sigmoid(se @ weights["w_see"] + weights["b_see"][0])
    d = d * se[:, None, None, :]
    p = jnp.einsum("bhwe,eo->bhwo", d, weights["w_proj"],
                   preferred_element_type=jnp.float32)
    p = p + weights["b_proj"][0]
    if spec.has_residual:
        p = p + x.astype(jnp.float32)
    return p.astype(x.dtype)
