"""Fused-inference EfficientNet-B2 encoder: every MBConv block runs as
one Pallas kernel (ops/pallas_mbconv.py) with BatchNorm folded into the
conv weights; stem/head run as folded XLA convs.  Numerically equivalent
to EfficientNetB2.apply in eval mode.

    fe = FusedEffB2Encoder(model, variables)   # model: zoo.effb2_trm(...)
    enc = fe(wav, wav_len)   # same {fc_emb, attn_emb, attn_emb_len}
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.models.effb2 import (
    _b2_block_plan, round_filters, tf_same_padding)
from audiocaption_tpu.ops.frontend import LogMelFrontend
from audiocaption_tpu.ops.masking import mean_with_lens
from audiocaption_tpu.ops.pallas_mbconv import (
    MBConvSpec, fold_bn, fused_mbconv_s1, pack_mbconv, xla_mbconv)


def build_specs() -> List[MBConvSpec]:
    specs = []
    plan = _b2_block_plan()
    for args in plan:
        specs.append(MBConvSpec(
            in_ch=args["in_filters"],
            out_ch=args["out_filters"],
            exp_ch=args["in_filters"] * args["expand_ratio"],
            kernel=args["kernel"],
            stride=args["stride"],
            pad=tf_same_padding(args["nominal_size"], args["kernel"],
                                args["stride"]),
            has_expand=args["expand_ratio"] != 1,
            has_residual=(args["stride"] == 1 and
                          args["in_filters"] == args["out_filters"]),
        ))
    return specs


class FusedEffB2Encoder:

    def __init__(self, model, variables: Dict, block_batch: int = 1,
                 compute_dtype=jnp.float32):
        self.model = model
        self.mel = model.mel
        self.frontend = LogMelFrontend(self.mel)
        self.block_batch = block_batch
        self.compute_dtype = compute_dtype
        enc_p = jax.device_get(variables["params"]["encoder"])
        enc_s = jax.device_get(variables["batch_stats"]["encoder"])
        self.specs = build_specs()

        # folded stem / head / fc weights
        ws, bs = fold_bn(enc_p["conv_stem"]["kernel"], None,
                         enc_p["bn0"], enc_s["bn0"])
        wh, bh = fold_bn(enc_p["conv_head"]["kernel"], None,
                         enc_p["bn1"], enc_s["bn1"])
        self._stem = (jnp.asarray(ws), jnp.asarray(bs))
        self._head = (jnp.asarray(wh[0, 0]), jnp.asarray(bh))
        self._blocks = []
        for i, spec in enumerate(self.specs):
            packed = pack_mbconv(enc_p[f"block{i}"], enc_s[f"block{i}"],
                                 spec)
            self._blocks.append({k: jnp.asarray(v)
                                 for k, v in packed.items()})

        specs = self.specs
        blocks = self._blocks
        stem = self._stem
        head = self._head
        bb = self.block_batch
        cd = self.compute_dtype
        mel = self.mel
        fe = self.frontend

        @jax.jit
        def run(wav, wav_len):
            lms = fe(wav)
            feat_len = mel.feat_len(wav_len)
            x = jnp.transpose(lms, (0, 2, 1))[..., None].astype(cd)
            pt, pb, plft, prt = tf_same_padding(260, 3, 2)
            x = jax.lax.conv_general_dilated(
                x, stem[0].astype(cd), window_strides=(2, 2),
                padding=((pt, pb), (plft, prt)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            x = x + stem[1]
            x = (x * jax.nn.sigmoid(x)).astype(cd)       # swish
            for spec, w in zip(specs, blocks):
                if spec.stride == 1:
                    x = fused_mbconv_s1(x, w, spec, block_batch=bb)
                else:
                    x = xla_mbconv(x, w, spec)
            h = x.reshape(-1, x.shape[-1]) @ head[0].astype(x.dtype)
            h = (h + head[1]).astype(jnp.float32)
            h = h * jax.nn.sigmoid(h)
            h = h.reshape(x.shape[0], x.shape[1], x.shape[2], -1)
            attn_emb = jnp.mean(h, axis=1)               # mean over freq
            out_len = feat_len // 32
            fc_emb = mean_with_lens(attn_emb, jnp.maximum(out_len, 1))
            return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                    "attn_emb_len": out_len}

        self._run = run

    def __call__(self, wav, wav_len) -> Dict[str, jnp.ndarray]:
        return self._run(wav, wav_len)
