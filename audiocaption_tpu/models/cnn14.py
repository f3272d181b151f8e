"""PANNs CNN14 audio encoder (TPU re-design of cnn_encoder.py:330-464).

Differences from the reference implementation (same math, TPU layout):
  * NHWC convolutions (XLA's native TPU layout) instead of NCHW;
  * the log-mel frontend is computed by the caller (one MXU matmul
    frontend shared across encoder / SED branches);
  * dropout and SpecAugment are driven by flax RNG collections.

The encoder consumes ``lms`` [B, T, 64] (float32 log-mel) and the frame
count ``feat_len`` and produces the reference output contract
{fc_emb [B, 2048], attn_emb [B, T//32, 2048], attn_emb_len [B]}.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import (
    BatchNorm, ConvBlock, pool_2d, torch_linear_init)
from audiocaption_tpu.ops.masking import max_with_lens, mean_with_lens

Array = jnp.ndarray


class Cnn14Encoder(nn.Module):
    """6 double-conv blocks 64->2048, time downsample 32."""
    compute_dtype: Any = jnp.float32
    downsample_ratio: int = 32
    fc_emb_size: int = 2048

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        cd = self.compute_dtype
        drop = lambda x, p: (nn.Dropout(p, deterministic=False)(x)
                             if train else x)
        # bn0 normalizes per mel bin (reference transposes to put mels in
        # the channel axis, cnn_encoder.py:427-429)
        x = BatchNorm(compute_dtype=jnp.float32, name="bn0")(lms, train=train)
        x = x[..., None].astype(cd)                     # [B, T, 64, 1] NHWC

        channels = (64, 128, 256, 512, 1024, 2048)
        for i, c in enumerate(channels):
            x = ConvBlock(c, compute_dtype=cd, name=f"conv_block{i + 1}")(
                x, train=train)
            pool = (1, 1) if i == len(channels) - 1 else (2, 2)
            x = pool_2d(x, pool, "avg")
            x = drop(x, 0.2)

        x = jnp.mean(x, axis=2)                         # mean over mel axis
        attn_emb = x.astype(jnp.float32)                # [B, T//32, 2048]

        out_len = feat_len // self.downsample_ratio
        pooled = max_with_lens(attn_emb, out_len) + \
            mean_with_lens(attn_emb, out_len)
        pooled = drop(pooled, 0.5)
        fc_emb = nn.relu(nn.Dense(self.fc_emb_size,
                                  kernel_init=torch_linear_init,
                                  dtype=cd, param_dtype=jnp.float32,
                                  name="fc1")(pooled.astype(cd)))
        fc_emb = drop(fc_emb.astype(jnp.float32), 0.5)
        return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                "attn_emb_len": out_len}


def convert_cnn14(sd, prefix: str = ""):
    """torch Cnn14Encoder state_dict -> (params, batch_stats).

    Handles the reference checkpoint-format variants by key prefix
    (cnn_encoder.py:376-412 strips PANNs/COLA/BLAT wrappers before this).
    """
    k = lambda name: f"{prefix}.{name}" if prefix else name
    bn0_p, bn0_s = convert.batchnorm(sd, k("bn0"))
    params: Dict[str, Any] = {"bn0": bn0_p}
    stats: Dict[str, Any] = {"bn0": bn0_s}
    for i in range(1, 7):
        blk_p, blk_s = convert.conv_block(sd, k(f"conv_block{i}"))
        params[f"conv_block{i}"] = blk_p
        stats[f"conv_block{i}"] = blk_s
    if k("fc1.weight") in sd:
        params["fc1"] = convert.linear(sd, k("fc1"))
    return params, stats


class Cnn14Classifier(nn.Module):
    """PANNs-style AudioSet tagging head on Cnn14 (reference panns.py:
    44-320, used for feature extraction / event probabilities feeding
    the event-conditioned models)."""
    classes_num: int = 527
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        enc = Cnn14Encoder(compute_dtype=self.compute_dtype,
                           name="encoder")(lms, feat_len, train=train)
        logits = nn.Dense(self.classes_num, kernel_init=torch_linear_init,
                          name="fc_audioset")(enc["fc_emb"])
        out = dict(enc)
        out["clipwise_output"] = jax.nn.sigmoid(logits)
        out["logits"] = logits
        return out
