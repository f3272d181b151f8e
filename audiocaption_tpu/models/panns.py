"""Original PANNs AudioSet classifiers (TPU rebuild of
captioning/models/panns.py:44-320): Cnn10, Cnn14 and
Wavegram_Logmel_Cnn14 tagging models, used by the reference for feature
extraction and event probabilities.

Frontend parity: PANNs' torchlibrosa Spectrogram+LogmelFilterBank
(hann, center/reflect, slaney mel, ref 1.0, amin 1e-10, top_db None,
panns.py:59-65) is the same math as the shared LogMelFrontend with the
Cnn14 mel preset and no top_db clamp.

Output contract per model (panns.py:101-113):
  {clipwise_output (sigmoid), fc_feat [B, C], attn_feat [B, T', C]}.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import (
    BatchNorm, ConvBlock, pool_2d, torch_linear_init)
from audiocaption_tpu.ops.frontend import CNN14_MEL_32K, MelConfig

Array = jnp.ndarray


class ConvPreWavBlock(nn.Module):
    """Wavegram pre-block (panns.py:194-219): two 1-D convs (the second
    dilated 2) + BN + relu + max-pool."""
    features: int

    @nn.compact
    def __call__(self, x: Array, pool_size: int,
                 train: bool = False) -> Array:
        """x: [B, T, C] -> [B, T/pool, features]."""
        x = nn.Conv(self.features, (3,), padding=((1, 1),),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(BatchNorm(name="bn1")(x, train=train))
        x = nn.Conv(self.features, (3,), padding=((2, 2),),
                    kernel_dilation=(2,), use_bias=False, name="conv2")(x)
        x = nn.relu(BatchNorm(name="bn2")(x, train=train))
        B, T, C = x.shape
        return jnp.max(x[:, :T // pool_size * pool_size]
                       .reshape(B, T // pool_size, pool_size, C), axis=2)


class _PannsHead(nn.Module):
    """max+mean time pooling -> fc1 relu -> sigmoid classifier
    (panns.py:98-113)."""
    hidden: int
    classes_num: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Dict[str, Array]:
        """x: [B, T', M', C] feature map."""
        drop = lambda v, p: (nn.Dropout(p, deterministic=False)(v)
                             if train else v)
        x = jnp.mean(x, axis=2)                    # mean over mel bins
        attn_feat = x                              # [B, T', C]
        pooled = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
        pooled = drop(pooled, 0.5)
        emb = nn.relu(nn.Dense(self.hidden, kernel_init=torch_linear_init,
                               name="fc1")(pooled))
        logits = nn.Dense(self.classes_num, kernel_init=torch_linear_init,
                          name="fc_audioset")(drop(emb, 0.5))
        return {"clipwise_output": jax.nn.sigmoid(logits),
                "logits": logits, "fc_feat": emb, "attn_feat": attn_feat}


class Cnn10(nn.Module):
    """PANNs Cnn10 tagger (panns.py:44-113); consumes log-mel
    [B, T, 64]."""
    classes_num: int = 527

    @nn.compact
    def __call__(self, lms: Array, train: bool = False) -> Dict[str, Array]:
        drop = lambda v: (nn.Dropout(0.2, deterministic=False)(v)
                          if train else v)
        x = BatchNorm(name="bn0")(lms, train=train)[..., None]
        for i, c in enumerate((64, 128, 256, 512), 1):
            x = ConvBlock(c, name=f"conv_block{i}")(x, train=train)
            x = drop(pool_2d(x, (2, 2), "avg"))
        return _PannsHead(512, self.classes_num, name="head")(
            x, train=train)


class Wavegram_Logmel_Cnn14(nn.Module):
    """Wavegram + log-mel dual-branch Cnn14 (panns.py:222-320):
    a learned waveform front (strided 1-D convs reshaped into a
    [T', 32]-bin image) concatenated with the mel branch after
    conv_block1."""
    classes_num: int = 527

    @nn.compact
    def __call__(self, wav: Array, lms: Array,
                 train: bool = False) -> Dict[str, Array]:
        """wav: [B, T] waveform; lms: [B, Tm, 64] log-mel of the same
        audio (the shared frontend computes it once)."""
        drop = lambda v: (nn.Dropout(0.2, deterministic=False)(v)
                          if train else v)
        # wavegram branch (panns.py:264-271)
        a = nn.Conv(64, (11,), strides=(5,), padding=((5, 5),),
                    use_bias=False, name="pre_conv0")(wav[..., None])
        a = nn.relu(BatchNorm(name="pre_bn0")(a, train=train))
        a = ConvPreWavBlock(64, name="pre_block1")(a, 4, train=train)
        a = ConvPreWavBlock(128, name="pre_block2")(a, 4, train=train)
        a = ConvPreWavBlock(128, name="pre_block3")(a, 4, train=train)
        B, T, C = a.shape                          # C = 128 = 4 * 32
        # torch: [B, 128, T] -> [B, 4, 32, T] -> transpose -> [B, 4, T, 32]
        # NHWC equivalent: image [B, T, 32, 4]
        a = jnp.transpose(a.reshape(B, T, 4, 32), (0, 1, 3, 2))
        a = ConvBlock(64, name="pre_block4")(a, train=train)
        a = pool_2d(a, (2, 1), "avg")              # [B, T/2, 32, 64]

        # mel branch
        x = BatchNorm(name="bn0")(lms, train=train)[..., None]
        x = ConvBlock(64, name="conv_block1")(x, train=train)
        x = pool_2d(x, (2, 2), "avg")              # [B, Tm/2, 32, 64]
        # align time and concat channels (panns.py:287-289)
        t = min(x.shape[1], a.shape[1])
        x = jnp.concatenate([x[:, :t], a[:, :t]], axis=-1)

        for i, c in enumerate((128, 256, 512, 1024), 2):
            x = drop(x)
            x = ConvBlock(c, name=f"conv_block{i}")(x, train=train)
            x = pool_2d(x, (2, 2), "avg")
        x = drop(x)
        x = ConvBlock(2048, name="conv_block6")(x, train=train)
        x = drop(x)
        return _PannsHead(2048, self.classes_num, name="head")(
            x, train=train)


# --------------------------------------------------------------------------
# Converters
# --------------------------------------------------------------------------

def _conv_block(sd, prefix):
    p = {"conv1": convert.conv2d(sd, f"{prefix}.conv1"),
         "conv2": convert.conv2d(sd, f"{prefix}.conv2")}
    s = {}
    p["bn1"], s["bn1"] = convert.batchnorm(sd, f"{prefix}.bn1")
    p["bn2"], s["bn2"] = convert.batchnorm(sd, f"{prefix}.bn2")
    return p, s


def _conv1d(sd, prefix):
    w = sd[f"{prefix}.weight"]                     # [O, I, k]
    return {"kernel": np.transpose(w, (2, 1, 0))}  # [k, I, O]


def convert_cnn10_classifier(sd, prefix: str = "") -> Tuple[Dict, Dict]:
    k = lambda n: f"{prefix}.{n}" if prefix else n
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["bn0"], stats["bn0"] = convert.batchnorm(sd, k("bn0"))
    for i in range(1, 5):
        p, s = _conv_block(sd, k(f"conv_block{i}"))
        params[f"conv_block{i}"] = p
        stats[f"conv_block{i}"] = s
    params["head"] = {"fc1": convert.linear(sd, k("fc1")),
                      "fc_audioset": convert.linear(sd, k("fc_audioset"))}
    return params, stats


def convert_wavegram_cnn14(sd, prefix: str = "") -> Tuple[Dict, Dict]:
    k = lambda n: f"{prefix}.{n}" if prefix else n
    params: Dict[str, Any] = {"pre_conv0": _conv1d(sd, k("pre_conv0"))}
    stats: Dict[str, Any] = {}
    params["pre_bn0"], stats["pre_bn0"] = convert.batchnorm(
        sd, k("pre_bn0"))
    for i in range(1, 4):
        t = k(f"pre_block{i}")
        p = {"conv1": _conv1d(sd, f"{t}.conv1"),
             "conv2": _conv1d(sd, f"{t}.conv2")}
        s = {}
        p["bn1"], s["bn1"] = convert.batchnorm(sd, f"{t}.bn1")
        p["bn2"], s["bn2"] = convert.batchnorm(sd, f"{t}.bn2")
        params[f"pre_block{i}"] = p
        stats[f"pre_block{i}"] = s
    p, s = _conv_block(sd, k("pre_block4"))
    params["pre_block4"], stats["pre_block4"] = p, s
    params["bn0"], stats["bn0"] = convert.batchnorm(sd, k("bn0"))
    for i in range(1, 7):
        p, s = _conv_block(sd, k(f"conv_block{i}"))
        params[f"conv_block{i}"] = p
        stats[f"conv_block{i}"] = s
    params["head"] = {"fc1": convert.linear(sd, k("fc1")),
                      "fc_audioset": convert.linear(sd, k("fc_audioset"))}
    return params, stats
