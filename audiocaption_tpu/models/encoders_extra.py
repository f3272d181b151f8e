"""Extended encoder zoo (TPU re-designs of the remaining reference
encoders): PANNs Cnn6 / Cnn10 (cnn_encoder.py:112-327), the audio
TransformerEncoder with CLS-token pooling (transformer_encoder.py:
64-116), and the Cdur5 / Cdur8 CRNN SED-style encoders
(crnn_trm_encoder.py:12-98).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import (
    BatchNorm, Conv2dSame, ConvBlock, GRU, LayerNorm, MultiheadAttention,
    avg_pool, pool_2d, torch_linear_init)
from audiocaption_tpu.ops.masking import (
    length_mask, max_with_lens, mean_with_lens)

Array = jnp.ndarray


class ConvBlock5x5(nn.Module):
    """Single conv5x5 + BN + relu (cnn_encoder.py:79-111)."""
    features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv2dSame(self.features, (5, 5), padding=2,
                       compute_dtype=self.compute_dtype, name="conv1")(x)
        x = BatchNorm(compute_dtype=self.compute_dtype, name="bn1")(
            x, train=train)
        return nn.relu(x)


class _PannsCnnBase(nn.Module):
    """Shared forward skeleton of the PANNs waveform encoders:
    bn0 over mels -> conv blocks with avg pools + dropout 0.2 ->
    mean over mels -> masked max+mean -> fc1."""
    channels: tuple
    double_conv: bool
    downsample_ratio: int
    fc_emb_size: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        cd = self.compute_dtype
        drop = lambda x, p: (nn.Dropout(p, deterministic=False)(x)
                             if train else x)
        x = BatchNorm(compute_dtype=jnp.float32, name="bn0")(lms, train=train)
        x = x[..., None].astype(cd)
        block = ConvBlock if self.double_conv else ConvBlock5x5
        for i, c in enumerate(self.channels):
            x = block(c, compute_dtype=cd, name=f"conv_block{i + 1}")(
                x, train=train)
            x = pool_2d(x, (2, 2), "avg")
            x = drop(x, 0.2)
        x = jnp.mean(x, axis=2)
        attn_emb = x.astype(jnp.float32)
        out_len = feat_len // self.downsample_ratio
        pooled = max_with_lens(attn_emb, out_len) + \
            mean_with_lens(attn_emb, out_len)
        pooled = drop(pooled, 0.5)
        fc = nn.relu(nn.Dense(self.fc_emb_size,
                              kernel_init=torch_linear_init, dtype=cd,
                              param_dtype=jnp.float32,
                              name="fc1")(pooled.astype(cd)))
        fc_emb = drop(fc.astype(jnp.float32), 0.5)
        return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                "attn_emb_len": out_len}


class Cnn6Encoder(_PannsCnnBase):
    channels: tuple = (64, 128, 256, 512)
    double_conv: bool = False
    downsample_ratio: int = 16
    fc_emb_size: int = 512


class Cnn10Encoder(_PannsCnnBase):
    channels: tuple = (64, 128, 256, 512)
    double_conv: bool = True
    downsample_ratio: int = 16
    fc_emb_size: int = 512


class TransformerEncoderLayerTorch(nn.Module):
    """torch nn.TransformerEncoderLayer (post-norm, relu)."""
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: Array,
                 src_key_padding_mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        drop = lambda y: (nn.Dropout(self.dropout, deterministic=False)(y)
                          if train and self.dropout > 0 else y)
        sa = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                                name="self_attn")(
            x, x, x, key_padding_mask=src_key_padding_mask, train=train)
        x = LayerNorm(name="norm1")(x + drop(sa))
        h = nn.Dense(self.dim_feedforward, kernel_init=torch_linear_init,
                     name="linear1")(x)
        h = nn.Dense(self.d_model, kernel_init=torch_linear_init,
                     name="linear2")(drop(nn.relu(h)))
        return LayerNorm(name="norm2")(x + drop(h))


class AudioTransformerEncoder(nn.Module):
    """Projection + CLS token + transformer encoder over precomputed
    attention features (transformer_encoder.py:64-116).  fc_emb is the
    CLS position output; attn_emb_len grows by 1 for the CLS token."""
    d_model: int
    nlayers: int = 2
    nhead: Optional[int] = None
    dim_feedforward: Optional[int] = None
    dropout: float = 0.2

    @nn.compact
    def __call__(self, attn: Array, attn_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        nhead = self.nhead or self.d_model // 64
        ff = self.dim_feedforward or self.d_model * 4
        drop = lambda y: (nn.Dropout(self.dropout, deterministic=False)(y)
                          if train else y)
        h = nn.relu(nn.Dense(self.d_model, kernel_init=torch_linear_init,
                             name="attn_proj_dense")(attn))
        h = LayerNorm(name="attn_proj_norm")(drop(h))
        cls = self.param("cls_token", nn.initializers.xavier_uniform(),
                         (1, self.d_model))
        cls = jnp.broadcast_to(cls[None], (h.shape[0], 1, self.d_model))
        h = jnp.concatenate([cls, h], axis=1)
        out_len = attn_len + 1
        kpm = ~length_mask(out_len, h.shape[1])
        for i in range(self.nlayers):
            h = TransformerEncoderLayerTorch(
                self.d_model, nhead, ff, self.dropout, name=f"layer{i}")(
                h, src_key_padding_mask=kpm, train=train)
        return {"attn_emb": h, "fc_emb": h[:, 0], "attn_emb_len": out_len}


class Block2D(nn.Module):
    """BN -> conv3x3 -> LeakyReLU(0.1) (crnn_trm_encoder.py:12-27)."""
    features: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = BatchNorm(name="bn")(x, train=train)
        x = Conv2dSame(self.features, (3, 3), padding=1, name="conv")(x)
        return nn.leaky_relu(x, negative_slope=0.1)


def lp_pool(x: Array, window, p: float = 4.0) -> Array:
    """torch LPPool2d: (sum |x|^p over window)^(1/p), NHWC."""
    xp = jnp.abs(x) ** p
    summed = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, (1,) + tuple(window) + (1,),
        (1,) + tuple(window) + (1,), "VALID")
    return summed ** (1.0 / p)


class Cdur5Encoder(nn.Module):
    """CRNN SED encoder (crnn_trm_encoder.py:29-98): Block2D stacks with
    LPPool + BiGRU(128).  Uses a 40 ms / 20 ms mel frontend in the
    reference; time downsample 4."""
    pooling: str = "mean"
    downsample_ratio: int = 4

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        from audiocaption_tpu.models.rnn_encoder import embedding_pooling
        x = lms[..., None]                        # [B, T, M, 1]
        x = Block2D(32, name="b1")(x, train=train)
        x = lp_pool(x, (2, 4))
        x = Block2D(128, name="b2")(x, train=train)
        x = Block2D(128, name="b3")(x, train=train)
        x = lp_pool(x, (2, 4))
        x = Block2D(128, name="b4")(x, train=train)
        x = Block2D(128, name="b5")(x, train=train)
        x = lp_pool(x, (1, 4))
        if train:
            x = nn.Dropout(0.3, deterministic=False)(x)
        B, T = x.shape[0], x.shape[1]
        x = x.transpose(0, 1, 3, 2).reshape(B, T, -1)
        out_len = feat_len // self.downsample_ratio
        x, _ = GRU(hidden_size=128, bidirectional=True, name="gru")(
            x, jnp.full((B,), T, jnp.int32))
        return {"attn_emb": x,
                "fc_emb": embedding_pooling(x, out_len, self.pooling),
                "attn_emb_len": out_len}


class Cdur8Encoder(nn.Module):
    """conv_conv blocks + avg+max pools + BiGRU(256)
    (crnn_trm_encoder.py:131-176); operates on precomputed spectrogram
    features ('spec' input in the reference)."""
    pooling: str = "mean"

    @nn.compact
    def __call__(self, spec: Array, spec_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        from audiocaption_tpu.models.rnn_encoder import embedding_pooling
        drop = lambda x, p: (nn.Dropout(p, deterministic=False)(x)
                             if train else x)
        x = BatchNorm(name="init_bn")(spec, train=train)
        x = x[..., None]
        pools = [(2, 2), (2, 2), (1, 2), (1, 2)]
        for i, (c, pool) in enumerate(zip((64, 128, 256, 512), pools)):
            x = ConvBlock(c, name=f"conv_block{i + 1}")(x, train=train)
            x = pool_2d(x, pool, "avg+max")
            x = drop(x, 0.2)
        x = jnp.mean(x, axis=2)                   # adaptive avg over mels
        x = drop(x, 0.5)
        x = nn.relu(nn.Dense(512, kernel_init=torch_linear_init,
                             name="embedding")(x))
        B, T = x.shape[0], x.shape[1]
        x, _ = GRU(hidden_size=256, bidirectional=True, name="gru")(
            x, jnp.full((B,), T, jnp.int32))
        out_len = spec_len // 4
        return {"attn_emb": x,
                "fc_emb": embedding_pooling(x, out_len, self.pooling),
                "attn_emb_len": out_len}


def convert_panns_small(sd, prefix: str = "", n_blocks: int = 4):
    """torch Cnn6/Cnn10 -> (params, batch_stats)."""
    k = lambda name: f"{prefix}.{name}" if prefix else name
    bn0_p, bn0_s = convert.batchnorm(sd, k("bn0"))
    params: Dict[str, Any] = {"bn0": bn0_p}
    stats: Dict[str, Any] = {"bn0": bn0_s}
    for i in range(1, n_blocks + 1):
        key = k(f"conv_block{i}")
        if f"{key}.conv2.weight" in sd:
            p, s = convert.conv_block(sd, key)
        else:
            bn_p, bn_s = convert.batchnorm(sd, f"{key}.bn1")
            p = {"conv1": convert.conv2d(sd, f"{key}.conv1"), "bn1": bn_p}
            s = {"bn1": bn_s}
        params[f"conv_block{i}"] = p
        stats[f"conv_block{i}"] = s
    if k("fc1.weight") in sd:
        params["fc1"] = convert.linear(sd, k("fc1"))
    return params, stats


class InvertedResidual(nn.Module):
    """PANNs-flavor MobileNetV2 block (cnn_encoder.py:467-517): depthwise
    conv stride 1 followed by AvgPool(stride) (PANNs replaces strided
    convs with pooling), ReLU6 activations."""
    inp: int
    oup: int
    stride: int
    expand_ratio: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        hidden = round(self.inp * self.expand_ratio)
        relu6 = lambda v: jnp.minimum(nn.relu(v), 6.0)
        h = x
        if self.expand_ratio != 1:
            h = Conv2dSame(hidden, (1, 1), padding=0, compute_dtype=cd,
                           name="expand")(h)
            h = relu6(BatchNorm(compute_dtype=cd, name="bn_expand")(
                h, train=train))
        h = Conv2dSame(hidden, (3, 3), padding=1, groups=hidden,
                       compute_dtype=cd, name="depthwise")(h)
        if self.stride > 1:
            h = avg_pool(h, (self.stride, self.stride))
        h = relu6(BatchNorm(compute_dtype=cd, name="bn_dw")(h, train=train))
        h = Conv2dSame(self.oup, (1, 1), padding=0, compute_dtype=cd,
                       name="project")(h)
        h = BatchNorm(compute_dtype=cd, name="bn_proj")(h, train=train)
        if self.stride == 1 and self.inp == self.oup:
            h = h + x
        return h


class MobileNetV2Encoder(nn.Module):
    """PANNs MobileNetV2 waveform encoder (cnn_encoder.py:520-656):
    downsample 32, head 1280 -> masked max+mean -> fc1 1024."""
    compute_dtype: Any = jnp.float32
    downsample_ratio: int = 32
    fc_emb_size: int = 1024

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        cd = self.compute_dtype
        relu6 = lambda v: jnp.minimum(nn.relu(v), 6.0)
        drop = lambda v, p: (nn.Dropout(p, deterministic=False)(v)
                             if train else v)
        x = BatchNorm(compute_dtype=jnp.float32, name="bn0")(lms,
                                                             train=train)
        x = x[..., None].astype(cd)
        # stem: conv3x3 + AvgPool(2) + BN + ReLU6
        x = Conv2dSame(32, (3, 3), padding=1, compute_dtype=cd,
                       name="stem")(x)
        x = avg_pool(x, (2, 2))
        x = relu6(BatchNorm(compute_dtype=cd, name="bn_stem")(x,
                                                              train=train))
        settings = [  # t, c, n, s
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        inp = 32
        idx = 0
        for t, c, n, s in settings:
            for i in range(n):
                x = InvertedResidual(inp, c, s if i == 0 else 1, t,
                                     compute_dtype=cd,
                                     name=f"block{idx}")(x, train=train)
                inp = c
                idx += 1
        x = Conv2dSame(1280, (1, 1), padding=0, compute_dtype=cd,
                       name="head")(x)
        x = relu6(BatchNorm(compute_dtype=cd, name="bn_head")(x,
                                                              train=train))
        x = jnp.mean(x, axis=2)
        attn_emb = x.astype(jnp.float32)
        out_len = feat_len // self.downsample_ratio
        pooled = max_with_lens(attn_emb, out_len) + \
            mean_with_lens(attn_emb, out_len)
        pooled = drop(pooled, 0.5)
        fc = nn.relu(nn.Dense(self.fc_emb_size,
                              kernel_init=torch_linear_init, dtype=cd,
                              param_dtype=jnp.float32,
                              name="fc1")(pooled.astype(cd)))
        return {"fc_emb": drop(fc.astype(jnp.float32), 0.5),
                "attn_emb": attn_emb, "attn_emb_len": out_len}


class Cnn14TransformerEncoder(nn.Module):
    """Cnn14 -> audio TransformerEncoder composition
    (crnn_trm_encoder.py:214-246)."""
    d_model: int = 512
    nlayers: int = 2
    dropout: float = 0.2
    freeze_cnn: bool = False
    freeze_cnn_bn: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        from audiocaption_tpu.models.cnn14 import Cnn14Encoder
        cnn_train = train and not self.freeze_cnn_bn
        cnn_out = Cnn14Encoder(compute_dtype=self.compute_dtype,
                               name="cnn")(lms, feat_len, train=cnn_train)
        attn = cnn_out["attn_emb"]
        if self.freeze_cnn:
            attn = jax.lax.stop_gradient(attn)
        return AudioTransformerEncoder(
            d_model=self.d_model, nlayers=self.nlayers,
            dropout=self.dropout, name="trm")(
            attn, cnn_out["attn_emb_len"], train=train)
