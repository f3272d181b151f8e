"""RNN sequence encoder + CRNN composition (TPU re-design of
rnn_encoder.py:10-49 and crnn_trm_encoder.py:179-211).

The torch original relies on pack_padded_sequence; here the GRU layer
consumes explicit length masks (see models/layers.py) which is exactly
equivalent and jit-friendly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.cnn14 import Cnn14Encoder, convert_cnn14
from audiocaption_tpu.models.layers import GRU
from audiocaption_tpu.ops.masking import max_with_lens, mean_with_lens

Array = jnp.ndarray


def embedding_pooling(x: Array, lens: Array, pooling: str) -> Array:
    """Pooling options of the reference (models/__init__.py:8-23)."""
    if pooling == "max":
        return max_with_lens(x, lens)
    if pooling == "mean":
        return mean_with_lens(x, lens)
    if pooling == "mean+max":
        return mean_with_lens(x, lens) + max_with_lens(x, lens)
    if pooling == "last":
        idx = jnp.clip(lens - 1, 0, x.shape[1] - 1)
        return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    raise ValueError(f"unknown pooling: {pooling}")


class RnnEncoder(nn.Module):
    """GRU/LSTM over attn features with masked-pack semantics."""
    hidden_size: int = 512
    bidirectional: bool = False
    num_layers: int = 1
    dropout: float = 0.2
    pooling: str = "mean"

    @nn.compact
    def __call__(self, attn: Array, attn_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        out, _ = GRU(hidden_size=self.hidden_size,
                     num_layers=self.num_layers,
                     bidirectional=self.bidirectional,
                     dropout=self.dropout, name="network")(
            attn, attn_len, train=train)
        fc_emb = embedding_pooling(out, attn_len, self.pooling)
        return {"attn_emb": out, "fc_emb": fc_emb, "attn_emb_len": attn_len}


class Cnn14RnnEncoder(nn.Module):
    """Cnn14 -> RnnEncoder composition (the reference's working
    "CrnnEncoder" path, crnn_trm_encoder.py:179-211, and the HF temporal
    model's Cnn14RnnEncoder, hf_wrapper.py:1350-1374).

    ``freeze_cnn`` stops gradients into the CNN; ``freeze_cnn_bn`` keeps
    CNN BatchNorm in eval mode during training (reference
    crnn_trm_encoder.py:195-203).
    """
    rnn_hidden_size: int = 256
    rnn_bidirectional: bool = True
    rnn_num_layers: int = 3
    rnn_dropout: float = 0.5
    rnn_pooling: str = "mean"
    freeze_cnn: bool = False
    freeze_cnn_bn: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        cnn_train = train and not self.freeze_cnn_bn
        cnn_out = Cnn14Encoder(compute_dtype=self.compute_dtype,
                               name="cnn")(lms, feat_len, train=cnn_train)
        attn = cnn_out["attn_emb"]
        if self.freeze_cnn:
            attn = jax.lax.stop_gradient(attn)
        rnn_out = RnnEncoder(hidden_size=self.rnn_hidden_size,
                             bidirectional=self.rnn_bidirectional,
                             num_layers=self.rnn_num_layers,
                             dropout=self.rnn_dropout,
                             pooling=self.rnn_pooling, name="rnn")(
            attn, cnn_out["attn_emb_len"], train=train)
        return rnn_out


def convert_cnn14_rnn(sd, cnn_prefix: str = "cnn",
                      rnn_prefix: str = "rnn",
                      rnn_num_layers: int = 3,
                      rnn_bidirectional: bool = True):
    """torch Cnn14RnnEncoder -> (params, batch_stats)."""
    cnn_p, cnn_s = convert_cnn14(sd, cnn_prefix)
    rnn_p = convert.gru(sd, f"{rnn_prefix}.network", rnn_num_layers,
                        rnn_bidirectional)
    params = {"cnn": cnn_p, "rnn": {"network": rnn_p}}
    stats = {"cnn": cnn_s}
    return params, stats
