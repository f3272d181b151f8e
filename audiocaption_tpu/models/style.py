"""Style-conditioned captioning (TPU re-design of
captioning/models/style_model.py:10-91 and ref_encoder.py:8-59).

A learned bank of style tokens; during training the style vector is
inferred from a reference caption via a text encoder (CLS-token sentence
embedding) attending over the bank; at inference the user supplies
``style_weight`` over the bank directly (style_model.py:62-91).  The
style vector feeds a StyleBahAttnDecoder through its fc slot.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models.captioner import Captioner
from audiocaption_tpu.models.encoders_extra import (
    TransformerEncoderLayerTorch)
from audiocaption_tpu.models.layers import LayerNorm, torch_linear_init
from audiocaption_tpu.ops.masking import length_mask

Array = jnp.ndarray


class TextRefEncoder(nn.Module):
    """Reference-caption encoder: word embedding + CLS token +
    transformer encoder; sentence embedding = CLS output
    (ref_encoder.py:8-59)."""
    vocab_size: int
    d_model: int = 256
    nlayers: int = 2
    nhead: Optional[int] = None
    dropout: float = 0.2

    @nn.compact
    def __call__(self, cap: Array, cap_len: Array,
                 train: bool = False) -> Array:
        nhead = self.nhead or max(1, self.d_model // 64)
        emb = nn.Embed(self.vocab_size, self.d_model,
                       embedding_init=nn.initializers.xavier_uniform(),
                       name="word_embedding")(cap)
        cls = self.param("cls_token", nn.initializers.xavier_uniform(),
                         (1, self.d_model))
        cls = jnp.broadcast_to(cls[None], (cap.shape[0], 1, self.d_model))
        h = jnp.concatenate([cls, emb], axis=1)
        kpm = ~length_mask(cap_len + 1, h.shape[1])
        for i in range(self.nlayers):
            h = TransformerEncoderLayerTorch(
                self.d_model, nhead, self.d_model * 4, self.dropout,
                name=f"layer{i}")(h, src_key_padding_mask=kpm, train=train)
        return h[:, 0]


class StyleBank(nn.Module):
    """Learned style tokens + attention from a query embedding
    (style_model.py:24-58)."""
    n_styles: int = 4
    style_dim: int = 256

    def setup(self):
        self.styles = self.param("styles", nn.initializers.normal(0.02),
                                 (self.n_styles, self.style_dim))
        self.query_proj = nn.Dense(self.style_dim,
                                   kernel_init=torch_linear_init,
                                   name="query_proj")

    def from_reference(self, ref_emb: Array) -> Array:
        """Soft style from a reference-caption embedding (training)."""
        q = self.query_proj(ref_emb)
        scores = q @ self.styles.T / jnp.sqrt(float(self.style_dim))
        w = jax.nn.softmax(scores, axis=-1)
        return w @ self.styles

    def from_weight(self, style_weight: Array) -> Array:
        """User-specified mixture over the bank (inference)."""
        return style_weight @ self.styles

    def __call__(self, ref_emb: Array) -> Array:
        return self.from_reference(ref_emb)


class StyleCaptioner(Captioner):
    """StyleCaptionModel (style_model.py:62-91): during training the
    style vector is inferred from the reference caption (TextRefEncoder
    CLS embedding attending over the StyleBank); at inference the user
    supplies a ``style_weight`` mixture over the bank, turned into the
    style vector by :meth:`style_of_weight` and passed to generate() as
    ``cond_kwargs={"style": vec}``.  The decoder must be a
    StyleBahAttnDecoder (its fc slot consumes the style vector,
    rnn_decoder.py:412-466)."""
    ref_encoder: Optional[nn.Module] = None
    style_bank: Optional[nn.Module] = None

    def __call__(self, wav: Array, wav_len: Array, cap: Array,
                 cap_len: Array, ss_ratio: float = 1.0,
                 train: bool = True, specaug: bool = False,
                 temporal_tag: Optional[Array] = None,
                 cond_kwargs: Optional[Dict[str, Array]] = None,
                 ss_impl: str = "cached") -> Dict[str, Array]:
        cond = dict(cond_kwargs or {})
        if "style" not in cond:
            # style inferred from the reference caption (training path,
            # style_model.py:70-80); strip <bos> like the reference's
            # ref_encoder input (cap[:, 1:])
            ref_emb = self.ref_encoder(cap[:, 1:],
                                       jnp.maximum(cap_len - 1, 1),
                                       train=train)
            cond["style"] = self.style_bank.from_reference(ref_emb)
        return super().__call__(wav, wav_len, cap, cap_len,
                                ss_ratio=ss_ratio, train=train,
                                specaug=specaug,
                                temporal_tag=temporal_tag,
                                cond_kwargs=cond, ss_impl=ss_impl)

    def style_of_weight(self, style_weight: Array) -> Array:
        """[N, n_styles] user mixture -> [N, style_dim] style vector
        (apply with method=StyleCaptioner.style_of_weight)."""
        return self.style_bank.from_weight(style_weight)
