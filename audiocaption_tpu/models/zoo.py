"""Model zoo constructors matching the reference's shipped configurations.

  * effb2_trm:      HF Effb2TrmCaptioningModel dims (hf_wrapper.py:
                    1115-1160): EffB2 encoder (16 kHz mel), 2-layer
                    transformer decoder, emb 256, tied weights.
  * cnn14rnn_trm:   eg_configs/*/waveform/cnn14rnn_trm.yaml: Cnn14 ->
                    3-layer BiGRU(256) encoder, 2-layer transformer
                    decoder (attn dim 512).
  * cnn14rnn_tempgru: HF Cnn14RnnTempAttnGruModel dims (hf_wrapper.py:
                    1862-1935): Cnn14+BiGRU encoder, temporal
                    BahAttn GRU decoder d_model 512.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from audiocaption_tpu.decoding.engine import SpecialTokens
from audiocaption_tpu.models.captioner import Captioner
from audiocaption_tpu.models.cnn14 import Cnn14Encoder
from audiocaption_tpu.models.effb2 import EfficientNetB2
from audiocaption_tpu.models.rnn_encoder import Cnn14RnnEncoder
from audiocaption_tpu.models.rnn_decoder import (
    BahAttnCatFcDecoder, TemporalBahAttnDecoder)
from audiocaption_tpu.models.transformer_decoder import TransformerDecoder
from audiocaption_tpu.ops.frontend import (
    CNN14_MEL_16K, CNN14_MEL_32K, EFFB2_MEL_16K, MelConfig)


def effb2_trm(vocab_size: int = 4981,
              decoder_emb_dim: int = 256,
              decoder_n_layers: int = 2,
              decoder_dropout: float = 0.2,
              tie_weights: bool = True,
              compute_dtype: Any = jnp.float32,
              max_length: int = 20) -> Captioner:
    encoder = EfficientNetB2(compute_dtype=compute_dtype)
    decoder = TransformerDecoder(
        emb_dim=decoder_emb_dim, vocab_size=vocab_size,
        attn_emb_dim=1408, fc_emb_dim=1408, dropout=decoder_dropout,
        nlayers=decoder_n_layers, tie_weights=tie_weights,
        compute_dtype=compute_dtype)
    return Captioner(encoder=encoder, decoder=decoder, mel=EFFB2_MEL_16K,
                     special=SpecialTokens(max_length=max_length))


def cnn14rnn_trm(vocab_size: int = 4368,
                 sample_rate: int = 32000,
                 rnn_hidden_size: int = 256,
                 rnn_num_layers: int = 3,
                 rnn_dropout: float = 0.5,
                 decoder_emb_dim: int = 256,
                 decoder_n_layers: int = 2,
                 decoder_dropout: float = 0.2,
                 freeze_cnn: bool = False,
                 freeze_cnn_bn: bool = False,
                 compute_dtype: Any = jnp.float32,
                 max_length: int = 20) -> Captioner:
    encoder = Cnn14RnnEncoder(
        rnn_hidden_size=rnn_hidden_size, rnn_bidirectional=True,
        rnn_num_layers=rnn_num_layers, rnn_dropout=rnn_dropout,
        freeze_cnn=freeze_cnn, freeze_cnn_bn=freeze_cnn_bn,
        compute_dtype=compute_dtype)
    decoder = TransformerDecoder(
        emb_dim=decoder_emb_dim, vocab_size=vocab_size,
        attn_emb_dim=2 * rnn_hidden_size, fc_emb_dim=2 * rnn_hidden_size,
        dropout=decoder_dropout, nlayers=decoder_n_layers,
        compute_dtype=compute_dtype)
    mel = CNN14_MEL_32K if sample_rate == 32000 else CNN14_MEL_16K
    return Captioner(encoder=encoder, decoder=decoder, mel=mel,
                     special=SpecialTokens(max_length=max_length))


def cnn14rnn_tempgru(vocab_size: int = 4981,
                     sample_rate: int = 32000,
                     encoder_rnn_hidden_size: int = 256,
                     encoder_rnn_num_layers: int = 3,
                     encoder_rnn_dropout: float = 0.5,
                     decoder_emb_dim: int = 512,
                     decoder_d_model: int = 512,
                     decoder_dropout: float = 0.5,
                     compute_dtype: Any = jnp.float32,
                     max_length: int = 20) -> Captioner:
    encoder = Cnn14RnnEncoder(
        rnn_hidden_size=encoder_rnn_hidden_size, rnn_bidirectional=True,
        rnn_num_layers=encoder_rnn_num_layers,
        rnn_dropout=encoder_rnn_dropout, compute_dtype=compute_dtype)
    decoder = TemporalBahAttnDecoder(
        emb_dim=decoder_emb_dim, vocab_size=vocab_size,
        fc_emb_dim=2 * encoder_rnn_hidden_size,
        attn_emb_dim=2 * encoder_rnn_hidden_size,
        d_model=decoder_d_model, dropout=decoder_dropout)
    mel = CNN14_MEL_32K if sample_rate == 32000 else CNN14_MEL_16K
    return Captioner(encoder=encoder, decoder=decoder, mel=mel,
                     special=SpecialTokens(max_length=max_length))


def kd_student_cdur5(vocab_size: int = 4981,
                     sample_rate: int = 32000,
                     decoder_emb_dim: int = 128,
                     decoder_n_layers: int = 1,
                     decoder_dropout: float = 0.2,
                     compute_dtype: Any = jnp.float32,
                     max_length: int = 20) -> Captioner:
    """The 1.0M-param KD student recipe (configs/synthetic/kd_token.yaml):
    Cdur5 CRNN encoder (crnn_trm_encoder.py:29-98 dims) + 1-layer
    transformer decoder, emb 128.  Distilled from cnn14rnn_trm it
    matches the 88M-param teacher's caption quality
    (results/synthetic/kd_token_cdur5/) at a fraction of the encode
    cost — the efficiency-frontier serving recipe."""
    from audiocaption_tpu.models.encoders_extra import Cdur5Encoder
    encoder = Cdur5Encoder()
    decoder = TransformerDecoder(
        emb_dim=decoder_emb_dim, vocab_size=vocab_size,
        attn_emb_dim=256, fc_emb_dim=256, dropout=decoder_dropout,
        nlayers=decoder_n_layers, compute_dtype=compute_dtype)
    mel = CNN14_MEL_32K if sample_rate == 32000 else CNN14_MEL_16K
    return Captioner(encoder=encoder, decoder=decoder, mel=mel,
                     special=SpecialTokens(max_length=max_length))
