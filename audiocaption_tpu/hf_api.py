"""Public inference API, mirroring the reference's HF
``trust_remote_code`` models (hf_wrapper.py:1115-1181, 1862-1973):

    model = Effb2TrmCaptioningModel(Effb2TrmConfig(vocab_size=4981))
    model.load_torch_checkpoint("pytorch_model.bin")   # HF zoo weights
    ids = model(audio=wav_batch, audio_length=[n1, n2],
                sample_method="beam", beam_size=3)     # [N, 20] token ids

Implementation notes (TPU):
  * one jit-compiled program per (bucketed) input shape; audio lengths
    are rounded up to 1 s buckets so arbitrary clips hit a small, warm
    set of compiled programs;
  * the temporal model computes the 32 kHz log-mel once and shares it
    between the SED branch and the captioner (hf_wrapper.py:1951-1952);
    the double-threshold tag extraction runs host-side in numpy exactly
    like the reference (hf_wrapper.py:1810-1818).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.captioner import Captioner, generate
from audiocaption_tpu.models.effb2 import convert_effb2
from audiocaption_tpu.models.rnn_decoder import TemporalBahAttnDecoder
from audiocaption_tpu.models.rnn_encoder import convert_cnn14_rnn
from audiocaption_tpu.models.sed import (
    Cnn8RnnSedModel, convert_cnn8rnn, framewise_to_temporal_tags)
from audiocaption_tpu.models.transformer_decoder import (
    convert_transformer_decoder)
from audiocaption_tpu.models.zoo import cnn14rnn_tempgru, effb2_trm
from audiocaption_tpu.ops.frontend import CNN14_MEL_32K, LogMelFrontend


def _pad_bucket(audio: np.ndarray, sample_rate: int,
                bucket_s: float = 1.0) -> np.ndarray:
    """Pad the time axis up to the next bucket multiple (static shapes
    for jit; padding is masked by audio_length downstream)."""
    n = audio.shape[1]
    bucket = int(sample_rate * bucket_s)
    target = max(bucket, (n + bucket - 1) // bucket * bucket)
    if target == n:
        return audio
    return np.pad(audio, ((0, 0), (0, target - n)))


def _as_2d_float(audio) -> np.ndarray:
    a = np.asarray(audio, np.float32)
    if a.ndim == 1:
        a = a[None, :]
    return a


@dataclasses.dataclass
class Effb2TrmConfig:
    """hf_wrapper.py:255-282 defaults."""
    sample_rate: int = 16000
    fc_emb_dim: int = 1408
    attn_emb_dim: int = 1408
    decoder_n_layers: int = 2
    decoder_we_tie_weights: bool = True
    decoder_emb_dim: int = 256
    decoder_dropout: float = 0.2
    vocab_size: int = 4981


class Effb2TrmCaptioningModel:
    """EffB2 + 2-layer transformer captioner with the reference's
    forward(audio, audio_length, sample_method, beam_size, max_length,
    temp) -> token ids API (hf_wrapper.py:1162-1181)."""

    def __init__(self, config: Effb2TrmConfig = Effb2TrmConfig(),
                 variables: Optional[Dict] = None, seed: int = 0,
                 compute_dtype: Any = jnp.float32):
        self.config = config
        self.model = effb2_trm(
            vocab_size=config.vocab_size,
            decoder_emb_dim=config.decoder_emb_dim,
            decoder_n_layers=config.decoder_n_layers,
            decoder_dropout=config.decoder_dropout,
            tie_weights=config.decoder_we_tie_weights,
            compute_dtype=compute_dtype)
        if variables is None:
            with jax.default_device(jax.devices("cpu")[0]):
                wav = jnp.zeros((1, config.sample_rate))
                wav_len = jnp.asarray([config.sample_rate])
                cap = jnp.ones((1, 4), jnp.int32)
                variables = self.model.init(
                    {"params": jax.random.PRNGKey(seed),
                     "sample": jax.random.PRNGKey(seed + 1)},
                    wav, wav_len, cap, jnp.asarray([4]), train=False)
            if jax.devices()[0].platform != "cpu":
                variables = jax.device_put(variables, jax.devices()[0])
        self.variables = variables
        self._decode = {}

    def load_torch_checkpoint(self, path: str):
        """Load the HF zoo checkpoint (wsntxxn/effb2-trm-*-captioning)."""
        import torch
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = convert.state_dict_to_numpy(
            ckpt if not isinstance(ckpt, dict) or "state_dict" not in ckpt
            else ckpt["state_dict"])
        self.load_torch_state_dict(sd)

    def load_torch_state_dict(self, sd: Dict[str, np.ndarray]):
        base = "model.model"
        enc_p, enc_s = convert_effb2(sd, f"{base}.encoder.backbone.eff_net")
        dec_p = convert_transformer_decoder(
            sd, f"{base}.decoder", nlayers=self.config.decoder_n_layers,
            tie_weights=self.config.decoder_we_tie_weights)
        self.variables = {
            "params": {"encoder": enc_p, "decoder": dec_p},
            "batch_stats": {"encoder": enc_s},
        }
        self._decode = {}   # drop decoders bound to the old weights

    def _decode_fn(self, kwargs_key):
        if kwargs_key not in self._decode:
            sample_method, beam_size, max_length, temp = kwargs_key
            on_tpu = jax.devices()[0].platform != "cpu"
            if sample_method == "greedy" and on_tpu:
                # serve greedy through the fused whole-loop kernel
                from audiocaption_tpu.decoding.fused_greedy import (
                    FusedGreedyDecoder)
                fd = FusedGreedyDecoder(self.model, self.variables,
                                        max_length=max_length)
                self._decode[kwargs_key] = lambda v, w, wl: fd(w, wl)
            elif sample_method == "beam" and temp == 1.0 and on_tpu:
                # the reference's default decode (beam 3, base.py:88-98)
                # also gets the whole-loop kernel
                from audiocaption_tpu.decoding.fused_beam import (
                    FusedBeamDecoder)
                fb = FusedBeamDecoder(self.model, self.variables,
                                      max_length=max_length,
                                      beam_size=beam_size)
                self._decode[kwargs_key] = lambda v, w, wl: fb(w, wl)
            else:
                @jax.jit
                def fn(variables, wav, wav_len):
                    return generate(self.model, variables, wav, wav_len,
                                    sample_method=sample_method,
                                    beam_size=beam_size,
                                    max_length=max_length,
                                    temp=temp)["seq"]
                self._decode[kwargs_key] = fn
        return self._decode[kwargs_key]

    def __call__(self, audio, audio_length,
                 sample_method: str = "beam", beam_size: int = 3,
                 max_length: int = 20, temp: float = 1.0) -> np.ndarray:
        audio = _pad_bucket(_as_2d_float(audio), self.config.sample_rate)
        fn = self._decode_fn((sample_method, beam_size, max_length, temp))
        seq = fn(self.variables, jnp.asarray(audio),
                 jnp.asarray(np.asarray(audio_length, np.int32)))
        return np.asarray(seq)


@dataclasses.dataclass
class Cnn14RnnTempAttnGruConfig:
    """hf_wrapper.py:1862-1895 defaults."""
    sample_rate: int = 32000
    encoder_rnn_hidden_size: int = 256
    encoder_rnn_num_layers: int = 3
    encoder_rnn_dropout: float = 0.5
    decoder_emb_dim: int = 512
    decoder_d_model: int = 512
    decoder_dropout: float = 0.5
    vocab_size: int = 4981


class Cnn14RnnTempAttnGruModel:
    """Temporal-tag controllable captioner: shared 32 kHz log-mel ->
    SED tag branch + Cnn14-BiGRU captioner with a temporal GRU decoder
    (hf_wrapper.py:1898-1973).  Tag semantics (README.md:114-124):
    0 = single event, 1 = simultaneous, 2 = sequential, 3 = complex;
    a user tag is merged with the SED tag by min()."""

    def __init__(self, config: Cnn14RnnTempAttnGruConfig = Cnn14RnnTempAttnGruConfig(),
                 variables: Optional[Dict] = None,
                 sed_variables: Optional[Dict] = None, seed: int = 0,
                 compute_dtype: Any = jnp.float32):
        self.config = config
        self.mel = CNN14_MEL_32K
        self.frontend = LogMelFrontend(self.mel)
        self.model = cnn14rnn_tempgru(
            vocab_size=config.vocab_size,
            sample_rate=config.sample_rate,
            encoder_rnn_hidden_size=config.encoder_rnn_hidden_size,
            encoder_rnn_num_layers=config.encoder_rnn_num_layers,
            encoder_rnn_dropout=config.encoder_rnn_dropout,
            decoder_emb_dim=config.decoder_emb_dim,
            decoder_d_model=config.decoder_d_model,
            decoder_dropout=config.decoder_dropout,
            compute_dtype=compute_dtype)
        self.sed = Cnn8RnnSedModel(compute_dtype=compute_dtype)
        with jax.default_device(jax.devices("cpu")[0]):
            if variables is None:
                sr = config.sample_rate
                wav = jnp.zeros((1, sr))
                cap = jnp.ones((1, 4), jnp.int32)
                variables = self.model.init(
                    {"params": jax.random.PRNGKey(seed),
                     "sample": jax.random.PRNGKey(seed + 1)},
                    wav, jnp.asarray([sr]), cap, jnp.asarray([4]),
                    train=False, temporal_tag=jnp.zeros((1,), jnp.int32))
            if sed_variables is None:
                lms = jnp.zeros((1, 101, 64))
                sed_variables = self.sed.init(
                    jax.random.PRNGKey(seed + 2), lms)
        if jax.devices()[0].platform != "cpu":
            variables = jax.device_put(variables, jax.devices()[0])
            sed_variables = jax.device_put(sed_variables, jax.devices()[0])
        self.variables = variables
        self.sed_variables = sed_variables
        self._fns = {}

    def load_torch_state_dict(self, sd: Dict[str, np.ndarray]):
        enc_p, enc_s = convert_cnn14_rnn(
            sd, "cap_model.encoder.cnn", "cap_model.encoder.rnn",
            rnn_num_layers=self.config.encoder_rnn_num_layers,
            rnn_bidirectional=True)
        from audiocaption_tpu.models.rnn_decoder import (
            convert_bahattn_decoder)
        dec_p = convert_bahattn_decoder(sd, "cap_model.decoder",
                                        temporal=True)
        sed_p, sed_s = convert_cnn8rnn(sd, "sed_model")
        self.variables = {
            "params": {"encoder": enc_p, "decoder": dec_p},
            "batch_stats": {"encoder": enc_s},
        }
        self.sed_variables = {"params": sed_p, "batch_stats": sed_s}

    def load_torch_checkpoint(self, path: str):
        import torch
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        self.load_torch_state_dict(convert.state_dict_to_numpy(ckpt))

    def _sed_fn(self):
        if "sed" not in self._fns:
            @jax.jit
            def fn(sed_vars, lms):
                return self.sed.apply(sed_vars, lms)["framewise_output"]
            self._fns["sed"] = fn
        return self._fns["sed"]

    def _lms_fn(self):
        if "lms" not in self._fns:
            self._fns["lms"] = jax.jit(lambda wav: self.frontend(wav))
        return self._fns["lms"]

    def _decode_fn(self, key):
        if key not in self._fns:
            sample_method, beam_size, max_length, temp = key

            @jax.jit
            def fn(variables, lms, feat_len, tag):
                return generate(self.model, variables, lms=lms,
                                feat_len=feat_len,
                                sample_method=sample_method,
                                beam_size=beam_size, max_length=max_length,
                                temp=temp, temporal_tag=tag)["seq"]
            self._fns[key] = fn
        return self._fns[key]

    def __call__(self, audio, audio_length, temporal_tag=None,
                 sample_method: str = "beam", beam_size: int = 3,
                 max_length: int = 20, temp: float = 1.0) -> np.ndarray:
        audio = _pad_bucket(_as_2d_float(audio), self.config.sample_rate)
        wav = jnp.asarray(audio)
        lms = self._lms_fn()(wav)
        framewise = np.asarray(self._sed_fn()(self.sed_variables, lms))
        sed_tag = framewise_to_temporal_tags(framewise)
        if temporal_tag is not None:
            sed_tag = np.minimum(np.asarray(temporal_tag, np.int32), sed_tag)
        feat_len = self.mel.feat_len(
            jnp.asarray(np.asarray(audio_length, np.int32)))
        seq = self._decode_fn((sample_method, beam_size, max_length, temp))(
            self.variables, lms, feat_len, jnp.asarray(sed_tag))
        return np.asarray(seq)
