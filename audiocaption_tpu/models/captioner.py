"""Caption model: encoder + decoder + decoding dispatch.

TPU re-design of CaptionModel (captioning/models/base.py:24-507) and its
TransformerModel / Seq2SeqAttnModel subclasses.  The class splits into:

  * ``Captioner`` (flax module): the *training* forward passes — full
    teacher forcing for the transformer decoder (transformer_model.py:
    20-32) and step-wise decoding with scheduled sampling (base.py:
    131-170, attn_model.py:22-60).  The step loop is unrolled in Python
    (caption length <= 21 tokens), which keeps flax param/RNG handling
    trivial and lets XLA fuse across steps.
  * ``generate`` (pure function): inference decoding.  It binds the
    decoder submodule's pure ``apply`` into a step function and hands it
    to the batched decoding engine (greedy / sample / beam / dbs), so
    the entire batch decodes inside one ``lax.while_loop`` program — the
    reference loops over samples in Python (base.py:254-325).

Input/output contracts follow the reference: train returns
{logit [B, L-1, V], seq, sampled_logprob, embed, fc_emb, attn_emb,
attn_emb_len}; inference returns {seq, ...}.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.decoding.engine import (
    SpecialTokens, beam_search, diverse_beam_search, expand_to_beams,
    sample_next_word, stepwise_decode)
from audiocaption_tpu.models.rnn_decoder import BahAttnCatFcDecoder
from audiocaption_tpu.models.transformer_decoder import TransformerDecoder
from audiocaption_tpu.ops.frontend import LogMelFrontend, MelConfig
from audiocaption_tpu.ops.specaug import spec_augment

Array = jnp.ndarray


class Captioner(nn.Module):
    """Waveform -> caption model.

    ``input_mode`` selects what the first positional input is:
      * "mel"      — waveform; the shared log-mel frontend runs first
                     (the reference's waveform models, cnn_encoder.py);
      * "features" — precomputed attn features [B, T, D] (the
                     reference's attn/attn_len input contract,
                     base.py:48-61; RnnEncoder / TransformerEncoder);
      * "raw_wav"  — waveform fed straight to an encoder with its own
                     frontend (ESResNeXtFBSP's learned filterbank).
    """
    encoder: nn.Module
    decoder: nn.Module
    mel: MelConfig
    special: SpecialTokens = SpecialTokens()
    input_mode: str = "mel"

    @property
    def is_transformer(self) -> bool:
        return isinstance(self.decoder, TransformerDecoder)

    # ------------------------------------------------------------ encode --

    def frontend(self, wav: Array, wav_len: Array, train: bool = False,
                 specaug: bool = False):
        """Waveform -> (log-mel [B, T, M], frame count [B])."""
        lms = LogMelFrontend(self.mel)(wav)
        if train and specaug:
            lms = spec_augment(self.make_rng("specaug"), lms)
        return lms, self.mel.feat_len(wav_len)

    def encode(self, wav: Array, wav_len: Array, train: bool = False,
               specaug: bool = False) -> Dict[str, Array]:
        if self.input_mode != "mel":
            return self.encoder(wav, wav_len, train=train)
        lms, feat_len = self.frontend(wav, wav_len, train, specaug)
        return self.encoder(lms, feat_len, train=train)

    def encode_lms(self, lms: Array, feat_len: Array,
                   train: bool = False) -> Dict[str, Array]:
        """Encode a precomputed log-mel (shared-frontend paths, e.g. the
        temporal model computes the mel once for SED + captioning,
        hf_wrapper.py:1951-1952)."""
        return self.encoder(lms, feat_len, train=train)

    # ------------------------------------------------------------- train --

    def __call__(self, wav: Array, wav_len: Array, cap: Array,
                 cap_len: Array, ss_ratio: float = 1.0, train: bool = True,
                 specaug: bool = False,
                 temporal_tag: Optional[Array] = None,
                 cond_kwargs: Optional[Dict[str, Array]] = None,
                 ss_impl: str = "cached"
                 ) -> Dict[str, Array]:
        """Training forward.  ``ss_ratio`` must be a static python float
        when 1.0 is meant to select the parallel teacher-forcing path
        (train_forward switch, base.py:131-136).  ``cond_kwargs`` carries
        per-sample conditioning into the decoder (condition / style /
        structure / specificity for the BahAttn variants, event / keyword
        for the conditioned transformer decoders)."""
        enc = self.encode(wav, wav_len, train=train, specaug=specaug)
        cond = dict(cond_kwargs or {})
        if temporal_tag is not None:
            cond["temporal_tag"] = temporal_tag
        full_teacher = isinstance(ss_ratio, float) and ss_ratio == 1.0
        if self.is_transformer and full_teacher:
            out = self._seq_forward(enc, cap, train, cond)
        elif self.is_transformer and ss_impl == "recompute":
            out = self._ss_forward_transformer_recompute(
                enc, cap, ss_ratio, train)
        elif self.is_transformer:
            out = self._ss_forward_transformer(enc, cap, ss_ratio, train)
        else:
            out = self._ss_forward_rnn(enc, cap, ss_ratio, train, cond)
        out.update(enc)
        return out

    def _seq_forward(self, enc: Dict[str, Array], cap: Array,
                     train: bool,
                     cond: Optional[Dict[str, Array]] = None
                     ) -> Dict[str, Array]:
        """Full teacher forcing (transformer_model.py:20-32)."""
        word = cap[:, :-1]
        cap_padding_mask = word == self.special.pad
        return self.decoder(word, enc["attn_emb"], enc["attn_emb_len"],
                            cap_padding_mask=cap_padding_mask, train=train,
                            **(cond or {}))

    def _ss_coin(self, ss_ratio) -> Array:
        """Whole-batch per-step teacher/model coin, mirroring the
        reference's random.random() < ss_ratio (transformer_model.py:44)."""
        u = jax.random.uniform(self.make_rng("sample"), ())
        return u < ss_ratio

    def _ss_forward_transformer(self, enc: Dict[str, Array], cap: Array,
                                ss_ratio, train: bool) -> Dict[str, Array]:
        """Scheduled-sampling forward with KV-cache reuse.

        Per step the reference feeds either the whole teacher prefix
        cap[:, :t+1] or <bos>+model words (transformer_model.py:34-57)
        and re-runs the decoder on it — O(L) redundant decoder work per
        step.  The identity split that removes it:

          * coin=teacher at step t: the prefix is exactly cap[:, :t+1],
            so the step-t logit EQUALS the full-teacher-forcing logit at
            position t — ONE parallel causal pass serves every
            teacher-coin step (MXU-friendly, same program as
            _seq_forward);
          * coin=model: the prefix is <bos> + previously sampled words,
            which only ever APPENDS across steps — a KV cache over the
            model prefix stays valid and each step is O(1) decoder work.

        Eval-mode logits are identical to the per-step recompute (see
        _ss_forward_transformer_recompute, kept as the parity oracle).
        Under dropout the two paths draw different noise by construction
        (cached K/V keep the noise of the step that wrote them; the
        reference redraws over the whole prefix every step) — both are
        unbiased dropout, only the correlation structure differs."""
        B, Lc = cap.shape
        max_length = Lc - 1
        word = cap[:, :-1].astype(jnp.int32)
        t_out = self.decoder(word, enc["attn_emb"], enc["attn_emb_len"],
                             cap_padding_mask=word == self.special.pad,
                             train=train)
        static, dyn = self.decoder.init_cache(
            enc["attn_emb"], enc["attn_emb_len"], max_length)
        prev_word = jnp.full((B,), self.special.bos, jnp.int32)
        logits, embeds, seqs, lps = [], [], [], []
        for t in range(max_length):
            coin = self._ss_coin(ss_ratio)
            m_hidden, dyn = self.decoder._step_hidden(
                prev_word, jnp.int32(t), static, dyn,
                is_pad_t=prev_word == self.special.pad, train=train)
            m_logit = self.decoder._logits(m_hidden).astype(jnp.float32)
            logit_t = jnp.where(coin, t_out["logit"][:, t], m_logit)
            embed_t = jnp.where(coin, t_out["embed"][:, t], m_hidden)
            w_t, lp_t = sample_next_word(logit_t, "greedy", 1.0, None)
            prev_word = w_t
            logits.append(logit_t)
            embeds.append(embed_t)
            seqs.append(w_t)
            lps.append(lp_t)
        return {"logit": jnp.stack(logits, 1), "embed": jnp.stack(embeds, 1),
                "seq": jnp.stack(seqs, 1),
                "sampled_logprob": jnp.stack(lps, 1)}

    def _ss_forward_transformer_recompute(self, enc: Dict[str, Array],
                                          cap: Array, ss_ratio,
                                          train: bool) -> Dict[str, Array]:
        """Reference-shaped oracle: re-run the decoder on the whole
        selected prefix each step (transformer_model.py:34-57).  Kept
        only for the logit-parity test against the cached fast path."""
        B, Lc = cap.shape
        max_length = Lc - 1
        model_prefix = jnp.full((B, Lc), self.special.bos, jnp.int32)
        logits, embeds, seqs, lps = [], [], [], []
        for t in range(max_length):
            coin = self._ss_coin(ss_ratio)
            word = jnp.where(coin, cap[:, :t + 1].astype(jnp.int32),
                             model_prefix[:, :t + 1])
            out = self.decoder(word, enc["attn_emb"], enc["attn_emb_len"],
                               cap_padding_mask=word == self.special.pad,
                               train=train)
            logit_t = out["logit"][:, -1]
            embed_t = out["embed"][:, -1]
            w_t, lp_t = sample_next_word(logit_t, "greedy", 1.0, None)
            model_prefix = model_prefix.at[:, t + 1].set(w_t)
            logits.append(logit_t)
            embeds.append(embed_t)
            seqs.append(w_t)
            lps.append(lp_t)
        return {"logit": jnp.stack(logits, 1), "embed": jnp.stack(embeds, 1),
                "seq": jnp.stack(seqs, 1),
                "sampled_logprob": jnp.stack(lps, 1)}

    def _ss_forward_rnn(self, enc: Dict[str, Array], cap: Array,
                        ss_ratio, train: bool,
                        cond: Optional[Dict[str, Array]] = None
                        ) -> Dict[str, Array]:
        """RNN decoders always run step-wise, in train too
        (attn_model.py:22-60): input word at t is the teacher word
        cap[:, t] with prob ss_ratio, else the previous sampled word."""
        B, Lc = cap.shape
        max_length = Lc - 1
        static, dyn = self.decoder.init_cache(
            enc["attn_emb"], enc["attn_emb_len"], enc["fc_emb"], max_length,
            **(cond or {}))
        prev_word = jnp.full((B,), self.special.bos, jnp.int32)
        logits, embeds, seqs, lps = [], [], [], []
        for t in range(max_length):
            coin = self._ss_coin(ss_ratio)
            word = jnp.where(coin, cap[:, t].astype(jnp.int32), prev_word)
            logit_t, dyn = self.decoder.step(word, jnp.int32(t), static, dyn,
                                             train=train)
            w_t, lp_t = sample_next_word(logit_t, "greedy", 1.0, None)
            prev_word = w_t
            logits.append(logit_t)
            embeds.append(dyn["state"][:, -1])
            seqs.append(w_t)
            lps.append(lp_t)
        return {"logit": jnp.stack(logits, 1), "embed": jnp.stack(embeds, 1),
                "seq": jnp.stack(seqs, 1),
                "sampled_logprob": jnp.stack(lps, 1)}


# --------------------------------------------------------------------------
# Inference (pure function over variables)
# --------------------------------------------------------------------------

def generate(model: Captioner,
             variables: Dict[str, Any],
             wav: Optional[Array] = None,
             wav_len: Optional[Array] = None,
             lms: Optional[Array] = None,
             feat_len: Optional[Array] = None,
             sample_method: str = "greedy",
             max_length: Optional[int] = None,
             temp: float = 1.0,
             beam_size: Optional[int] = None,
             n_best: bool = False,
             n_best_size: Optional[int] = None,
             group_size: int = 3,
             diversity_lambda: float = 0.5,
             group_nbest: bool = True,
             temporal_tag: Optional[Array] = None,
             key: Optional[jax.Array] = None,
             unroll: int = 1,
             cond_kwargs: Optional[Dict[str, Array]] = None,
             enc_override: Optional[Dict[str, Array]] = None
             ) -> Dict[str, Array]:
    """Batched caption generation (reference inference_forward,
    base.py:142-150, with the same defaults: greedy, max_length 20,
    beam_size 3 / dbs beam 6 groups 3).

    ``cond_kwargs`` carries per-sample conditioning into the decoder's
    init_cache — temporal_tag / condition / style / structure for the
    BahAttn variants, event / keyword probabilities for the conditioned
    transformer decoders.
    """
    special = model.special
    L = max_length if max_length is not None else special.max_length
    cond = dict(cond_kwargs or {})
    if temporal_tag is not None:
        cond["temporal_tag"] = temporal_tag

    if enc_override is not None:
        # precomputed-feature input mode (the reference's attn/fc input
        # contract, base.py:48-61): {attn_emb, attn_emb_len, fc_emb}
        enc = enc_override
    elif lms is None:
        enc = model.apply(variables, wav, wav_len, method=Captioner.encode)
    else:
        enc = model.apply(variables, lms, feat_len,
                          method=Captioner.encode_lms)

    decoder_def = model.decoder
    dec_vars = {"params": variables["params"]["decoder"]}
    B = enc["attn_emb"].shape[0]
    V = decoder_def.vocab_size
    is_transformer = isinstance(decoder_def, TransformerDecoder)

    def init_cache(enc_tree, cond_tree):
        method = type(decoder_def).init_cache
        if is_transformer:
            return decoder_def.apply(
                dec_vars, enc_tree["attn_emb"], enc_tree["attn_emb_len"], L,
                method=method, **cond_tree)
        return decoder_def.apply(
            dec_vars, enc_tree["attn_emb"], enc_tree["attn_emb_len"],
            enc_tree["fc_emb"], L, method=method, **cond_tree)

    def make_step_fn(static):
        if is_transformer:
            # type(decoder_def).step, NOT TransformerDecoder.step: the
            # conditioned subclasses override step to inject the
            # event/keyword embedding (static["cond"]) at every step
            def step_fn(word, t, dyn):
                return decoder_def.apply(
                    dec_vars, word, t, static, dyn,
                    is_pad_t=word == special.pad,
                    method=type(decoder_def).step)
        else:
            def step_fn(word, t, dyn):
                return decoder_def.apply(
                    dec_vars, word, t, static, dyn,
                    method=type(decoder_def).step)
        return step_fn

    if sample_method == "beam":
        K = beam_size if beam_size is not None else 3
        enc_k = expand_to_beams(
            {k: enc[k] for k in ("attn_emb", "attn_emb_len", "fc_emb")}, K)
        static, dyn = init_cache(enc_k, expand_to_beams(cond, K))
        out = beam_search(make_step_fn(static), dyn, B, K, V, special,
                          max_length=L, temp=temp, n_best=n_best,
                          n_best_size=n_best_size)
    elif sample_method == "dbs":
        K = beam_size if beam_size is not None else 6
        bdash = K // group_size
        enc_k = expand_to_beams(
            {k: enc[k] for k in ("attn_emb", "attn_emb_len", "fc_emb")},
            group_size * bdash)
        static, dyn = init_cache(enc_k,
                                 expand_to_beams(cond, group_size * bdash))
        out = diverse_beam_search(
            make_step_fn(static), dyn, B, K, V, special,
            group_size=group_size, diversity_lambda=diversity_lambda,
            max_length=L, temp=temp, group_nbest=group_nbest)
    else:
        static, dyn = init_cache(enc, cond)
        out = stepwise_decode(make_step_fn(static), dyn, B, V, special,
                              max_length=L, method=sample_method, temp=temp,
                              key=key, collect_logits=False, unroll=unroll)
    out.update(enc)
    return out


def sequence_embedding(output: Dict[str, Array], cap_len: Array) -> Array:
    """Mean-pooled caption sequence embedding over valid positions
    (CaptionSequenceModel, base.py:480-506): output["embed"] has length
    cap_len - 1 valid steps per row."""
    from audiocaption_tpu.ops.masking import mean_with_lens
    return mean_with_lens(output["embed"], cap_len - 1)
