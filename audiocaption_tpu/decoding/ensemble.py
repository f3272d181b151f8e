"""Model ensembling by per-step log-probability averaging
(python_scripts/train_eval/ensemble.py:133-276): each model encodes
independently, and at every decode step the next-token distribution is
the mean of the models' log-softmax outputs.  Works with every engine
strategy (greedy / sample / beam / dbs) because it is just a composed
step function — the whole ensemble still decodes as ONE XLA program
(the reference loops models in Python per step).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from audiocaption_tpu.decoding.engine import (
    SpecialTokens, beam_search, diverse_beam_search, expand_to_beams,
    stepwise_decode)
from audiocaption_tpu.models.captioner import Captioner
from audiocaption_tpu.models.transformer_decoder import TransformerDecoder


def ensemble_generate(models: Sequence[Captioner],
                      variables_list: Sequence[Dict],
                      wav, wav_len,
                      sample_method: str = "beam",
                      beam_size: Optional[int] = None,
                      max_length: Optional[int] = None,
                      temp: float = 1.0,
                      group_size: int = 3,
                      diversity_lambda: float = 0.5,
                      key: Optional[jax.Array] = None) -> Dict:
    """Decode with an ensemble.  All models must share the tokenizer /
    vocab (ensemble.py requirement)."""
    assert len(models) == len(variables_list) and len(models) > 0
    special = models[0].special
    L = max_length if max_length is not None else special.max_length
    V = models[0].decoder.vocab_size

    encs = [m.apply(v, wav, wav_len, method=Captioner.encode)
            for m, v in zip(models, variables_list)]
    B = encs[0]["attn_emb"].shape[0]

    def init_caches(k: int):
        statics, dyns = [], []
        for m, v, enc in zip(models, variables_list, encs):
            enc_k = expand_to_beams(
                {x: enc[x] for x in ("attn_emb", "attn_emb_len", "fc_emb")},
                k) if k > 1 else enc
            dec = m.decoder
            dec_vars = {"params": v["params"]["decoder"]}
            if isinstance(dec, TransformerDecoder):
                s, d = dec.apply(dec_vars, enc_k["attn_emb"],
                                 enc_k["attn_emb_len"], L,
                                 method=type(dec).init_cache)
            else:
                s, d = dec.apply(dec_vars, enc_k["attn_emb"],
                                 enc_k["attn_emb_len"], enc_k["fc_emb"], L,
                                 method=type(dec).init_cache)
            statics.append(s)
            dyns.append(d)
        return statics, tuple(dyns)

    def make_step(statics):
        def step_fn(word, t, dyn_tuple):
            lps = []
            new_dyns = []
            for m, v, static, dyn in zip(models, variables_list, statics,
                                         dyn_tuple):
                dec = m.decoder
                dec_vars = {"params": v["params"]["decoder"]}
                if isinstance(dec, TransformerDecoder):
                    # type(dec).step so conditioned subclasses keep
                    # their per-step cond injection
                    logit, nd = dec.apply(
                        dec_vars, word, t, static, dyn,
                        is_pad_t=word == special.pad,
                        method=type(dec).step)
                else:
                    logit, nd = dec.apply(dec_vars, word, t, static, dyn,
                                          method=type(dec).step)
                lps.append(jax.nn.log_softmax(logit, axis=-1))
                new_dyns.append(nd)
            mean_lp = sum(lps) / len(lps)
            return mean_lp, tuple(new_dyns)
        return step_fn

    if sample_method == "beam":
        K = beam_size if beam_size is not None else 3
        statics, dyns = init_caches(K)
        return beam_search(make_step(statics), dyns, B, K, V, special,
                           max_length=L, temp=temp)
    if sample_method == "dbs":
        K = beam_size if beam_size is not None else 6
        bdash = K // group_size
        statics, dyns = init_caches(group_size * bdash)
        return diverse_beam_search(make_step(statics), dyns, B, K, V,
                                   special, group_size=group_size,
                                   diversity_lambda=diversity_lambda,
                                   max_length=L, temp=temp)
    statics, dyns = init_caches(1)
    return stepwise_decode(make_step(statics), dyns, B, V, special,
                           max_length=L, method=sample_method, temp=temp,
                           key=key, collect_logits=False)
