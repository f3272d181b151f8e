"""Self-critical sequence training (SCST)
(TPU re-design of captioning/models/rl_model.py:11-85 and the runner's
rl_train flag, run.py:36-41,118-120).

The reference computes, per batch: a greedy baseline (no grad), a
multinomial sample with its log-probs, host-side CIDEr rewards for both,
and the REINFORCE loss -(r_sample - r_greedy) * logprob masked beyond
<eos> (rl_model.py:24-85).

TPU structure (keeps the device program static, host only scores):
  1. jitted SAMPLE pass: greedy seq + sampled seq (no grads);
  2. host: CIDEr rewards via compute_batch_score semantics
     (model_util.py:117-164);
  3. jitted GRAD pass: teacher-force the sampled sequence to recompute
     its per-token log-probs differentiably, multiply by the advantage,
     mask after the first <eos> (mask includes the <eos> token itself,
     rl_model.py:51-56), normalize by mask sum.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.metrics.cider import CiderD
from audiocaption_tpu.models.captioner import Captioner, generate

Array = jnp.ndarray


def scst_mask(seq: np.ndarray, eos: int) -> np.ndarray:
    """1 up to and including the first <eos> (rl_model.py:51-56)."""
    B, L = seq.shape
    mask = np.zeros((B, L), np.float32)
    for b in range(B):
        ended = np.where(seq[b] == eos)[0]
        end = (ended[0] + 1) if len(ended) else L
        mask[b, :end] = 1.0
    return mask


def compute_batch_score(seqs: np.ndarray, key2refs: Dict[str, List[str]],
                        keys: List[str], idx2word: Dict[int, str],
                        bos: int, eos: int,
                        scorer: Optional[CiderD] = None) -> np.ndarray:
    """Per-sample CIDEr against references (model_util.py:117-164)."""
    if scorer is None:
        from audiocaption_tpu.native import FastCiderD
        scorer = FastCiderD()   # C++ scorer; falls back to CiderD
    hyp = {}
    refs = {}
    for i, key in enumerate(keys):
        if key in hyp:
            continue
        words = []
        for w in seqs[i]:
            w = int(w)
            if w == bos:
                continue
            if w == eos:
                break
            words.append(idx2word.get(w, "<unk>"))
        hyp[key] = [" ".join(words)]
        refs[key] = key2refs[key]
    _, scores = scorer.compute_score(refs, hyp)
    key_order = list(refs.keys())
    key2score = {k: scores[i] for i, k in enumerate(key_order)}
    return np.asarray([key2score[k] for k in keys], np.float32)


def make_scst_fns(model: Captioner, max_length: int = 20,
                  sample_temp: float = 1.0):
    """-> (sample_fn, loss_grad_fn) jitted pieces of the SCST step."""
    special = model.special

    @jax.jit
    def sample_fn(variables, wav, wav_len, key):
        greedy = generate(model, variables, wav, wav_len,
                          sample_method="greedy",
                          max_length=max_length)["seq"]
        sampled = generate(model, variables, wav, wav_len,
                           sample_method="sample", temp=sample_temp,
                           max_length=max_length, key=key)["seq"]
        return greedy, sampled

    def loss_fn(params, batch_stats, wav, wav_len, sampled, advantage,
                mask):
        variables = {"params": params, "batch_stats": batch_stats}
        # teacher-force the sampled sequence: input = [bos] + sampled[:-1]
        B = sampled.shape[0]
        word = jnp.concatenate(
            [jnp.full((B, 1), special.bos, jnp.int32), sampled[:, :-1]],
            axis=1)
        enc = model.apply(variables, wav, wav_len, method=Captioner.encode)
        dec_vars = {"params": params["decoder"]}
        from audiocaption_tpu.models.transformer_decoder import (
            TransformerDecoder)
        if isinstance(model.decoder, TransformerDecoder):
            out = model.decoder.apply(
                dec_vars, word, enc["attn_emb"], enc["attn_emb_len"],
                cap_padding_mask=word == special.pad)
            logit = out["logit"]
        else:
            # RNN decoder: step through teacher-forced tokens
            static, dyn = model.decoder.apply(
                dec_vars, enc["attn_emb"], enc["attn_emb_len"],
                enc["fc_emb"], sampled.shape[1],
                method=type(model.decoder).init_cache)
            logits = []
            for t in range(sampled.shape[1]):
                logit_t, dyn = model.decoder.apply(
                    dec_vars, word[:, t], jnp.int32(t), static, dyn,
                    method=type(model.decoder).step)
                logits.append(logit_t)
            logit = jnp.stack(logits, axis=1)
        lp = jax.nn.log_softmax(logit, axis=-1)
        tok_lp = jnp.take_along_axis(lp, sampled[..., None], -1)[..., 0]
        loss = -advantage[:, None] * tok_lp * mask
        return jnp.sum(loss) / jnp.sum(mask)

    @jax.jit
    def loss_grad_fn(params, batch_stats, wav, wav_len, sampled,
                     advantage, mask):
        return jax.value_and_grad(loss_fn)(params, batch_stats, wav,
                                           wav_len, sampled, advantage,
                                           mask)

    return sample_fn, loss_grad_fn


def scst_step(model: Captioner, variables: Dict, batch: Dict,
              key2refs: Dict[str, List[str]], keys: List[str],
              idx2word: Dict[int, str], fns, key,
              scorer: Optional[CiderD] = None):
    """One full SCST step -> (loss, grads, metrics)."""
    sample_fn, loss_grad_fn = fns
    special = model.special
    wav = jnp.asarray(batch["wav"])
    wav_len = jnp.asarray(batch["wav_len"])
    greedy, sampled = sample_fn(variables, wav, wav_len, key)
    greedy, sampled = np.asarray(greedy), np.asarray(sampled)
    r_greedy = compute_batch_score(greedy, key2refs, keys, idx2word,
                                   special.bos, special.eos, scorer)
    r_sample = compute_batch_score(sampled, key2refs, keys, idx2word,
                                   special.bos, special.eos, scorer)
    advantage = jnp.asarray(r_sample - r_greedy)
    mask = jnp.asarray(scst_mask(sampled, special.eos))
    loss, grads = loss_grad_fn(variables["params"],
                               variables.get("batch_stats", {}),
                               wav, wav_len, jnp.asarray(sampled),
                               advantage, mask)
    metrics = {"loss": float(loss),
               "reward_sample": float(r_sample.mean()),
               "reward_greedy": float(r_greedy.mean())}
    return loss, grads, metrics
