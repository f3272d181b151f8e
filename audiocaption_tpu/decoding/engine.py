"""Batched caption decoding engine.

The reference decodes greedy/sampling with a per-batch Python loop and
beam search **sample-by-sample** in Python (captioning/models/base.py:
152-471).  Here every strategy is a single XLA program over the whole
batch (and all beams), built from a decoder-agnostic step function:

    step_fn(word_t [N] int32, t scalar, dyn_cache) -> (logit [N, V], dyn)

``dyn_cache`` is the per-sequence mutable state (RNN hidden, KV caches);
anything beam-invariant (encoder memory) should be closed over inside
``step_fn`` so beam reordering doesn't copy it.

Semantics are pinned to the reference:
  * greedy/sample: early exit when every sequence emitted <eos>; once
    finished, positions are forced to <eos> (base.py:160-168);
  * sample_next_word: greedy / gumbel / temperature / top-k / top-p with
    the reference's exact normalization quirks (base.py:214-252);
  * beam search: double log-softmax with temperature, t=0 selection from
    beam 0 only, finished-beam harvest with score/(t+1) length
    normalization, -1000 penalty on ended beams, early stop when exactly
    beam_size beams finished (base.py:254-325);
  * diverse beam search: group time offsets + hamming diversity penalty
    over previous groups' same-local-time choices (base.py:363-471).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray
StepFn = Callable[[Array, Array, Any], Tuple[Array, Any]]

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class SpecialTokens:
    """CaptionMetaMixin parity (base.py:11-21)."""
    pad: int = 0
    bos: int = 1
    eos: int = 2
    unk: int = 3
    max_length: int = 20


def expand_to_beams(tree: Any, beam_size: int) -> Any:
    """Repeat every leaf's batch rows beam_size times (sample-major:
    row b*K+k belongs to sample b, beam k)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, beam_size, axis=0), tree)


# --------------------------------------------------------------------------
# Next-word sampling (base.py:214-252)
# --------------------------------------------------------------------------

def _top_p_logprob(logit: Array, top_p: float) -> Array:
    """Reference top-p: probs from *raw* logits, keep the smallest set of
    words whose cumulative prob < p (first word always kept), renormalize
    and take log."""
    probs = jax.nn.softmax(logit, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    order = jnp.argsort(-probs, axis=-1)
    csum = jnp.cumsum(sorted_probs, axis=-1)
    keep = csum < top_p
    keep = jnp.concatenate(
        [jnp.ones_like(keep[..., :1]), keep[..., :-1]], axis=-1)
    kept = sorted_probs * keep
    kept = kept / jnp.sum(kept, axis=-1, keepdims=True)
    log_kept = jnp.log(kept)
    # unsort back to vocabulary order
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(log_kept, inv, axis=-1)


def sample_next_word(logit: Array, method: str, temp: float,
                     key: Optional[jax.Array]) -> Tuple[Array, Array]:
    """-> (word [N] int32, sampled_logprob [N] float32)."""
    logprob = jax.nn.log_softmax(logit, axis=-1)
    if method == "greedy":
        word = jnp.argmax(logprob, axis=-1)
        samp = jnp.max(logprob, axis=-1)
    elif method == "gumbel":
        u = jax.random.uniform(key, logprob.shape)
        eps = 1e-20
        g = -jnp.log(-jnp.log(u + eps) + eps)
        y = jax.nn.log_softmax((logprob + g) / temp, axis=-1)
        word = jnp.argmax(y, axis=-1)
        samp = jnp.take_along_axis(logprob, word[:, None], -1)[:, 0]
    else:
        lp = logprob / temp
        if method.startswith("top"):
            top_num = float(method[3:])
            if 0 < top_num < 1:
                lp = _top_p_logprob(logit, top_num)
            else:
                k = int(top_num)
                kth = jnp.sort(lp, axis=-1)[..., -k][..., None]
                lp = jnp.where(lp >= kth, lp, NEG_INF)
        word = jax.random.categorical(key, lp, axis=-1)
        samp = jnp.take_along_axis(lp, word[:, None], -1)[:, 0]
    return word.astype(jnp.int32), samp.astype(jnp.float32)


# --------------------------------------------------------------------------
# Greedy / sampling loop
# --------------------------------------------------------------------------

def stepwise_decode(step_fn: StepFn,
                    dyn_cache: Any,
                    batch_size: int,
                    vocab_size: int,
                    special: SpecialTokens,
                    max_length: Optional[int] = None,
                    method: str = "greedy",
                    temp: float = 1.0,
                    key: Optional[jax.Array] = None,
                    collect_logits: bool = True,
                    unroll: int = 1) -> Dict[str, Array]:
    """Autoregressive decode with early exit when all rows finished.

    Returns {seq [B, L], sampled_logprob [B, L], logit [B, L, V]?}.

    ``unroll > 1`` switches to a ``lax.scan`` over all L steps with the
    given unroll factor: no early exit, but XLA fuses across steps,
    which cuts the fixed per-step dispatch overhead that dominates
    small-decoder throughput on TPU.
    """
    L = max_length if max_length is not None else special.max_length
    B = batch_size
    if key is None:
        key = jax.random.PRNGKey(0)

    if unroll > 1:
        def scan_body(carry, t):
            word, finished, dyn, k = carry
            logit, dyn = step_fn(word, t, dyn)
            k, sub = jax.random.split(k)
            new_word, samp_lp = sample_next_word(logit, method, temp, sub)
            out_word = jnp.where(finished, jnp.int32(special.eos), new_word)
            finished = finished | (new_word == special.eos)
            ys = (out_word, samp_lp,
                  logit if collect_logits else jnp.zeros((B, 0)))
            return (out_word, finished, dyn, k), ys

        carry = (jnp.full((B,), special.bos, jnp.int32),
                 jnp.zeros((B,), bool), dyn_cache, key)
        _, (seq, lps, logits) = jax.lax.scan(
            scan_body, carry, jnp.arange(L), unroll=unroll)
        out = {"seq": seq.T, "sampled_logprob": lps.T}
        if collect_logits:
            out["logit"] = jnp.transpose(logits, (1, 0, 2))
        return out

    seq0 = jnp.full((B, L), special.eos, jnp.int32)
    lp0 = jnp.zeros((B, L), jnp.float32)
    logits0 = (jnp.zeros((B, L, vocab_size), jnp.float32)
               if collect_logits else jnp.zeros((0,), jnp.float32))
    word0 = jnp.full((B,), special.bos, jnp.int32)
    fin0 = jnp.zeros((B,), bool)

    def cond(state):
        t, _, finished, *_ = state
        return (t < L) & ~jnp.all(finished)

    def body(state):
        t, word, finished, dyn, k, seq, lps, logits = state
        logit, dyn = step_fn(word, t, dyn)
        k, sub = jax.random.split(k)
        new_word, samp_lp = sample_next_word(logit, method, temp, sub)
        # force <eos> once finished (base.py:160-167)
        out_word = jnp.where(finished, jnp.int32(special.eos), new_word)
        finished = finished | (new_word == special.eos)
        seq = jax.lax.dynamic_update_slice_in_dim(
            seq, out_word[:, None], t, axis=1)
        lps = jax.lax.dynamic_update_slice_in_dim(
            lps, samp_lp[:, None], t, axis=1)
        if collect_logits:
            logits = jax.lax.dynamic_update_slice_in_dim(
                logits, logit[:, None, :], t, axis=1)
        return (t + 1, out_word, finished, dyn, k, seq, lps, logits)

    state = (jnp.int32(0), word0, fin0, dyn_cache, key, seq0, lp0, logits0)
    state = jax.lax.while_loop(cond, body, state)
    out = {"seq": state[5], "sampled_logprob": state[6]}
    if collect_logits:
        out["logit"] = state[7]
    return out


# --------------------------------------------------------------------------
# Beam search (base.py:254-325 semantics, fully batched)
# --------------------------------------------------------------------------

def _merge_done(done_score: Array, done_seq: Array,
                cand_score: Array, cand_seq: Array
                ) -> Tuple[Array, Array]:
    """Keep the best K finished beams so far.  lax.top_k is stable
    (prefers lower indices), matching the reference's stable sort over
    harvest order."""
    K = done_score.shape[1]
    scores = jnp.concatenate([done_score, cand_score], axis=1)
    seqs = jnp.concatenate([done_seq, cand_seq], axis=1)
    new_score, sel = jax.lax.top_k(scores, K)
    new_seq = jnp.take_along_axis(seqs, sel[..., None], axis=1)
    return new_score, new_seq


def beam_search(step_fn: StepFn,
                dyn_cache: Any,
                batch_size: int,
                beam_size: int,
                vocab_size: int,
                special: SpecialTokens,
                max_length: Optional[int] = None,
                temp: float = 1.0,
                n_best: bool = False,
                n_best_size: Optional[int] = None) -> Dict[str, Array]:
    """Batched beam search.

    ``dyn_cache`` leaves must already have leading dim B*K (use
    ``expand_to_beams``).  Returns {"seq": [B, L]} or, with n_best,
    {"seq": [B, n_best_size, L]} plus {"score": ...}.
    """
    L = max_length if max_length is not None else special.max_length
    B, K, V = batch_size, beam_size, vocab_size

    tk0 = jnp.zeros((B, K), jnp.float32)
    word0 = jnp.full((B, K), special.bos, jnp.int32)
    seq0 = jnp.full((B, K, L), special.eos, jnp.int32)
    done_score0 = jnp.full((B, K), NEG_INF, jnp.float32)
    done_seq0 = jnp.full((B, K, L), special.eos, jnp.int32)
    done_count0 = jnp.zeros((B,), jnp.int32)
    stopped0 = jnp.zeros((B,), bool)

    def cond(state):
        t, *_, stopped = state
        return (t < L) & ~jnp.all(stopped)

    def body(state):
        (t, topk_lp, word, dyn, seq,
         done_score, done_seq, done_count, stopped) = state
        logit, dyn = step_fn(word.reshape(B * K), t, dyn)
        lp = jax.nn.log_softmax(logit, axis=-1)
        lp = jax.nn.log_softmax(lp / temp, axis=-1).reshape(B, K, V)
        total = topk_lp[..., None] + lp
        # t == 0: all beams identical -> select from beam 0 only
        beam_arange = jnp.arange(K)[None, :, None]
        total = jnp.where((t == 0) & (beam_arange > 0), NEG_INF, total)
        new_lp, idx = jax.lax.top_k(total.reshape(B, K * V), K)
        prev_beam = idx // V                      # [B, K]
        new_word = (idx % V).astype(jnp.int32)    # [B, K]

        # reorder sequences and caches to the selected parent beams
        seq = jnp.take_along_axis(seq, prev_beam[..., None], axis=1)
        seq = jax.lax.dynamic_update_slice_in_dim(
            seq, new_word[..., None], t, axis=2)
        gather_idx = (jnp.arange(B)[:, None] * K + prev_beam).reshape(-1)
        dyn = jax.tree_util.tree_map(lambda x: x[gather_idx], dyn)

        is_end = (new_word == special.eos) | (t == L - 1)
        harvest = is_end & ~stopped[:, None]
        cand_score = jnp.where(harvest, new_lp / (t + 1).astype(jnp.float32),
                               NEG_INF)
        done_score, done_seq = _merge_done(done_score, done_seq,
                                           cand_score, seq)
        done_count = done_count + jnp.sum(harvest, axis=1)
        stopped = stopped | (done_count == K)
        new_lp = jnp.where(is_end, new_lp - 1000.0, new_lp)

        return (t + 1, new_lp, new_word, dyn, seq,
                done_score, done_seq, done_count, stopped)

    state = (jnp.int32(0), tk0, word0, dyn_cache, seq0,
             done_score0, done_seq0, done_count0, stopped0)
    state = jax.lax.while_loop(cond, body, state)
    done_score, done_seq = state[5], state[6]

    if n_best:
        n = n_best_size if n_best_size is not None else K
        return {"seq": done_seq[:, :n], "score": done_score[:, :n]}
    return {"seq": done_seq[:, 0], "score": done_score[:, 0]}


# --------------------------------------------------------------------------
# Diverse beam search (base.py:363-471)
# --------------------------------------------------------------------------

def diverse_beam_search(step_fn: StepFn,
                        dyn_cache: Any,
                        batch_size: int,
                        beam_size: int,
                        vocab_size: int,
                        special: SpecialTokens,
                        group_size: int,
                        diversity_lambda: float = 0.5,
                        max_length: Optional[int] = None,
                        temp: float = 1.0,
                        group_nbest: bool = True) -> Dict[str, Array]:
    """Batched DBS.  ``dyn_cache`` leaves must have leading dim
    B*group_size*bdash (group-major within each sample: index
    b*G*bdash + g*bdash + k).

    Returns {"seq": [B, beam_size, L]} with group_nbest (the reference's
    dcase-style output: bdash best per group), else [B, group_size, L].
    """
    L = max_length if max_length is not None else special.max_length
    B, G, V = batch_size, group_size, vocab_size
    bdash = beam_size // G
    total_steps = L + G - 1

    lp_table0 = jnp.zeros((B, G, bdash), jnp.float32)
    word0 = jnp.full((B, G, bdash), special.bos, jnp.int32)
    seq0 = jnp.full((B, G, bdash, L), special.eos, jnp.int32)
    done_score0 = jnp.full((B, G, bdash), NEG_INF, jnp.float32)
    done_seq0 = jnp.full((B, G, bdash, L), special.eos, jnp.int32)

    def body(t, state):
        lp_table, word, dyn, seq, done_score, done_seq = state
        # one decoder step for all groups at once
        logit, dyn_new = step_fn(word.reshape(B * G * bdash), t, dyn)
        lp = jax.nn.log_softmax(logit, axis=-1)
        lp = jax.nn.log_softmax(lp / temp, axis=-1).reshape(B, G, bdash, V)

        # diversity penalty: counts of words chosen by previous groups at
        # the same local time (their positions t-g for current group g)
        new_states = []
        for g in range(G):
            active = (t >= g) & (t <= L + g - 1)
            local_t = t - g
            lp_g = lp[:, g]                                   # [B, bd, V]
            if g > 0:
                # previous groups' tokens at position local_t, taken from
                # their state *after this step's* beam reorder (the
                # reference processes groups sequentially within t and
                # reorders seq_table in place, base.py:444-452)
                prev_seq = jnp.stack(
                    [new_states[pg]["seq"] for pg in range(g)], axis=1)
                prev_tokens = jax.lax.dynamic_index_in_dim(
                    prev_seq, jnp.maximum(local_t, 0), axis=3,
                    keepdims=False)                           # [B, g, bd]
                change = jnp.sum(
                    jax.nn.one_hot(prev_tokens, V, dtype=jnp.float32),
                    axis=(1, 2))                              # [B, V]
                lp_g = lp_g - diversity_lambda * change[:, None, :]
            total = lp_table[:, g][..., None] + lp_g          # [B, bd, V]
            first = local_t == 0
            beam_arange = jnp.arange(bdash)[None, :, None]
            total = jnp.where(first & (beam_arange > 0), NEG_INF, total)
            new_lp, idx = jax.lax.top_k(total.reshape(B, bdash * V), bdash)
            prev_beam = idx // V
            new_word = (idx % V).astype(jnp.int32)

            seq_g = jnp.take_along_axis(seq[:, g], prev_beam[..., None],
                                        axis=1)
            seq_g = jax.lax.dynamic_update_slice_in_dim(
                seq_g, new_word[..., None], jnp.maximum(local_t, 0), axis=2)

            is_end = (new_word == special.eos) | (t == L + g - 1)
            harvest = is_end & active
            cand_score = jnp.where(
                harvest, new_lp / (local_t + 1).astype(jnp.float32), NEG_INF)
            d_score, d_seq = _merge_done(done_score[:, g], done_seq[:, g],
                                         cand_score, seq_g)
            new_lp = jnp.where(is_end, new_lp - 1000.0, new_lp)

            # freeze inactive groups
            sel = lambda new, old: jnp.where(
                jnp.broadcast_to(
                    jnp.asarray(active).reshape((1,) * old.ndim), old.shape),
                new, old)
            new_states.append(dict(
                lp=sel(new_lp, lp_table[:, g]),
                word=sel(new_word, word[:, g]),
                seq=sel(seq_g, seq[:, g]),
                d_score=sel(d_score, done_score[:, g]),
                d_seq=sel(d_seq, done_seq[:, g]),
                prev_beam=jnp.where(active, prev_beam,
                                    jnp.arange(bdash)[None, :]),
            ))

        lp_table = jnp.stack([s["lp"] for s in new_states], axis=1)
        word = jnp.stack([s["word"] for s in new_states], axis=1)
        seq = jnp.stack([s["seq"] for s in new_states], axis=1)
        done_score = jnp.stack([s["d_score"] for s in new_states], axis=1)
        done_seq = jnp.stack([s["d_seq"] for s in new_states], axis=1)

        # cache reorder: flat gather over [B*G*bdash]
        prev_beam_all = jnp.stack([s["prev_beam"] for s in new_states],
                                  axis=1)                     # [B, G, bd]
        base = (jnp.arange(B)[:, None, None] * G * bdash +
                jnp.arange(G)[None, :, None] * bdash)
        gather_idx = (base + prev_beam_all).reshape(-1)
        # only adopt stepped cache for active groups
        group_active = jnp.stack(
            [jnp.broadcast_to((t >= g) & (t <= L + g - 1), (bdash,))
             for g in range(G)])                              # [G, bd]
        flat_active = jnp.tile(group_active.reshape(-1), (B,))
        dyn = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                flat_active.reshape((-1,) + (1,) * (old.ndim - 1)),
                new[gather_idx], old),
            dyn_new, dyn)

        return (lp_table, word, dyn, seq, done_score, done_seq)

    state = (lp_table0, word0, dyn_cache, seq0, done_score0, done_seq0)
    state = jax.lax.fori_loop(0, total_steps, body, state)
    done_score, done_seq = state[4], state[5]

    if group_nbest:
        seq = done_seq.reshape(B, G * bdash, L)
        score = done_score.reshape(B, G * bdash)
    else:
        seq = done_seq[:, :, 0]
        score = done_score[:, :, 0]
    return {"seq": seq, "score": score}
