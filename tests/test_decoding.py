"""Decoding engine tests.

The batched XLA engine is compared against a straightforward per-sample
NumPy implementation of the reference algorithms (greedy loop
base.py:152-168, beam search base.py:254-325, DBS base.py:363-471).
The toy decoder is recurrent so beam-search cache reordering is
exercised: getting the parent-beam gather wrong changes tokens.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiocaption_tpu.decoding import (
    SpecialTokens, stepwise_decode, beam_search, diverse_beam_search,
    expand_to_beams, sample_next_word)

V = 11
D = 7
SPECIAL = SpecialTokens(max_length=8)

rng = np.random.RandomState(0)
W_EMB = rng.randn(V, D).astype(np.float32)
W_REC = (rng.randn(D, D) * 0.5).astype(np.float32)
W_OUT = rng.randn(D, V).astype(np.float32)
B_PER_SAMPLE = rng.randn(4, D).astype(np.float32)  # per-sample bias


def np_step(word, h, sample_bias):
    """word: [N], h: [N, D] -> (logit [N, V], h')."""
    x = W_EMB[word] + sample_bias
    h = np.tanh(x + h @ W_REC)
    return h @ W_OUT, h


def make_jax_step(sample_bias):
    bias = jnp.asarray(sample_bias)

    def step_fn(word, t, dyn):
        h = dyn["h"]
        x = jnp.asarray(W_EMB)[word] + bias
        h = jnp.tanh(x + h @ jnp.asarray(W_REC))
        return h @ jnp.asarray(W_OUT), {"h": h}
    return step_fn


def log_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


# ------------------------------------------------------------- greedy ----

def np_greedy(sample_bias, max_length):
    N = sample_bias.shape[0]
    h = np.zeros((N, D), np.float32)
    word = np.full((N,), SPECIAL.bos, np.int64)
    seq = np.full((N, max_length), SPECIAL.eos, np.int64)
    unfinished = np.ones(N, bool)
    for t in range(max_length):
        logit, h = np_step(word, h, sample_bias)
        word = log_softmax(logit).argmax(-1)
        seq[:, t] = word
        unfinished &= seq[:, t] != SPECIAL.eos
        seq[:, t][~unfinished] = SPECIAL.eos
        word = seq[:, t]
        if unfinished.sum() == 0:
            break
    return seq


def test_greedy_matches_reference_loop():
    bias = B_PER_SAMPLE
    want = np_greedy(bias, SPECIAL.max_length)
    step_fn = make_jax_step(bias)
    dyn = {"h": jnp.zeros((4, D))}
    out = stepwise_decode(step_fn, dyn, 4, V, SPECIAL, method="greedy")
    np.testing.assert_array_equal(np.asarray(out["seq"]), want)


def test_greedy_is_jittable():
    bias = B_PER_SAMPLE
    step_fn = make_jax_step(bias)

    @jax.jit
    def run():
        dyn = {"h": jnp.zeros((4, D))}
        return stepwise_decode(step_fn, dyn, 4, V, SPECIAL)["seq"]
    np.testing.assert_array_equal(np.asarray(run()),
                                  np_greedy(bias, SPECIAL.max_length))


# --------------------------------------------------------------- beam ----

def np_beam_search(sample_bias, beam_size, max_length, temp=1.0):
    """Per-sample reference implementation of base.py:254-325."""
    N = sample_bias.shape[0]
    out = np.full((N, max_length), SPECIAL.eos, np.int64)
    for i in range(N):
        K = beam_size
        topk_logprob = np.zeros(K, np.float64)
        h = np.zeros((K, D), np.float32)
        word = np.full((K,), SPECIAL.bos, np.int64)
        seq = None
        done_beams = []
        for t in range(max_length):
            logit, h_new = np_step(word, h, sample_bias[i:i + 1].repeat(K, 0))
            lp = log_softmax(log_softmax(logit) / temp)
            total = topk_logprob[:, None] + lp
            if t == 0:
                flat = total[0]
                idx = np.argsort(-flat, kind="stable")[:K]
                topk_logprob = flat[idx]
                prev_beam = np.zeros(K, np.int64)
                next_word = idx
            else:
                flat = total.reshape(-1)
                idx = np.argsort(-flat, kind="stable")[:K]
                topk_logprob = flat[idx]
                prev_beam = idx // V
                next_word = idx % V
            if t == 0:
                seq = next_word[:, None]
            else:
                seq = np.concatenate([seq[prev_beam], next_word[:, None]], 1)
            h = h_new[prev_beam]
            word = next_word
            is_end = next_word == SPECIAL.eos
            if t == max_length - 1:
                is_end[:] = True
            for k in range(K):
                if is_end[k]:
                    done_beams.append(
                        {"seq": seq[k].copy(),
                         "score": topk_logprob[k] / (t + 1)})
            topk_logprob[is_end] -= 1000
            if len(done_beams) == K:
                break
        best = sorted(done_beams, key=lambda x: -x["score"])[0]
        out[i, :len(best["seq"])] = best["seq"]
    return out


@pytest.mark.parametrize("beam_size", [1, 2, 3])
def test_beam_search_matches_reference_loop(beam_size):
    bias = B_PER_SAMPLE
    want = np_beam_search(bias, beam_size, SPECIAL.max_length)
    step_fn = make_jax_step(bias.repeat(beam_size, 0))
    dyn = expand_to_beams({"h": jnp.zeros((4, D))}, beam_size)
    out = beam_search(step_fn, dyn, 4, beam_size, V, SPECIAL)
    np.testing.assert_array_equal(np.asarray(out["seq"]), want)


def test_beam_search_nbest_shapes():
    bias = B_PER_SAMPLE
    K = 3
    step_fn = make_jax_step(bias.repeat(K, 0))
    dyn = expand_to_beams({"h": jnp.zeros((4, D))}, K)
    out = beam_search(step_fn, dyn, 4, K, V, SPECIAL, n_best=True,
                      n_best_size=2)
    assert out["seq"].shape == (4, 2, SPECIAL.max_length)
    # scores sorted descending
    s = np.asarray(out["score"])
    assert (s[:, 0] >= s[:, 1]).all()


# ---------------------------------------------------------------- DBS ----

def np_dbs(sample_bias, beam_size, group_size, lam, max_length, temp=1.0):
    """Per-sample reference implementation of base.py:363-471."""
    N = sample_bias.shape[0]
    bdash = beam_size // group_size
    out = np.full((N, beam_size, max_length), SPECIAL.eos, np.int64)
    for i in range(N):
        seq_table = [np.zeros((bdash, 0), np.int64) for _ in range(group_size)]
        lp_table = [np.zeros(bdash) for _ in range(group_size)]
        done_table = [[] for _ in range(group_size)]
        h = [np.zeros((bdash, D), np.float32) for _ in range(group_size)]
        word = [np.full((bdash,), SPECIAL.bos, np.int64)
                for _ in range(group_size)]
        for t in range(max_length + group_size - 1):
            for g in range(group_size):
                if not (t >= g and t <= max_length + g - 1):
                    continue
                lt = t - g
                logit, h_new = np_step(word[g], h[g],
                                       sample_bias[i:i + 1].repeat(bdash, 0))
                lp = log_softmax(log_softmax(logit) / temp)
                if g > 0:
                    change = np.zeros(V)
                    for pg in range(g):
                        for k in range(bdash):
                            change[seq_table[pg][k, lt]] += 1
                    lp = lp - lam * change[None, :]
                total = lp_table[g][:, None] + lp
                if lt == 0:
                    flat = total[0]
                    idx = np.argsort(-flat, kind="stable")[:bdash]
                    prev_beam = np.zeros(bdash, np.int64)
                else:
                    flat = total.reshape(-1)
                    idx = np.argsort(-flat, kind="stable")[:bdash]
                    prev_beam = idx // V
                lp_table[g] = flat[idx]
                next_word = idx % V if lt > 0 else idx
                if lt > 0:
                    seq_table[g] = seq_table[g][prev_beam]
                seq_table[g] = np.concatenate(
                    [seq_table[g], next_word[:, None]], 1)
                h[g] = h_new[prev_beam]
                word[g] = next_word
                is_end = seq_table[g][:, lt] == SPECIAL.eos
                if t == max_length + g - 1:
                    is_end[:] = True
                for k in range(bdash):
                    if is_end[k]:
                        done_table[g].append(
                            {"seq": seq_table[g][k].copy(),
                             "score": lp_table[g][k] / (lt + 1)})
                lp_table[g][is_end] -= 1000
        done_table = [sorted(d, key=lambda x: -x["score"])[:bdash]
                      for d in done_table]
        done = sum(done_table, [])
        for j, beam in enumerate(done):
            out[i, j, :len(beam["seq"])] = beam["seq"]
    return out


@pytest.mark.parametrize("group_size,lam", [(2, 0.5), (4, 0.8)])
def test_dbs_matches_reference_loop(group_size, lam):
    bias = B_PER_SAMPLE
    K = 4
    bdash = K // group_size
    want = np_dbs(bias, K, group_size, lam, SPECIAL.max_length)
    step_fn = make_jax_step(bias.repeat(group_size * bdash, 0))
    dyn = expand_to_beams({"h": jnp.zeros((4, D))}, group_size * bdash)
    out = diverse_beam_search(step_fn, dyn, 4, K, V, SPECIAL,
                              group_size=group_size, diversity_lambda=lam)
    np.testing.assert_array_equal(np.asarray(out["seq"]), want)


# ------------------------------------------------------------ sampling ----

def test_sample_next_word_topk_support():
    key = jax.random.PRNGKey(0)
    logit = jnp.asarray(np.linspace(0, 5, V)[None].repeat(64, 0))
    words = []
    for i in range(20):
        w, _ = sample_next_word(logit, "top3", 1.0,
                                jax.random.fold_in(key, i))
        words.append(np.asarray(w))
    words = np.concatenate(words)
    assert set(words.tolist()) <= {V - 1, V - 2, V - 3}


def test_sample_next_word_topp_support():
    key = jax.random.PRNGKey(1)
    probs = np.full(V, 1e-4)
    probs[3], probs[7] = 0.6, 0.35
    logit = jnp.asarray(np.log(probs)[None].repeat(64, 0))
    w, _ = sample_next_word(logit, "top0.5", 1.0, key)
    assert set(np.asarray(w).tolist()) <= {3}


def test_sample_next_word_greedy_logprob():
    logit = jnp.asarray(np.random.RandomState(3).randn(5, V))
    w, lp = sample_next_word(logit, "greedy", 1.0, None)
    ref_lp = log_softmax(np.asarray(logit))
    np.testing.assert_array_equal(np.asarray(w), ref_lp.argmax(-1))
    np.testing.assert_allclose(np.asarray(lp), ref_lp.max(-1), atol=1e-6)


def test_gumbel_and_categorical_run():
    logit = jnp.asarray(np.random.RandomState(4).randn(6, V))
    for method in ("gumbel", "sample", "top5", "top0.9"):
        w, lp = sample_next_word(logit, method, 0.8, jax.random.PRNGKey(2))
        assert w.shape == (6,)
        assert np.all(np.asarray(w) >= 0) and np.all(np.asarray(w) < V)


def test_unrolled_greedy_matches_while_loop():
    bias = B_PER_SAMPLE
    step_fn = make_jax_step(bias)
    out_while = stepwise_decode(step_fn, {"h": jnp.zeros((4, D))}, 4, V,
                                SPECIAL, method="greedy")
    out_scan = stepwise_decode(step_fn, {"h": jnp.zeros((4, D))}, 4, V,
                               SPECIAL, method="greedy", unroll=4)
    np.testing.assert_array_equal(np.asarray(out_while["seq"]),
                                  np.asarray(out_scan["seq"]))
