"""Metric stack tests: BLEU vs nltk, ROUGE-L/CIDEr hand cases,
PTB normalization, diversity metrics."""

import math

import numpy as np
import pytest

from audiocaption_tpu.metrics import (
    ptb_tokenize, corpus_bleu, rouge_l, CiderD, evaluate_captions,
    diversity_metrics)
from audiocaption_tpu.metrics.tokenize import ptb_tokenize_sentence


PREDS = {
    "a": ["a dog barks loudly in the park"],
    "b": ["water is flowing down a stream"],
    "c": ["someone plays a guitar melody"],
}
REFS = {
    "a": ["a dog barks loudly at the park",
          "a dog is barking in a park",
          "dogs bark loudly outside"],
    "b": ["water flows down a small stream",
          "a stream of water is flowing"],
    "c": ["a person plays guitar",
          "someone is playing a guitar melody"],
}


def test_bleu_matches_nltk():
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu
    from nltk.translate.bleu_score import SmoothingFunction
    hyps = [PREDS[k][0].split() for k in PREDS]
    refs = [[r.split() for r in REFS[k]] for k in PREDS]
    ours, _ = corpus_bleu(PREDS, REFS)
    for n in range(1, 5):
        weights = tuple([1.0 / n] * n)
        want = nltk_bleu(refs, hyps, weights=weights)
        np.testing.assert_allclose(ours[n - 1], want, rtol=1e-4,
                                   err_msg=f"bleu-{n}")


def test_bleu_perfect_match():
    p = {"x": ["a b c d"]}
    r = {"x": ["a b c d"]}
    scores, _ = corpus_bleu(p, r)
    np.testing.assert_allclose(scores, [1.0] * 4, atol=1e-9)


def test_rouge_l_hand_case():
    # hyp = "a b c", ref = "a c d": LCS=2, P=2/3, R=2/3 -> F=2/3
    score, _ = rouge_l({"x": ["a b c"]}, {"x": ["a c d"]})
    np.testing.assert_allclose(score, 2 / 3, rtol=1e-6)


def test_rouge_l_takes_max_over_refs():
    score, _ = rouge_l({"x": ["a b c"]}, {"x": ["z z z", "a b c"]})
    np.testing.assert_allclose(score, 1.0, rtol=1e-6)


def test_cider_identical_is_10():
    """A candidate identical to the single reference of every doc scores
    10 (perfect cosine in every n, no length penalty)."""
    preds = {"a": ["a big dog barks today"],
             "b": ["water flows quickly today"]}
    refs = {"a": ["a big dog barks today"],
            "b": ["water flows quickly today"]}
    score, per = CiderD().compute_score(refs, preds)
    np.testing.assert_allclose(per, [10.0, 10.0], rtol=1e-6)


def test_cider_orders_sensibly():
    good = {"a": [REFS["a"][0]], "b": [REFS["b"][0]], "c": [REFS["c"][0]]}
    bad = {"a": ["completely unrelated words here"],
           "b": ["zebra xylophone quantum"],
           "c": ["nothing matches at all"]}
    s_good, _ = CiderD().compute_score(REFS, good)
    s_bad, _ = CiderD().compute_score(REFS, bad)
    assert s_good > s_bad
    assert s_bad < 1.0


def test_ptb_tokenize_sentence():
    assert ptb_tokenize_sentence("A dog barks.") == "a dog barks"
    assert ptb_tokenize_sentence("Hello, world!") == "hello world"
    assert ptb_tokenize_sentence("The dog's bone") == "the dog 's bone"


def test_evaluate_captions_end_to_end():
    result = evaluate_captions(
        {k: [v[0]] for k, v in PREDS.items()}, REFS, use_java=False)
    for key in ("bleu_1", "bleu_4", "rouge_l", "cider"):
        assert key in result
        assert 0.0 <= result[key] <= 10.0
    assert result["bleu_1"] > result["bleu_4"]


def test_evaluate_captions_per_audio():
    result = evaluate_captions(
        {k: [v[0]] for k, v in PREDS.items()}, REFS, use_java=False,
        per_audio=True)
    assert set(result["per_audio"].keys()) == {"a", "b", "c"}


def test_diversity_metrics():
    preds = ["a dog barks", "a dog barks", "water flows down"]
    out = diversity_metrics(preds, train_captions=["a dog barks"])
    assert out["vocab_size"] == 6
    assert out["novel_ratio"] == pytest.approx(1 / 3)
    assert 0 < out["distinct_1"] <= 1
    assert "self_bleu_4" in out


def test_instance_diversity_metrics():
    from audiocaption_tpu.metrics.diversity import instance_diversity_metrics
    preds = ["a dog barks", "a a a a", "water flows down"]
    out = instance_diversity_metrics(preds,
                                     train_captions=["a dog barks"])
    # per-caption unique-unigram ratios: 1.0, 0.25, 1.0 -> mean 0.75
    assert out["distinct_1"] == pytest.approx(0.75)
    # "a a a a" bigrams: {("a","a")} of 3 -> 1/3; others 1.0
    assert out["distinct_2"] == pytest.approx((1.0 + 1 / 3 + 1.0) / 3)
    assert out["novel_ratio"] == pytest.approx(2 / 3)
    assert out["vocab_size"] == 6


def test_zh_caption_eval_path(tmp_path):
    """zh corpora carry pre-tokenized `tokens` (prepare_car output);
    key2refs uses tokens and scoring skips PTB (base.py:55,320)."""
    import json
    from audiocaption_tpu.data.dataset import load_caption_json
    audios = [{"audio_id": "a",
               "captions": [{"tokens": "狗 在 叫", "cap_id": "1"},
                            {"tokens": "狗 叫 了", "cap_id": "2"}]},
              {"audio_id": "b",
               "captions": [{"tokens": "水 在 流", "cap_id": "1"}]}]
    p = tmp_path / "zh.json"
    p.write_text(json.dumps({"audios": audios}, ensure_ascii=False))
    refs = load_caption_json(str(p), zh=True)
    assert refs["a"] == ["狗 在 叫", "狗 叫 了"]
    result = evaluate_captions({"a": ["狗 在 叫"], "b": ["水 在 流"]},
                               refs, zh=True, use_java=False)
    assert result["cider"] > 0.5
    assert result["bleu_1"] == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------
# Pure-Python METEOR approximation (metrics/meteor.py) — hand-derived
# goldens with the classic parameters alpha=0.9, beta=3, gamma=0.5.
# ---------------------------------------------------------------------

def test_meteor_identical_sentence():
    from audiocaption_tpu.metrics.meteor import meteor_pair
    # m=3 exact, P=R=1, Fmean=1, 1 chunk -> penalty 0.5*(1/3)^3
    expected = 1.0 * (1 - 0.5 * (1 / 3) ** 3)
    got = meteor_pair("a dog barks".split(), "a dog barks".split())
    assert got == pytest.approx(expected)


def test_meteor_stem_stage_matches():
    from audiocaption_tpu.metrics.meteor import meteor_pair, _stem
    # guard the stemming assumptions this golden relies on
    assert _stem("cats") == _stem("cat")
    assert _stem("sat") != _stem("sits")
    # hyp "the cats sat" vs ref "the cat sits": exact {the}, stem
    # {cats~cat}; m=2 of 3/3 -> P=R=2/3, Fmean=2/3; matches (0,0),(1,1)
    # are contiguous in both -> 1 chunk, penalty 0.5*(1/2)^3 = 0.0625
    got = meteor_pair("the cats sat".split(), "the cat sits".split())
    assert got == pytest.approx((2 / 3) * (1 - 0.0625))


def test_meteor_fragmentation_penalty():
    from audiocaption_tpu.metrics.meteor import meteor_pair
    # swapped order: m=2, P=R=1, Fmean=1, but 2 chunks -> penalty
    # 0.5*(2/2)^3 = 0.5
    assert meteor_pair(["b", "a"], ["a", "b"]) == pytest.approx(0.5)


def test_meteor_one_to_one_matching():
    from audiocaption_tpu.metrics.meteor import meteor_pair
    # repeated hyp word can only consume the single ref token once:
    # m=1, P=1/2, R=1, Fmean=0.5/(0.9*0.5+0.1)=10/11, penalty 0.5
    assert meteor_pair(["the", "the"], ["the"]) == pytest.approx(
        (10 / 11) * 0.5)


def test_meteor_no_match_and_empty():
    from audiocaption_tpu.metrics.meteor import meteor_pair
    assert meteor_pair(["x"], ["y"]) == 0.0
    assert meteor_pair([], ["y"]) == 0.0
    assert meteor_pair(["x"], []) == 0.0


def test_meteor_best_of_refs_and_corpus_mean():
    from audiocaption_tpu.metrics.meteor import meteor_py, meteor_pair
    k2p = {"a": ["a dog barks"], "b": ["b a"]}
    k2r = {"a": ["water flows", "a dog barks"], "b": ["a b"]}
    avg, per_key = meteor_py(k2p, k2r)
    exp_a = meteor_pair("a dog barks".split(), "a dog barks".split())
    assert per_key["a"] == pytest.approx(exp_a)  # best ref wins
    assert per_key["b"] == pytest.approx(0.5)
    assert avg == pytest.approx((exp_a + 0.5) / 2)


def test_meteor_min_chunk_alignment_beats_greedy():
    """Banerjee-Lavie picks the maximum-cardinality alignment with the
    FEWEST chunks; the greedy first-free in-order matcher (the old
    implementation) can pick a worse pairing.  Hand case: hyp
    'x a y a' vs ref 'a x a y' — pairing the a's anti-monotone,
    (1,2),(3,0), makes (0,1),(1,2),(2,3) one contiguous run: 2 chunks
    total; greedy pairs (1,0),(3,2) giving 4 chunks."""
    from audiocaption_tpu.metrics.meteor import (
        _count_chunks, _stage_match_greedy, _stem, meteor_pair)
    hyp, ref = "x a y a".split(), "a x a y".split()
    hf, rf = [True] * 4, [True] * 4
    greedy = _stage_match_greedy(hyp, ref, hf, rf, key=lambda w: w)
    greedy += _stage_match_greedy(hyp, ref, hf, rf, key=_stem)
    assert _count_chunks(greedy) == 4          # greedy is suboptimal
    # exact: m=4, P=R=Fmean=1, 2 chunks -> penalty 0.5*(2/4)^3
    assert meteor_pair(hyp, ref) == pytest.approx(1 - 0.5 * 0.5 ** 3)


def test_meteor_exact_never_below_greedy_property():
    """Property: over random token pairs the exact alignment's score is
    always >= the greedy one's (same cardinality, <= chunks), and
    strictly greater somewhere — proving the greedy matcher was not
    computing the METEOR alignment."""
    import random

    from audiocaption_tpu.metrics.meteor import (
        _ALPHA, _BETA, _GAMMA, _count_chunks, _stage_match_greedy,
        _stem, meteor_pair)

    def greedy_score(hyp, ref):
        hf, rf = [True] * len(hyp), [True] * len(ref)
        ms = _stage_match_greedy(hyp, ref, hf, rf, key=lambda w: w)
        ms += _stage_match_greedy(hyp, ref, hf, rf, key=_stem)
        m = len(ms)
        if m == 0:
            return 0.0
        p, r = m / len(hyp), m / len(ref)
        fmean = p * r / (_ALPHA * p + (1.0 - _ALPHA) * r)
        return fmean * (1.0 - _GAMMA * (_count_chunks(ms) / m) ** _BETA)

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "cats", "cat"]
    strict = 0
    for _ in range(300):
        hyp = [rng.choice(vocab) for _ in range(rng.randint(1, 8))]
        ref = [rng.choice(vocab) for _ in range(rng.randint(1, 8))]
        ge, ex = greedy_score(hyp, ref), meteor_pair(hyp, ref)
        assert ex >= ge - 1e-12, (hyp, ref)
        if ex > ge + 1e-12:
            strict += 1
    assert strict > 0


def test_meteor_enum_budget_terminates():
    """Pathological repeated-token inputs must terminate under the
    enumeration budget and still score at least the greedy seed."""
    from audiocaption_tpu.metrics.meteor import meteor_pair
    hyp = ["a"] * 10 + ["b"]
    ref = ["b"] + ["a"] * 10
    s = meteor_pair(hyp, ref)
    assert 0.0 < s <= 1.0


def test_evaluate_captions_reports_meteor_py_without_java():
    result = evaluate_captions(
        {k: [v[0]] for k, v in PREDS.items()}, REFS, use_java=False,
        per_audio=True)
    assert "meteor_py" in result
    assert 0.0 <= result["meteor_py"] <= 1.0
    assert "meteor" not in result  # never impersonates jar METEOR
    assert any("meteor_py" in s for s in result["skipped_scorers"])
    assert all("meteor_py" in v for v in result["per_audio"].values())
