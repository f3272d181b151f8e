"""spice_py: lexicon-based SPICE approximation (proposition F1).

Reference anchor: train_eval/base.py:111-127 (jar SPICE; SPIDEr =
(CIDEr+SPICE)/2).  spice_py is reported under its own key only."""

import pytest

from audiocaption_tpu.metrics.spice import (propositions, spice_pair_f1,
                                            spice_py)



def P(s):
    return propositions(s.split())


def test_object_and_attribute_tuples():
    props = P("a low tone is heard")
    assert ("tone",) in props
    assert ("low", "tone") in props


def test_sequence_relation_mention_order():
    # (X, "after", Y) == X first, then Y
    assert ("tone", "after", "whistl") in P(
        "a low tone is followed by a high whistle")
    assert ("tone", "after", "whistl") in P(
        "first a low tone then a high whistle")


def test_comes_after_inverts_and_before_keeps_order():
    # "Y comes after X": X is first
    assert ("tone", "after", "whistl") in P(
        "a high whistle comes after a low tone")
    # "X before Y": X is first
    assert ("tone", "after", "whistl") in P(
        "a low tone sounds before a high whistle")


def test_all_four_phrasings_agree():
    variants = [
        "a low tone is followed by a high whistle",
        "a low tone and then a high whistle",
        "a high whistle comes after a low tone",
        "a low tone sounds before a high whistle",
        "after a low tone a high whistle is heard",
    ]
    rels = [frozenset(t for t in P(v) if len(t) == 3) for v in variants]
    assert all(r == rels[0] for r in rels), rels
    assert rels[0] == {("tone", "after", "whistl")}


def test_simultaneous_relation():
    assert ("tone", "while", "whistl") in P(
        "a low tone while a high whistle sounds")
    assert ("tone", "while", "whistl") in P(
        "a low tone and a high whistle at the same time")


def test_f1_scoring_and_corpus():
    perfect = spice_pair_f1(P("a low tone is heard"),
                            P("the sound of a low tone"))
    assert perfect == pytest.approx(1.0)
    none = spice_pair_f1(P("a low tone is heard"),
                         P("quick beeps are heard"))
    assert none == 0.0

    preds = {"k1": ["a low tone is heard"],
             "k2": ["quick beeps and then static noise"]}
    refs = {"k1": ["the sound of a low tone", "a low tone sounds"],
            "k2": ["quick beeps are followed by static noise"]}
    avg, per_key = spice_py(preds, refs)
    assert per_key["k1"] == pytest.approx(1.0)
    assert per_key["k2"] == pytest.approx(1.0)
    assert avg == pytest.approx(1.0)

    # partial credit: right objects, wrong relation direction
    preds2 = {"k2": ["static noise and then quick beeps"]}
    refs2 = {"k2": ["quick beeps are followed by static noise"]}
    _, pk = spice_py(preds2, refs2)
    assert 0.0 < pk["k2"] < 1.0


def test_evaluate_captions_reports_spice_py_without_java():
    from audiocaption_tpu.metrics import evaluate_captions
    preds = {"k1": ["a low tone is heard"]}
    refs = {"k1": ["the sound of a low tone"]}
    result = evaluate_captions(preds, refs, use_java=False,
                               per_audio=True)
    assert 0.0 <= result["spice_py"] <= 1.0
    assert result["spider_py"] == pytest.approx(
        (result["cider"] + result["spice_py"]) / 2)
    assert "spice" not in result and "spider" not in result
    assert "spice_py" in result["per_audio"]["k1"]
