"""The Java-present branch of metrics/eval.py, covered WITHOUT Java:
pycocoevalcap modules are mocked into sys.modules so the test pins

  * the PTB-tokenizer preference (base.py:101-110 — when pycocoevalcap
    imports, ITS tokenizer is used, not the regex substitute, and
    "ptb_tokenizer" never appears in skipped_scorers),
  * METEOR/SPICE dispatch + the SPIDEr arithmetic
    spider = (cider + spice) / 2 (base.py:111-127),
  * the skipped_scorers contract both ways (a raising Meteor degrades
    to the skipped entry without killing the BLEU/ROUGE/CIDEr result).
"""

import sys
import types

import pytest

PREDS = {
    "a1": ["a dog barks loudly"],
    "a2": ["rain falls on a roof"],
}
REFS = {
    "a1": ["a dog barks loudly", "a dog is barking"],
    "a2": ["rain falls on a roof", "rain hitting a rooftop"],
}


class _RecordingPTB:
    """Mimics pycocoevalcap.tokenizer.ptbtokenizer.PTBTokenizer: takes
    {key: [{"caption": str}]}, returns {key: [str]} — recognizably
    transformed so the test can prove THIS tokenizer ran."""

    calls = 0

    def tokenize(self, d):
        _RecordingPTB.calls += 1
        return {k: [c["caption"].upper() for c in v] for k, v in d.items()}


def _scorer_module(name, cls_name, score):
    mod = types.ModuleType(name)

    class Scorer:
        def compute_score(self, refs, preds):
            # the branch must pass the TOKENIZED captions through (the
            # recording tokenizer uppercases them)
            assert all(cap == cap.upper()
                       for v in preds.values() for cap in v)
            Scorer.seen = (refs, preds)
            return score, [score] * len(preds)

    Scorer.__name__ = cls_name
    setattr(mod, cls_name, Scorer)
    return mod, Scorer


@pytest.fixture()
def mocked_pycoco(monkeypatch):
    _RecordingPTB.calls = 0
    pkg = types.ModuleType("pycocoevalcap")
    tok_pkg = types.ModuleType("pycocoevalcap.tokenizer")
    tok_mod = types.ModuleType("pycocoevalcap.tokenizer.ptbtokenizer")
    tok_mod.PTBTokenizer = _RecordingPTB
    meteor_pkg = types.ModuleType("pycocoevalcap.meteor")
    meteor_mod, Meteor = _scorer_module(
        "pycocoevalcap.meteor.meteor", "Meteor", 0.25)
    spice_pkg = types.ModuleType("pycocoevalcap.spice")
    spice_mod, Spice = _scorer_module(
        "pycocoevalcap.spice.spice", "Spice", 0.15)
    mods = {
        "pycocoevalcap": pkg,
        "pycocoevalcap.tokenizer": tok_pkg,
        "pycocoevalcap.tokenizer.ptbtokenizer": tok_mod,
        "pycocoevalcap.meteor": meteor_pkg,
        "pycocoevalcap.meteor.meteor": meteor_mod,
        "pycocoevalcap.spice": spice_pkg,
        "pycocoevalcap.spice.spice": spice_mod,
    }
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    yield {"Meteor": Meteor, "Spice": Spice, "meteor_mod": meteor_mod}


def test_java_branch_tokenizer_preference_and_spider(mocked_pycoco,
                                                     monkeypatch):
    import audiocaption_tpu.metrics.eval as ev
    # java "present": use_java=None must auto-select the branch
    monkeypatch.setattr(ev.shutil, "which", lambda name: "/usr/bin/java")
    result = ev.evaluate_captions(dict(PREDS), dict(REFS), use_java=None)

    # the mocked PTB tokenizer ran (preds + refs = 2 calls), and the
    # regex substitute was NOT flagged
    assert _RecordingPTB.calls == 2
    assert not any("ptb_tokenizer" in s
                   for s in result.get("skipped_scorers", []))
    assert not any("meteor" in s
                   for s in result.get("skipped_scorers", []))

    assert result["meteor"] == 0.25
    assert result["spice"] == 0.15
    assert result["spider"] == pytest.approx(
        (result["cider"] + 0.15) / 2)
    # core scorers still computed, over the tokenized captions
    assert 0.0 <= result["bleu_4"] <= 1.0
    assert "cider" in result and "rouge_l" in result


def test_java_branch_meteor_failure_degrades_to_skipped(mocked_pycoco):
    import audiocaption_tpu.metrics.eval as ev

    class Boom(Exception):
        pass

    def explode(self):
        raise Boom("jvm fell over")

    mocked_pycoco["meteor_mod"].Meteor.__init__ = explode
    result = ev.evaluate_captions(dict(PREDS), dict(REFS), use_java=True)
    assert "meteor" not in result and "spider" not in result
    assert any(s.startswith("meteor/spice/spider")
               for s in result["skipped_scorers"])
    # the failure must not take down the core metrics
    assert "cider" in result and "bleu_4" in result


def test_no_java_branch_flags_everything():
    """use_java=False: regex tokenizer flagged AND meteor/spice/spider
    flagged — the contract the offline environment relies on."""
    import audiocaption_tpu.metrics.eval as ev
    result = ev.evaluate_captions(dict(PREDS), dict(REFS), use_java=False)
    flags = result["skipped_scorers"]
    assert any("ptb_tokenizer" in s for s in flags)
    assert any("meteor/spice/spider" in s for s in flags)
    assert "spider" not in result
