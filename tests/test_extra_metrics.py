"""Specificity + CLAP offline scorers (metrics/extra.py) and their
eval_tools CLI subcommands (reference python_scripts/eval/
specificity.py, clap_score.py)."""

import json

import numpy as np
import pytest

from audiocaption_tpu.metrics.extra import (
    build_word_specificity, clap_text_similarity, load_word_specificity,
    specificity_score)



def test_specificity_score_sum_then_mean():
    table = {"a": 0.5, "dog": 2.0, "barks": 3.0}
    # caption 1: 0.5+2.0+3.0 = 5.5 ; caption 2: 0.5 + 0 (OOV) = 0.5
    got = specificity_score(["a dog barks", "a zebra"], table)
    assert got == pytest.approx((5.5 + 0.5) / 2)
    assert specificity_score([], table) == 0.0


def test_build_and_load_word_specificity_roundtrip(tmp_path):
    corpus = ["a dog", "a cat"]
    table = build_word_specificity(corpus)
    # "a" appears 2/4 -> -log(0.5); dog/cat 1/4 -> -log(0.25)
    assert table["a"] == pytest.approx(-np.log(0.5))
    assert table["dog"] == pytest.approx(-np.log(0.25))
    p = tmp_path / "word.tsv"
    with open(p, "w") as f:
        f.write("word\tspecificity\n")
        for w, s in table.items():
            f.write(f"{w}\t{s}\n")
    assert load_word_specificity(str(p)) == pytest.approx(table)


class _FakeTok:
    def __call__(self, texts, padding=True, return_tensors="pt"):
        return {"texts": list(texts)}


class _FakeClap:
    """Deterministic 'text tower': embedding = [len(words), ord sum]."""

    def eval(self):
        return self

    def get_text_features(self, texts):
        import torch
        rows = [[float(len(t.split())), float(sum(map(ord, t)) % 97)]
                for t in texts]
        return torch.tensor(rows)


def test_clap_text_similarity_mean_over_refs():
    import torch
    preds = {"k1": ["a dog barks"], "k2": ["water"]}
    refs = {"k1": ["a dog", "dogs bark loudly"], "k2": ["water flows"]}
    avg, per_key = clap_text_similarity(preds, refs, model=_FakeClap(),
                                        tokenizer=_FakeTok())
    fake = _FakeClap()
    for k in preds:
        emb = fake.get_text_features(preds[k][:1] + refs[k])
        want = float((emb[0:1] @ emb[1:].T).mean())
        assert per_key[k] == pytest.approx(want)
    assert avg == pytest.approx(np.mean(list(per_key.values())))
    del torch


def test_clap_returns_none_without_weights(monkeypatch):
    import audiocaption_tpu.metrics.extra as X

    def boom(name):
        raise OSError("no network")

    monkeypatch.setattr(X, "_load_clap", boom)
    assert clap_text_similarity({"k": ["a"]}, {"k": ["a"]}) is None


# ---------------------------------------------------------------------
# CLI subcommands
# ---------------------------------------------------------------------

def _write_preds(tmp_path):
    p = tmp_path / "preds.json"
    json.dump({"predictions": [
        {"filename": "k1", "caption": "a dog barks"},
        {"filename": "k2", "caption": "water flows"},
    ]}, open(p, "w"))
    return p


def _write_caption_json(tmp_path):
    p = tmp_path / "text.json"
    json.dump({"audios": [
        {"audio_id": "k1", "captions": [
            {"caption": "a dog barks", "cap_id": "1"},
            {"caption": "dogs bark", "cap_id": "2"}]},
        {"audio_id": "k2", "captions": [
            {"caption": "water flows", "cap_id": "1"}]},
    ]}, open(p, "w"))
    return p


def test_eval_tools_specificity_cli(tmp_path, capsys):
    from audiocaption_tpu.cli.eval_tools import main
    preds = _write_preds(tmp_path)
    tsv = tmp_path / "word.tsv"
    tsv.write_text("word\tspecificity\n"
                   "a\t0.5\ndog\t2.0\nbarks\t3.0\n"
                   "water\t1.0\nflows\t4.0\n")
    main(["specificity", "--predictions", str(preds),
          "--word_specificity", str(tsv)])
    out = capsys.readouterr().out
    # caption1 = 5.5, caption2 = 5.0 -> mean 5.25
    assert "specificity: 5.2500" in out


def test_eval_tools_clap_cli_skip_and_score(tmp_path, capsys,
                                            monkeypatch):
    import audiocaption_tpu.metrics.extra as X
    from audiocaption_tpu.cli.eval_tools import main
    preds = _write_preds(tmp_path)
    refs = _write_caption_json(tmp_path)

    # weights unavailable -> loud skip, no fake number
    def boom(name):
        raise OSError("no network")

    monkeypatch.setattr(X, "_load_clap", boom)
    main(["clap", "--predictions", str(preds), "--caption", str(refs)])
    assert "SKIPPED" in capsys.readouterr().out

    # injectable model -> numeric score
    monkeypatch.setattr(X, "_load_clap",
                        lambda name: (_FakeClap(), _FakeTok()))
    main(["clap", "--predictions", str(preds), "--caption", str(refs)])
    out = capsys.readouterr().out
    assert out.startswith("clap: ")
    float(out.split(":")[1])
