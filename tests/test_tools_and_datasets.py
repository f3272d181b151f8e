"""Tests: metric tools, condition/keyword datasets, aug runner,
profiling helpers."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiocaption_tpu.data.condition_dataset import (
    ConditionCaptionDataset, KeywordProbInferenceDataset,
    RandomConditionDataset, binarize_keyword)
from audiocaption_tpu.metrics.tools import (
    aggregate_seed_results, round_robin_scores)
from audiocaption_tpu.training.aug_runner import (
    discount_schedule, interleave_loaders)
from audiocaption_tpu.utils.profiling import StepTimer, flops_estimate


REFS = {
    "a": ["a dog barks loudly", "a dog is barking", "dogs bark outside"],
    "b": ["water flows down", "a stream of water flows",
          "water runs quickly"],
}


def test_round_robin_scores():
    scores = round_robin_scores(REFS)
    assert "cider" in scores and "bleu_4" in scores
    assert scores["bleu_1"] > 0


def test_aggregate_seed_results(tmp_path):
    for seed, val in [(1, 0.4), (2, 0.5)]:
        d = tmp_path / f"seed_{seed}" / "results"
        d.mkdir(parents=True)
        (d / "scores.txt").write_text(f"cider: {val}\nbleu_4: 0.2\n")
    agg = aggregate_seed_results(str(tmp_path))
    np.testing.assert_allclose(agg["cider"][0], 0.45)
    np.testing.assert_allclose(agg["cider"][1], 0.05)


def test_binarize_keyword():
    kw = np.asarray([0.1, 0.9, 0.5, 0.3])
    np.testing.assert_array_equal(binarize_keyword(kw, 0.4), [0, 1, 1, 0])
    np.testing.assert_array_equal(binarize_keyword(kw, "top2"),
                                  [0, 1, 1, 0])
    out = binarize_keyword(kw, "0.2_top1")
    np.testing.assert_array_equal(out, [0, 1, 0, 0])
    assert binarize_keyword(kw, None) is kw


@pytest.fixture
def cond_workspace(tmp_path):
    import h5py
    h5p = tmp_path / "wave.h5"
    with h5py.File(h5p, "w") as f:
        f["aud1"] = np.zeros(100, np.float32)
    (tmp_path / "wav.csv").write_text(
        f"audio_id\thdf5_path\naud1\t{h5p}\n")
    (tmp_path / "text.json").write_text(json.dumps({"audios": [
        {"audio_id": "aud1", "captions": [
            {"tokens": "a dog", "cap_id": "1"}]}]}))
    (tmp_path / "cond.csv").write_text(
        "cap_id\tprob\naud1_1\t0.75\n")
    kwh5 = tmp_path / "kw.h5"
    with h5py.File(kwh5, "w") as f:
        f["aud1"] = np.asarray([0.9, 0.1, 0.5], np.float32)
    (tmp_path / "kw.csv").write_text(
        f"audio_id\thdf5_path\naud1\t{kwh5}\n")
    return tmp_path


def test_condition_caption_dataset(cond_workspace):
    ds = ConditionCaptionDataset(
        {"wav": str(cond_workspace / "wav.csv")},
        caption=str(cond_workspace / "text.json"),
        condition=str(cond_workspace / "cond.csv"))
    item = ds[0]
    np.testing.assert_allclose(item["condition"], 0.75)


def test_random_condition_dataset(cond_workspace):
    ds = RandomConditionDataset(
        {"wav": str(cond_workspace / "wav.csv")},
        condition=str(cond_workspace / "cond.csv"))
    assert 0.0 <= float(ds[0]["condition"]) <= 1.0


def test_keyword_dataset(cond_workspace):
    ds = KeywordProbInferenceDataset(
        {"wav": str(cond_workspace / "wav.csv")},
        keyword_prob=str(cond_workspace / "kw.csv"), threshold=0.4)
    np.testing.assert_array_equal(ds[0]["keyword"], [1, 0, 1])


def test_discount_schedule():
    const = discount_schedule("constant", 0.5, 100)
    assert const(0) == const(99) == 0.5
    lin = discount_schedule("linear", 1.0, 100)
    assert lin(0) == 1.0 and lin(50) == 0.5 and lin(100) == 0.0


def test_interleave_loaders():
    pairs = list(interleave_loaders([1, 2, 3, 4], ["a", "b"]))
    assert pairs == [(1, "a"), (2, "b"), (3, "a"), (4, "b")]


def test_step_timer():
    t = StepTimer()
    t.start()
    m = t.stop(items=10)
    assert m["items_per_sec"] > 0
    assert m["step_time_ema_s"] == m["step_time_s"]


def test_flops_estimate():
    out = flops_estimate(lambda x: x @ x, jnp.ones((64, 64)))
    assert out["flops"] >= 2 * 64 ** 3 * 0.9


def test_prepare_clotho_text_artifacts(tmp_path):
    import csv as _csv
    cap_csv = tmp_path / "caps.csv"
    with open(cap_csv, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["file_name"] +
                            [f"caption_{i}" for i in range(1, 6)])
        w.writeheader()
        w.writerow({"file_name": "x.wav",
                    "caption_1": "A dog barks.",
                    "caption_2": "Dogs are barking",
                    "caption_3": "", "caption_4": "", "caption_5": ""})
    from audiocaption_tpu.cli.prepare_dataset import prepare_clotho
    prepare_clotho(str(tmp_path), str(cap_csv), str(tmp_path / "out"),
                   pack=False)
    data = json.loads((tmp_path / "out" / "text.json").read_text())
    assert len(data["audios"]) == 1
    caps = data["audios"][0]["captions"]
    assert len(caps) == 2
    assert caps[0]["tokens"] == "a dog barks"
    assert (tmp_path / "out" / "vocab.pkl").exists()


def test_prepare_audiocaps_text_artifacts(tmp_path):
    import csv as _csv
    cap_csv = tmp_path / "caps.csv"
    with open(cap_csv, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["audiocap_id", "youtube_id",
                                           "start_time", "caption"])
        w.writeheader()
        w.writerow({"audiocap_id": "1", "youtube_id": "abc",
                    "start_time": "0", "caption": "Water flows."})
        w.writerow({"audiocap_id": "2", "youtube_id": "abc",
                    "start_time": "0", "caption": "A stream runs"})
    from audiocaption_tpu.cli.prepare_dataset import prepare_audiocaps
    prepare_audiocaps(str(tmp_path), str(cap_csv), str(tmp_path / "out"),
                      pack=False)
    data = json.loads((tmp_path / "out" / "text.json").read_text())
    assert data["audios"][0]["audio_id"] == "Yabc"
    assert len(data["audios"][0]["captions"]) == 2
