"""Shipped config recipes (configs/): every YAML must load through the
config system and build its model; the synthetic recipes must run the
real CLI end-to-end against a generated corpus (reference anchor:
eg_configs/clotho_v2/waveform/cnn14rnn_trm.yaml + run.py train)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from audiocaption_tpu.utils.config import build_model_from_config, load_config

REPO = Path(__file__).resolve().parents[1]
CONFIGS = REPO / "configs"

TRAIN_CONFIGS = [
    "clotho_v2/cnn14rnn_trm.yaml",
    "clotho_v2/effb2_trm.yaml",
    "audiocaps/cnn14rnn_trm.yaml",
    "audiocaps/effb2_trm.yaml",
    "synthetic/cnn14rnn_trm.yaml",
    "synthetic/effb2_trm.yaml",
    "synthetic/kd_token.yaml",
]


@pytest.mark.parametrize("rel", TRAIN_CONFIGS)
def test_config_loads_and_builds_model(rel):
    cfg = load_config(str(CONFIGS / rel))
    assert cfg["data"]["train"]["dataset"]["args"]["caption"]
    model_cfg = dict(cfg["model"])
    # synthetic corpora inject vocab_size from the tokenizer at runtime;
    # give the builder one here
    model_cfg["decoder"] = dict(model_cfg["decoder"])
    model_cfg["decoder"]["args"] = dict(
        model_cfg["decoder"]["args"], vocab_size=model_cfg["decoder"]
        ["args"].get("vocab_size", 57))
    model, pretrained = build_model_from_config(model_cfg)
    assert model.decoder.vocab_size > 0
    # reference pretrained hooks survive the port (clotho/audiocaps
    # recipes name the PANNs checkpoint)
    if "pretrained" in str(cfg["model"]):
        assert pretrained


def test_scst_config_loads():
    cfg = load_config(str(CONFIGS / "synthetic/scst.yaml"))
    assert cfg["model"]["type"].endswith("ScstWrapper")
    inner = dict(cfg["model"]["model"])
    inner["decoder"] = dict(inner["decoder"])
    inner["decoder"]["args"] = dict(inner["decoder"]["args"],
                                    vocab_size=57)
    model, _ = build_model_from_config(inner)
    assert model.decoder.vocab_size == 57


def test_aug_config_inherits_train_aug():
    cfg = load_config(str(CONFIGS / "synthetic/aug.yaml"))
    assert "train_aug" in cfg["data"]
    assert cfg["aug"]["discount"] == 0.5
    # inherit_from chain: aug.yaml -> cnn14rnn_trm.yaml -> train_data
    assert cfg["model"]["encoder"]["type"].endswith("Cnn14RnnEncoder")
    assert cfg["data"]["train"]["dataset"]["args"]["caption"]


def test_test_configs_load():
    for rel in ("clotho_v2/test.yaml", "audiocaps/test.yaml",
                "synthetic/test.yaml"):
        cfg = load_config(str(CONFIGS / rel))
        assert cfg["inference_args"]["sample_method"] == "beam"
        assert cfg["inference_args"]["beam_size"] == 3
        assert cfg["resume"] == "swa.pth"


@pytest.mark.slow
def test_synthetic_recipe_e2e(tmp_path, monkeypatch):
    """The shipped synthetic recipe runs the real CLI end-to-end: corpus
    generation -> train (reference recipe, tiny overrides) -> evaluate
    with the shipped test.yaml."""
    from audiocaption_tpu.cli.run import Runner
    from audiocaption_tpu.cli.synthetic_corpus import generate

    monkeypatch.chdir(tmp_path)
    generate("data/synthetic", n_train=4, n_val=2, n_test=2, sr=32000,
             duration=2.0)
    overrides = [
        "trainer.epochs=2",
        "data.train.dataloader_args.batch_size=2",
        "data.val.dataloader_args.batch_size=2",
        "swa.start=1",
        "inference_args.max_length=12",
    ]
    exp_dir = Runner().train(
        str(CONFIGS / "synthetic/cnn14rnn_trm.yaml"), *overrides)
    exp = Path(exp_dir)
    assert (exp / "swa.pth").exists()
    scores = Runner().evaluate(
        str(exp), str(CONFIGS / "synthetic/test.yaml"),
        "data.test.dataloader_args.batch_size=2",
        "inference_args.max_length=12")
    assert "cider" in {k.lower() for k in scores}
    pred = json.loads((exp / "predictions/swa_beam3.json").read_text())
    assert pred
