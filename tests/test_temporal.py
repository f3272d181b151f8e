"""Temporal-tag pipeline: corpus generator consistency, tag datasets,
SED trainer, and the tag-conditioned captioner (reference:
hf_wrapper.py Cnn14RnnTempAttnGruModel, tag logic :100-216, README
tag table :114-124)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from audiocaption_tpu.cli.synthetic_corpus import (
    generate_temporal, sample_temporal_segments, synth_from_segments,
    temporal_captions_for)
from audiocaption_tpu.models.sed import (
    framewise_to_temporal_tags, segments_to_temporal_tag)
from audiocaption_tpu.training.sed_trainer import (
    framewise_targets, load_sed_annotations)


def test_sampler_tags_match_reference_logic():
    """Every sampled geometry must reproduce its intended tag through
    the reference overlap logic (hf_wrapper.py:191-203)."""
    rng = np.random.RandomState(123)
    seen = set()
    for _ in range(300):
        segments, tag = sample_temporal_segments(rng, 10.0)
        assert segments_to_temporal_tag(segments) == tag
        seen.add(tag)
    assert seen == {0, 1, 2, 3}


def test_framewise_targets_recover_tags():
    """Binary framewise targets run through the full inference tag
    pipeline (double_threshold -> regions -> tag) recover the
    ground-truth tag: generator and tag logic are consistent at 10 ms
    resolution."""
    rng = np.random.RandomState(7)
    for _ in range(50):
        segments, tag = sample_temporal_segments(rng, 10.0)
        y = framewise_targets(
            [[c, on, off] for c, on, off in segments], 1001, 8)
        tags = framewise_to_temporal_tags(y[None].astype(np.float32))
        assert tags[0] == tag, (segments, tag, tags[0])


def test_temporal_captions_grammar():
    rng = np.random.RandomState(3)
    for _ in range(40):
        segments, tag = sample_temporal_segments(rng, 10.0)
        caps = temporal_captions_for(rng, segments, tag)
        assert len(caps) == 5 and len(set(caps)) == 5
        if tag == 2:
            joined = " ".join(caps)
            assert ("then" in joined or "followed" in joined
                    or "after" in joined or "before" in joined)
        if tag == 1:
            joined = " ".join(caps)
            assert ("while" in joined or "same time" in joined
                    or "joins" in joined or "together" in joined
                    or "along" in joined)
        for c in caps:
            assert len(c.split()) <= 18  # fits max_length 20 w/ bos/eos


@pytest.fixture(scope="module")
def temporal_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("temporal")
    paths = generate_temporal(str(root), n_train=6, n_val=3, n_test=3,
                              sr=8000, duration=10.0, seed=0)
    return root, paths


def test_generate_temporal_artifacts(temporal_corpus):
    root, paths = temporal_corpus
    ann = load_sed_annotations(paths["train"]["sed"])
    assert len(ann) == 6
    tags_csv = dict(
        line.split("\t") for line in
        Path(paths["train"]["tag"]).read_text().strip().split("\n")[1:])
    for a in ann:
        assert int(tags_csv[a["audio_id"]]) == a["tag"]
        assert segments_to_temporal_tag(
            [tuple(s) for s in a["segments"]]) == a["tag"]


def test_temporal_dataset_and_collate(temporal_corpus):
    from audiocaption_tpu.data import DictTokenizer, TextCollate
    from audiocaption_tpu.data.condition_dataset import (
        TemporalTagCaptionDataset)
    root, paths = temporal_corpus
    tok = DictTokenizer(tokenizer_path=str(root / "vocab.pkl"))
    ds = TemporalTagCaptionDataset(
        features={"wav": paths["train"]["wav_csv"]},
        caption=paths["train"]["text"],
        temporal_tag=paths["train"]["tag"],
        orig_sr=8000, target_sr=8000)
    items = [ds[i] for i in range(4)]
    assert all("temporal_tag" in it for it in items)
    collate = TextCollate(tok, pad_keys=["wav", "cap"])
    batch = collate(items)
    assert batch["temporal_tag"].shape == (4,)
    assert batch["temporal_tag"].dtype == np.int32


def test_build_dataset_node(temporal_corpus):
    from audiocaption_tpu.cli.run import build_dataset
    root, paths = temporal_corpus
    node = {"type": "audiocaption_tpu.data.condition_dataset."
                    "TemporalTagInferenceDataset",
            "args": {"features": {"wav": paths["val"]["wav_csv"]},
                     "temporal_tag": paths["val"]["tag"],
                     "orig_sr": 8000, "target_sr": 8000}}
    ds = build_dataset(node)
    assert "temporal_tag" in ds[0]


def test_sed_train_step_learns():
    """BCE falls on a tiny separable problem (class = mel band)."""
    import optax
    from audiocaption_tpu.models.sed import Cnn8RnnSedModel
    from audiocaption_tpu.training.sed_trainer import make_sed_train_step
    rng = np.random.RandomState(0)
    n, t, c = 16, 64, 3
    lms = np.full((n, t, 64), -20.0, np.float32)
    y = np.zeros((n, t, c), np.int8)
    for i in range(n):
        cls = i % c
        s, e = 8 * cls + 4, 8 * cls + 28
        lms[i, s:e, 20 * cls:20 * cls + 12] = 15.0
        y[i, s:e, cls] = 1
    model = Cnn8RnnSedModel(classes_num=c)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, t, 64)))
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    step = make_sed_train_step(model, tx)
    bank = jnp.asarray(lms, jnp.float16)
    targets = jnp.asarray(y)
    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(8):
        key, sub = jax.random.split(key)
        idx = jnp.asarray(rng.permutation(n)[:8])
        opt_state, variables, loss = step(opt_state, variables, bank,
                                          targets, idx, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_temporal_decoder_conditioning_changes_logits():
    """The tag embedding must actually condition the decoder: training
    logits differ between tags for the same audio/caption."""
    from audiocaption_tpu.utils.config import build_model_from_config
    node = {
        "type": "captioning.models.TemporalSeq2SeqAttnModel",
        "args": {},
        "encoder": {
            "type": "captioning.models.crnn_trm_encoder.Cdur5Encoder",
            "args": {"sample_rate": 16000}},
        "decoder": {
            "type": "captioning.models.rnn_decoder.TemporalBahAttnDecoder",
            "args": {"emb_dim": 32, "fc_emb_dim": 32, "attn_emb_dim": 32,
                     "d_model": 32, "dropout": 0.0}},
    }
    model, _ = build_model_from_config(node, vocab_size=20)
    wav = jnp.asarray(np.random.RandomState(0)
                      .randn(2, 16000).astype(np.float32))
    wav_len = jnp.asarray([16000, 16000])
    cap = jnp.asarray([[1, 5, 6, 2], [1, 7, 8, 2]], jnp.int32)
    cap_len = jnp.asarray([4, 4])
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "sample": jax.random.PRNGKey(1)},
        wav, wav_len, cap, cap_len, train=False,
        temporal_tag=jnp.zeros((2,), jnp.int32))
    out0 = model.apply(variables, wav, wav_len, cap, cap_len,
                       train=False, rngs={"sample": jax.random.PRNGKey(9)},
                       temporal_tag=jnp.asarray([0, 0], jnp.int32))
    out1 = model.apply(variables, wav, wav_len, cap, cap_len,
                       train=False, rngs={"sample": jax.random.PRNGKey(9)},
                       temporal_tag=jnp.asarray([2, 1], jnp.int32))
    assert not np.allclose(np.asarray(out0["logit"]),
                           np.asarray(out1["logit"]))
    # t=0 uses the tag embedding, so even the FIRST step must differ
    assert not np.allclose(np.asarray(out0["logit"][:, 0]),
                           np.asarray(out1["logit"][:, 0]))


@pytest.mark.slow
def test_train_sed_and_predict_temporal_cli(tmp_path):
    """E2E: generate_temporal -> train_sed -> train (tag captioner) ->
    predict_temporal (SED tags) writes predictions + tag accuracy."""
    from audiocaption_tpu.cli.run import Runner
    root = tmp_path
    paths = generate_temporal(str(root / "corp"), n_train=6, n_val=3,
                              n_test=3, sr=32000, duration=10.0, seed=0)
    sed_cfg = {
        "experiment_path": str(root / "sed_exp"),
        "seed": 1,
        "data": {"train": {"h5": paths["train"]["h5"],
                           "sed": paths["train"]["sed"]},
                 "val": {"h5": paths["val"]["h5"],
                         "sed": paths["val"]["sed"]}},
        "model": {"type": "captioning.models.panns.Cnn8rnnSedModel",
                  "args": {"classes_num": 8}},
        "optimizer": {"args": {"lr": 1e-3}},
        "trainer": {"epochs": 1, "batch_size": 3},
    }
    with open(root / "sed.yaml", "w") as f:
        yaml.safe_dump(sed_cfg, f)
    sed_exp = Runner().train_sed(str(root / "sed.yaml"))
    assert (Path(sed_exp) / "best.pth").exists()

    def data_node(split):
        return {
            "dataset": {
                "type": "audiocaption_tpu.data.condition_dataset."
                        "TemporalTagCaptionDataset",
                "args": {"features": {"wav": paths[split]["wav_csv"]},
                         "caption": paths[split]["text"],
                         "temporal_tag": paths[split]["tag"],
                         "orig_sr": 32000, "target_sr": 32000}},
            "collate_fn": {
                "type": "captioning.datasets.collate_func.TextCollate",
                "args": {"pad_keys": ["wav", "cap"]},
                "tokenizer": {
                    "type": "captioning.datasets.text_tokenizer."
                            "DictTokenizer",
                    "args": {"tokenizer_path":
                             paths["vocab"]["vocab"],
                             "max_length": 20}}},
            "dataloader_args": {"batch_size": 3, "num_workers": 0},
        }

    cap_cfg = {
        "experiment_path": str(root / "cap_exp"),
        "seed": 1,
        "model": {
            "type": "captioning.models.TemporalSeq2SeqAttnModel",
            "args": {},
            "encoder": {
                "type": "captioning.models.crnn_trm_encoder.Cdur5Encoder",
                "args": {"sample_rate": 32000}},
            "decoder": {
                "type": "captioning.models.rnn_decoder."
                        "TemporalBahAttnDecoder",
                "args": {"emb_dim": 32, "fc_emb_dim": 32,
                         "attn_emb_dim": 32, "d_model": 32,
                         "dropout": 0.2}},
        },
        "data": {
            "train": data_node("train"),
            "val": {
                "dataset": {
                    "type": "audiocaption_tpu.data.condition_dataset."
                            "TemporalTagInferenceDataset",
                    "args": {"features": {"wav": paths["val"]["wav_csv"]},
                             "temporal_tag": paths["val"]["tag"],
                             "orig_sr": 32000, "target_sr": 32000}},
                "collate_fn": {
                    "type":
                        "captioning.datasets.collate_func.VarLenPadCollate",
                    "args": {"pad_keys": ["wav"]}},
                "caption": paths["val"]["text"],
                "dataloader_args": {"batch_size": 3, "num_workers": 0}},
        },
        "optimizer": {"args": {"lr": 1e-3}},
        "lr_scheduler": {
            "type":
                "captioning.utils.lr_scheduler.ExponentialDecayScheduler",
            "args": {"final_lrs": 1e-5}},
        "loss": {"type": "captioning.losses.loss.LabelSmoothingLoss",
                 "args": {"smoothing": 0.1}},
        "trainer": {"epochs": 1, "max_grad_norm": 1.0},
        "scheduled_sampling": {"use": False},
        "swa": {"use": False},
        "inference_args": {"sample_method": "greedy"},
    }
    with open(root / "cap.yaml", "w") as f:
        yaml.safe_dump(cap_cfg, f)
    cap_exp = Runner().train(str(root / "cap.yaml"))

    eval_cfg = {
        "data": {"test": {
            "dataset": {
                "type": "audiocaption_tpu.data.condition_dataset."
                        "TemporalTagInferenceDataset",
                "args": {"features": {"wav": paths["test"]["wav_csv"]},
                         "temporal_tag": paths["test"]["tag"],
                         "orig_sr": 32000, "target_sr": 32000}},
            "collate_fn": {
                "type":
                    "captioning.datasets.collate_func.VarLenPadCollate",
                "args": {"pad_keys": ["wav"]}},
            "caption": paths["test"]["text"],
            "dataloader_args": {"batch_size": 3, "num_workers": 0}}},
        "inference_args": {"sample_method": "greedy", "max_length": 8},
        "resume": "best.pth",
    }
    with open(root / "eval.yaml", "w") as f:
        yaml.safe_dump(eval_cfg, f)
    key2pred = Runner().predict_temporal(cap_exp, sed_exp,
                                         str(root / "eval.yaml"))
    assert len(key2pred) == 3
    acc_file = Path(cap_exp) / "results/sed_tag_accuracy.txt"
    assert acc_file.exists()
    assert "sed_tag_accuracy" in acc_file.read_text()
