"""End-to-end CLI test: synthetic HDF5 dataset + YAML config (reference
layout with dotted type names) -> debug step, short train run, predict,
evaluate."""

import json
import pickle

import numpy as np
import pytest

from audiocaption_tpu.cli.run import Runner
from audiocaption_tpu.data import DictTokenizer


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("ws")
    rng = np.random.RandomState(0)
    sr = 16000
    n_audio = 4
    h5p = root / "waveform.h5"
    with h5py.File(h5p, "w") as f:
        for i in range(n_audio):
            f[f"aud{i}"] = rng.randn(sr).astype(np.float32)
    with open(root / "wav.csv", "w") as f:
        f.write("audio_id\thdf5_path\n")
        for i in range(n_audio):
            f.write(f"aud{i}\t{h5p}\n")
    caps = ["a dog barks loudly", "water flows down", "someone speaks",
            "music plays softly"]
    data = {"audios": [
        {"audio_id": f"aud{i}", "captions": [
            {"tokens": caps[i], "caption": caps[i].capitalize() + ".",
             "cap_id": "1"}]}
        for i in range(n_audio)]}
    with open(root / "text.json", "w") as f:
        json.dump(data, f)
    tok = DictTokenizer()
    for c in caps:
        for w in c.split():
            tok.add_word(w)
    with open(root / "vocab.pkl", "wb") as f:
        pickle.dump(tok.state_dict(), f)

    cfg = {
        "experiment_path": str(root / "exp"),
        "seed": 1,
        "model": {
            "type": "captioning.models.transformer_model.TransformerModel",
            "args": {},
            "encoder": {
                "type": "captioning.models.cnn_encoder.EfficientNetB2",
                "args": {},
            },
            "decoder": {
                "type":
                    "captioning.models.transformer_decoder.TransformerDecoder",
                "args": {"emb_dim": 128, "nlayers": 1, "dropout": 0.2,
                         "attn_emb_dim": 1408, "fc_emb_dim": 1408},
            },
        },
        "data": {
            "train": {
                "dataset": {
                    "type":
                        "captioning.datasets.caption_dataset.CaptionDataset",
                    "args": {"features": {"wav": str(root / "wav.csv")},
                             "caption": str(root / "text.json")},
                },
                "collate_fn": {
                    "type":
                        "captioning.datasets.collate_func.TextCollate",
                    "args": {"pad_keys": ["wav", "cap"], "sort_key": "cap"},
                    "tokenizer": {
                        "type": "captioning.datasets.text_tokenizer."
                                "DictTokenizer",
                        "args": {"tokenizer_path": str(root / "vocab.pkl"),
                                 "max_length": 20},
                    },
                },
                "dataloader_args": {"batch_size": 2, "num_workers": 0,
                                    "shuffle": True},
            },
            "val": {
                "dataset": {
                    "type": "captioning.datasets.caption_dataset."
                            "InferenceDataset",
                    "args": {"features": {"wav": str(root / "wav.csv")}},
                },
                "collate_fn": {
                    "type": "captioning.datasets.collate_func."
                            "VarLenPadCollate",
                    "args": {"pad_keys": ["wav"]},
                },
                "caption": str(root / "text.json"),
                "dataloader_args": {"batch_size": 4, "num_workers": 0},
            },
        },
        "optimizer": {"args": {"lr": 1e-3, "weight_decay": 1e-6}},
        "lr_scheduler": {
            "type": "captioning.utils.lr_scheduler."
                    "ExponentialDecayScheduler",
            "args": {"final_lrs": 1e-5}},
        "loss": {"type": "captioning.losses.loss.LabelSmoothingLoss",
                 "args": {"smoothing": 0.1}},
        "trainer": {"epochs": 2, "max_grad_norm": 1.0},
        "scheduled_sampling": {"use": False},
        "swa": {"use": True, "start": 1},
        "inference_args": {"sample_method": "greedy"},
    }
    import yaml
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    eval_cfg = {
        "data": {"test": {
            "dataset": {
                "type": "captioning.datasets.caption_dataset."
                        "InferenceDataset",
                "args": {"features": {"wav": str(root / "wav.csv")}},
            },
            "collate_fn": {
                "type": "captioning.datasets.collate_func.VarLenPadCollate",
                "args": {"pad_keys": ["wav"]},
            },
            "caption": str(root / "text.json"),
            "dataloader_args": {"batch_size": 4, "num_workers": 0},
        }},
        "inference_args": {"sample_method": "beam", "beam_size": 2,
                           "max_length": 8},
        "resume": "swa.pth",
        "caption_output": "predictions/test.json",
        "score_output": "results/test.txt",
    }
    with open(root / "test.yaml", "w") as f:
        yaml.safe_dump(eval_cfg, f)
    return root


@pytest.mark.slow
def test_debug_step(workspace):
    loss = Runner().debug(str(workspace / "config.yaml"))
    assert np.isfinite(loss)
    assert loss > 0


@pytest.mark.slow
def test_train_predict_evaluate(workspace):
    runner = Runner()
    exp_dir = runner.train(str(workspace / "config.yaml"))
    from pathlib import Path
    exp = Path(exp_dir)
    assert (exp / "best.pth").exists()
    assert (exp / "last.pth").exists()
    assert (exp / "swa.pth").exists()
    assert (exp / "config.yaml").exists()

    result = runner.evaluate(str(exp), str(workspace / "test.yaml"))
    assert "cider" in result and "bleu_4" in result
    pred_file = exp / "predictions" / "test.json"
    assert pred_file.exists()
    preds = json.loads(pred_file.read_text())["predictions"]
    assert len(preds) == 4
    assert (exp / "results" / "test.txt").exists()
