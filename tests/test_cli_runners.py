"""End-to-end CLI tests for the SCST / KD / aug / ensemble runners
(reference: run.py rl_train switch, train_eval/kd/*.py, run_aug.py,
ensemble.py).  Uses a light Cdur5 encoder so each jitted step compiles
fast on CPU."""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest
import yaml

from audiocaption_tpu.cli.run import Runner
from audiocaption_tpu.data import DictTokenizer


SR = 16000


def _model_node():
    return {
        "type": "captioning.models.transformer_model.TransformerModel",
        "args": {},
        "encoder": {
            "type": "captioning.models.crnn_trm_encoder.Cdur5Encoder",
            "args": {"sample_rate": SR},
        },
        "decoder": {
            "type": "captioning.models.transformer_decoder."
                    "TransformerDecoder",
            "args": {"emb_dim": 64, "nlayers": 1, "nhead": 2,
                     "dropout": 0.2},
        },
    }


def _data_node(root):
    return {
        "train": {
            "dataset": {
                "type": "captioning.datasets.caption_dataset.CaptionDataset",
                "args": {"features": {"wav": str(root / "wav.csv")},
                         "caption": str(root / "text.json")},
            },
            "collate_fn": {
                "type": "captioning.datasets.collate_func.TextCollate",
                "args": {"pad_keys": ["wav", "cap"]},
                "tokenizer": {
                    "type":
                        "captioning.datasets.text_tokenizer.DictTokenizer",
                    "args": {"tokenizer_path": str(root / "vocab.pkl"),
                             "max_length": 20},
                },
            },
            "dataloader_args": {"batch_size": 4, "num_workers": 0,
                                "shuffle": True},
        },
        "val": {
            "dataset": {
                "type":
                    "captioning.datasets.caption_dataset.InferenceDataset",
                "args": {"features": {"wav": str(root / "wav.csv")}},
            },
            "collate_fn": {
                "type": "captioning.datasets.collate_func.VarLenPadCollate",
                "args": {"pad_keys": ["wav"]},
            },
            "caption": str(root / "text.json"),
            "dataloader_args": {"batch_size": 4, "num_workers": 0},
        },
    }


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("runners")
    rng = np.random.RandomState(0)
    n_audio = 4
    h5p = root / "waveform.h5"
    with h5py.File(h5p, "w") as f:
        for i in range(n_audio):
            f[f"aud{i}"] = rng.randn(SR).astype(np.float32)
    with open(root / "wav.csv", "w") as f:
        f.write("audio_id\thdf5_path\n")
        for i in range(n_audio):
            f.write(f"aud{i}\t{h5p}\n")
    caps = ["a dog barks loudly", "water flows down", "someone speaks",
            "music plays softly"]
    data = {"audios": [
        {"audio_id": f"aud{i}", "captions": [
            {"tokens": caps[i], "caption": caps[i], "cap_id": "1"}]}
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
        "experiment_path": str(root / "base_exp"),
        "seed": 1,
        "model": _model_node(),
        "data": _data_node(root),
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
    with open(root / "base.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    return root, cfg


@pytest.fixture(scope="module")
def base_exp(workspace):
    root, cfg = workspace
    exp_dir = Runner().train(str(root / "base.yaml"))
    return Path(exp_dir)


@pytest.mark.slow
def test_scst_training(workspace, base_exp):
    """rl_train path: config wraps the model in ScstWrapper
    (reference run.py:67-75, rl_model.py:11-85); resumes from the XE
    checkpoint and runs REINFORCE-with-CIDEr epochs."""
    root, base_cfg = workspace
    cfg = dict(base_cfg)
    cfg["experiment_path"] = str(root / "scst_exp")
    cfg["model"] = {
        "type": "captioning.models.rl_model.ScstWrapper",
        "model": _model_node(),
    }
    cfg["resume"] = str(base_exp / "best.pth")
    cfg["trainer"] = {"epochs": 1, "max_grad_norm": 1.0,
                      "finetune": True}
    cfg["rl"] = {"max_length": 8}
    # exercise the device-resident corpus path for SCST (the wav rows
    # are gathered on device from the bank instead of shipped per step)
    import copy
    cfg["data"] = copy.deepcopy(cfg["data"])
    cfg["data"]["train"]["device_resident"] = True
    p = root / "scst.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = Runner().train(str(p))
    exp = Path(exp_dir)
    assert (exp / "best.pth").exists()
    log = (exp / "train.log").read_text()
    assert "epoch 1" in log


@pytest.mark.slow
def test_token_kd_training(workspace, base_exp):
    root, base_cfg = workspace
    cfg = dict(base_cfg)
    cfg["experiment_path"] = str(root / "kd_tok_exp")
    cfg["kd"] = {"type": "token", "weight": 0.5, "kd_loss": "kl",
                 "temperature": 2.0,
                 "teacher": {"experiment_path": str(base_exp),
                             "resume": "best.pth"}}
    # exercise the device-resident corpus path for KD (wav rows
    # gathered on device from the bank; val decodes from its own bank)
    import copy
    cfg["data"] = copy.deepcopy(cfg["data"])
    cfg["data"]["train"]["device_resident"] = True
    cfg["data"]["val"]["device_resident"] = True
    p = root / "kd_tok.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = Runner().train_kd(str(p))
    assert (Path(exp_dir) / "best.pth").exists()


@pytest.mark.slow
def test_seq_kd_training(workspace, base_exp):
    root, base_cfg = workspace
    cfg = dict(base_cfg)
    cfg["experiment_path"] = str(root / "kd_seq_exp")
    cfg["kd"] = {"type": "seq",
                 "teacher": {"experiment_path": str(base_exp),
                             "resume": "best.pth"}}
    # device-resident + seq KD: the pseudo-caption pass must run on raw
    # wavs BEFORE the dataset switches to bank-index mode
    import copy
    cfg["data"] = copy.deepcopy(cfg["data"])
    cfg["data"]["train"]["device_resident"] = True
    p = root / "kd_seq.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = Runner().train_kd(str(p))
    exp = Path(exp_dir)
    assert (exp / "best.pth").exists()
    pseudo = json.loads((exp / "pseudo_captions.json").read_text())
    assert set(pseudo) == {f"aud{i}" for i in range(4)}


@pytest.mark.slow
def test_enc_kd_training(workspace):
    root, base_cfg = workspace
    rng = np.random.RandomState(3)
    emb_path = root / "tchr_embs.npz"
    np.savez(emb_path, **{f"aud{i}": rng.randn(16).astype(np.float32)
                          for i in range(4)})
    cfg = dict(base_cfg)
    cfg["experiment_path"] = str(root / "kd_enc_exp")
    cfg["kd"] = {"type": "enc", "weight": 1.0, "shared_dim": 32,
                 "teacher_emb": str(emb_path)}
    p = root / "kd_enc.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = Runner().train_kd(str(p))
    assert (Path(exp_dir) / "best.pth").exists()


@pytest.mark.slow
def test_enc_kd_training_jax_teacher(workspace, base_exp):
    """enc KD with NO precomputed npz: the frozen encoder of a trained
    JAX experiment embeds each batch on the fly (the reference computes
    its BART-teacher embedding per batch the same way,
    kd/run_enc_kd.py:76-84)."""
    root, base_cfg = workspace
    cfg = dict(base_cfg)
    cfg["experiment_path"] = str(root / "kd_enc_jax_exp")
    cfg["kd"] = {"type": "enc", "weight": 1.0, "shared_dim": 32,
                 "teacher": {"experiment_path": str(base_exp),
                             "resume": "best.pth"}}
    p = root / "kd_enc_jax.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = Runner().train_kd(str(p))
    assert (Path(exp_dir) / "best.pth").exists()


@pytest.mark.slow
def test_aug_training(workspace):
    root, base_cfg = workspace
    cfg = dict(base_cfg)
    cfg["experiment_path"] = str(root / "aug_exp")
    import copy
    cfg["data"] = copy.deepcopy(cfg["data"])
    cfg["data"]["train_aug"] = copy.deepcopy(cfg["data"]["train"])
    # device-resident on all three loaders: real and aug corpora get
    # separate banks; val decodes from its own
    cfg["data"]["train"]["device_resident"] = True
    cfg["data"]["train_aug"]["device_resident"] = True
    cfg["data"]["val"]["device_resident"] = True
    cfg["aug"] = {"discount": 0.5, "mode": "linear"}
    p = root / "aug.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = Runner().train_aug(str(p))
    assert (Path(exp_dir) / "best.pth").exists()


@pytest.mark.slow
def test_ensemble_predict_evaluate_dcase(workspace, base_exp):
    root, base_cfg = workspace
    eval_cfg = {
        # one plain path + one {path, resume} mapping: the dict form
        # sets a per-member checkpoint for mixed ensembles (XE swa.pth
        # + SCST best.pth); the plain form takes the global resume
        "experiment_path": [str(base_exp),
                            {"path": str(base_exp),
                             "resume": "last.pth"}],
        "resume": "best.pth",
        "data": {"test": dict(base_cfg["data"]["val"])},
        "inference_args": {"sample_method": "beam", "beam_size": 2,
                           "max_length": 8},
        "output_path": str(root / "ens_out"),
        "caption_output": "predictions.json",
        "score_output": "scores.txt",
        "dcase_output": "dcase.csv",
    }
    p = root / "ens.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(eval_cfg, f)
    runner = Runner()
    result = runner.ensemble_evaluate(str(p))
    assert "cider" in result
    preds = json.loads(
        (root / "ens_out" / "predictions.json").read_text())["predictions"]
    assert len(preds) == 4 and "tokens" in preds[0]

    out_csv = runner.dcase_predict(str(p))
    lines = Path(out_csv).read_text().strip().splitlines()
    assert lines[0] == "file_name,caption_predicted"
    assert len(lines) == 5
