"""KD datasets, iteration sampler, feature-input generation,
prepare_features CLI."""

import json

import numpy as np
import pytest

from audiocaption_tpu.data.kd_dataset import (
    CaptionKdDataset, InferKdDataset, IterationBatchSampler)


@pytest.fixture
def ws(tmp_path):
    import h5py
    h5p = tmp_path / "wave.h5"
    rng = np.random.RandomState(0)
    with h5py.File(h5p, "w") as f:
        f["aud1"] = rng.randn(32000).astype(np.float32)   # 1s @32k
        f["aud2"] = rng.randn(64000).astype(np.float32)
    (tmp_path / "wav.csv").write_text(
        f"audio_id\thdf5_path\naud1\t{h5p}\naud2\t{h5p}\n")
    (tmp_path / "text.json").write_text(json.dumps({"audios": [
        {"audio_id": "aud1", "captions": [{"tokens": "a b", "cap_id": "1"}]},
        {"audio_id": "aud2", "captions": [{"tokens": "c d", "cap_id": "1"}]},
    ]}))
    return tmp_path


def test_infer_kd_dataset_dual_rates(ws):
    ds = InferKdDataset({"wav": str(ws / "wav.csv")}, orig_sr=32000,
                        target_sr=16000, teacher_target_sr=32000,
                        audio_duration=0.5, teacher_duration=0.5)
    item = ds[0]
    assert len(item["wav"]) == 8000          # 0.5s @ 16k student
    assert len(item["teacher_wav"]) == 16000  # 0.5s @ 32k teacher


def test_caption_kd_dataset(ws):
    ds = CaptionKdDataset({"wav": str(ws / "wav.csv")},
                          caption=str(ws / "text.json"), orig_sr=32000,
                          target_sr=16000, teacher_target_sr=32000)
    item = ds[0]
    assert item["cap"] == "a b"
    assert abs(len(item["wav"]) - 16000) <= 1
    assert len(item["teacher_wav"]) == 32000


def test_iteration_batch_sampler_wraparound():
    sampler = IterationBatchSampler(list(range(5)), batch_size=2,
                                    num_samples=8, shuffle=False)
    batches = list(iter(sampler))
    assert sum(len(b) for b in batches) == 8
    assert len(sampler) == 4
    flat = [i for b in batches for i in b]
    assert flat == [0, 1, 2, 3, 4, 0, 1, 2]   # wraps around


def test_generate_with_enc_override():
    import jax
    import jax.numpy as jnp
    from audiocaption_tpu.models.captioner import generate
    from test_captioner import make_model, init_model, SPECIAL
    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    enc = model.apply(variables, wav, wav_len,
                      method=type(model).encode)
    out = generate(model, variables, enc_override=enc,
                   sample_method="greedy")
    direct = generate(model, variables, wav, wav_len,
                      sample_method="greedy")
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  np.asarray(direct["seq"]))


@pytest.mark.slow
def test_prepare_features_cli(ws):
    from audiocaption_tpu.cli.prepare_features import main
    out_dir = ws / "features"
    main(["--wav_csv", str(ws / "wav.csv"), "--output_dir", str(out_dir),
          "--encoder", "cnn6", "--batch_size", "2"])
    import h5py
    with h5py.File(out_dir / "fc.h5") as f:
        assert f["aud1"].shape == (512,)
    with h5py.File(out_dir / "attn.h5") as f:
        assert f["aud1"].shape[1] == 512
    assert (out_dir / "features.csv").exists()
    assert (out_dir / "attn.csv").exists()


@pytest.mark.slow
def test_prepare_features_from_experiment(ws):
    """--experiment extracts the trained Captioner's encoder features
    and the emitted attn.csv round-trips as a feature-dataset csv (the
    M2-family input pipeline)."""
    import yaml
    from audiocaption_tpu.cli.prepare_features import main
    from audiocaption_tpu.data.dataset import InferenceDataset
    from audiocaption_tpu.training.checkpoint import save_checkpoint
    from audiocaption_tpu.utils.config import build_model_from_config

    model_cfg = {
        "type": "captioning.models.transformer_model.TransformerModel",
        "args": {},
        "encoder": {
            "type": "captioning.models.crnn_trm_encoder.Cdur5Encoder",
            "args": {"sample_rate": 32000},
        },
        "decoder": {
            "type": "captioning.models.transformer_decoder."
                    "TransformerDecoder",
            "args": {"emb_dim": 32, "nlayers": 1, "nhead": 2},
        },
    }
    word2idx = {"<pad>": 0, "<start>": 1, "<end>": 2, "<unk>": 3,
                "a": 4, "b": 5}
    import jax
    import jax.numpy as jnp
    model, _ = build_model_from_config(model_cfg,
                                       vocab_size=len(word2idx))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32000)), jnp.asarray([32000]),
        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]), train=False)

    exp_dir = ws / "exp"
    exp_dir.mkdir()
    (exp_dir / "config.yaml").write_text(
        yaml.safe_dump({"model": model_cfg}))
    save_checkpoint(str(exp_dir / "swa.pth"),
                    {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})},
                    tokenizer_state=word2idx)

    out_dir = ws / "exp_features"
    main(["--wav_csv", str(ws / "wav.csv"), "--output_dir", str(out_dir),
          "--experiment", str(exp_dir), "--resume", "swa.pth",
          "--batch_size", "2"])

    import h5py
    enc_dim = None
    with h5py.File(out_dir / "attn.h5") as f:
        assert f["aud1"].ndim == 2
        enc_dim = f["aud1"].shape[1]
    # attn.csv is directly consumable as a feature dataset
    ds = InferenceDataset({"wav": str(out_dir / "attn.csv")})
    item = ds[0]
    assert item["wav"].ndim == 2 and item["wav"].shape[1] == enc_dim
