"""Input pipeline: background prefetch-to-device + compact wire dtypes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocaption_tpu.data.collate import VarLenPadCollate
from audiocaption_tpu.data.prefetch import prefetch_to_device


def _batches(n=5):
    rng = np.random.RandomState(0)
    for i in range(n):
        yield {"wav": rng.randn(4, 100).astype(np.float32),
               "wav_len": np.full((4,), 100, np.int32),
               "audio_id": [f"a{i}_{j}" for j in range(4)]}


def test_prefetch_order_and_placement():
    ref = list(_batches())
    got = list(prefetch_to_device(_batches()))
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert isinstance(g["wav"], jax.Array)
        np.testing.assert_array_equal(np.asarray(g["wav"]), r["wav"])
        assert g["audio_id"] == r["audio_id"]        # host passthrough


def test_prefetch_transform_runs_in_worker():
    def tf(b):
        b = dict(b)
        b["wav"] = b["wav"] * 2
        return b
    got = list(prefetch_to_device(_batches(2), transform=tf))
    ref = list(_batches(2))
    np.testing.assert_allclose(np.asarray(got[0]["wav"]),
                               ref[0]["wav"] * 2)


def test_prefetch_propagates_worker_exception():
    def bad():
        yield {"wav": np.zeros((2, 4), np.float32)}
        raise RuntimeError("loader died")
    it = prefetch_to_device(bad())
    next(it)
    with pytest.raises(RuntimeError, match="loader died"):
        list(it)


def test_prefetch_tuple_batches():
    def pairs():
        for b1, b2 in zip(_batches(2), _batches(2)):
            yield b1, b2
    got = list(prefetch_to_device(pairs()))
    assert len(got) == 2
    a, b = got[0]
    assert isinstance(a["wav"], jax.Array)
    assert isinstance(b["wav"], jax.Array)


def test_collate_wire_dtype_f16():
    col = VarLenPadCollate(pad_keys=["wav"],
                           wire_dtype={"wav": "float16"})
    rng = np.random.RandomState(1)
    items = [{"wav": rng.randn(80).astype(np.float32) * 0.01,
              "audio_id": f"x{i}"} for i in range(3)]
    out = col(items)
    assert out["wav"].dtype == np.float16
    assert out["wav"].shape[0] == 3
    np.testing.assert_allclose(out["wav"][0, :80].astype(np.float32),
                               items[0]["wav"], rtol=2e-3, atol=1e-6)


def test_device_wav_bank(tmp_path):
    """build_wav_bank rows equal the dataset's wavs (f16-rounded), and
    index-mode items carry matching wav_idx/wav_len."""
    import h5py
    from audiocaption_tpu.data.dataset import InferenceDataset
    from audiocaption_tpu.data.device_bank import build_wav_bank
    rng = np.random.RandomState(3)
    h5p = tmp_path / "w.h5"
    lens = [50, 80, 64]
    with h5py.File(h5p, "w") as f:
        for i, n in enumerate(lens):
            f[f"a{i}"] = rng.randn(n).astype(np.float16)
    with open(tmp_path / "w.csv", "w") as f:
        f.write("audio_id\thdf5_path\n")
        for i in range(3):
            f.write(f"a{i}\t{h5p}\n")
    ds = InferenceDataset({"wav": str(tmp_path / "w.csv")})
    bank, blens = build_wav_bank(ds)
    assert bank.shape == (3, 80) and bank.dtype == jnp.float16
    np.testing.assert_array_equal(blens, lens)
    wav1 = ds.get_audio("a1")
    np.testing.assert_allclose(np.asarray(bank)[1, :80].astype(np.float32),
                               wav1, rtol=1e-3)
    assert float(jnp.abs(bank[0, 50:]).max()) == 0.0   # padded rows
    ds.enable_wav_index(blens)
    item = ds[2]
    assert item["wav_idx"] == 2 and item["wav_len"] == 64
    assert "wav" not in item


def test_device_bank_2d_features(tmp_path):
    """The bank also holds [T, D] precomputed-feature corpora (the
    feature-input families, e.g. M2 over extracted attn features)."""
    import h5py
    from audiocaption_tpu.data.dataset import InferenceDataset
    from audiocaption_tpu.data.device_bank import build_wav_bank
    rng = np.random.RandomState(4)
    h5p = tmp_path / "feat.h5"
    lens = [7, 5]
    with h5py.File(h5p, "w") as f:
        for i, n in enumerate(lens):
            f[f"a{i}"] = rng.randn(n, 12).astype(np.float16)
    with open(tmp_path / "feat.csv", "w") as f:
        f.write("audio_id\thdf5_path\n")
        for i in range(2):
            f.write(f"a{i}\t{h5p}\n")
    ds = InferenceDataset({"wav": str(tmp_path / "feat.csv")})
    bank, blens = build_wav_bank(ds)
    assert bank.shape == (2, 7, 12) and bank.dtype == jnp.float16
    np.testing.assert_array_equal(blens, lens)
    np.testing.assert_allclose(
        np.asarray(bank)[1, :5].astype(np.float32),
        ds.get_audio("a1"), rtol=1e-3)
    assert float(jnp.abs(bank[1, 5:]).max()) == 0.0


def test_train_step_bank_gather_matches_direct():
    """A step fed (wav_bank, wav_idx) produces the same loss as one fed
    the gathered rows directly."""
    from audiocaption_tpu.losses import masked_token_loss
    from audiocaption_tpu.optim import exponential_decay_with_warmup
    from audiocaption_tpu.training import (create_train_state,
                                           make_train_step)
    from audiocaption_tpu.training.trainer import make_optimizer
    from test_captioner import make_model, init_model

    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    bank = jnp.asarray(np.asarray(wav), jnp.float16)
    idx = jnp.asarray([1, 0], jnp.int32)[:wav.shape[0]]
    batch = {"wav_len": jnp.take(wav_len, idx), "cap": cap.astype(jnp.int32),
             "cap_len": cap_len}
    tx = make_optimizer(1e-3, exponential_decay_with_warmup(
        1e-3, 1e-5, 10, 0))
    step = make_train_step(model, masked_token_loss("ce"), tx,
                           use_ss=False, donate=False)
    s0 = create_train_state(variables, tx, jax.random.PRNGKey(0))
    _, m_bank = step(s0, dict(batch, wav_bank=bank, wav_idx=idx),
                     jnp.float32(1.0))
    _, m_dir = step(s0, dict(batch, wav=jnp.take(bank, idx, axis=0)),
                    jnp.float32(1.0))
    np.testing.assert_allclose(float(m_bank["loss"]),
                               float(m_dir["loss"]), rtol=1e-6)


def test_train_step_expands_f16_wire():
    """The jitted step normalizes f16/int16 wav to f32 on device: loss
    matches the f32-fed step exactly for f16-representable data."""
    from audiocaption_tpu.losses import masked_token_loss
    from audiocaption_tpu.optim import exponential_decay_with_warmup
    from audiocaption_tpu.training import (create_train_state,
                                           make_train_step)
    from audiocaption_tpu.training.trainer import make_optimizer
    from test_captioner import make_model, init_model

    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    wav16 = np.asarray(wav).astype(np.float16)
    batch = {"wav_len": wav_len, "cap": cap.astype(jnp.int32),
             "cap_len": cap_len}
    tx = make_optimizer(1e-3, exponential_decay_with_warmup(
        1e-3, 1e-5, 10, 0))
    step = make_train_step(model, masked_token_loss("ce"), tx,
                           use_ss=False, donate=False)
    s0 = create_train_state(variables, tx, jax.random.PRNGKey(0))
    _, m16 = step(s0, dict(batch, wav=jnp.asarray(wav16)),
                  jnp.float32(1.0))
    _, m32 = step(s0, dict(batch, wav=jnp.asarray(
        wav16.astype(np.float32))), jnp.float32(1.0))
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=1e-6)
