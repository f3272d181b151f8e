"""Augmentation, ensemble decoding, SCST, and KD loss tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiocaption_tpu.data.augment import (
    build_transforms, freq_mask, gaussian_noise, random_crop,
    spec_augment_np, time_mask, time_roll)
from audiocaption_tpu.decoding.ensemble import ensemble_generate
from audiocaption_tpu.losses.kd import (
    ContraEncoderKdHead, MseEncoderKdHead, info_nce_loss, sup_kd_loss,
    token_kd_loss)
from audiocaption_tpu.training.scst import (
    compute_batch_score, make_scst_fns, scst_mask, scst_step)
from audiocaption_tpu.ops.specaug import spec_augment

from test_captioner import make_model, init_model, SPECIAL, V


# --------------------------------------------------------- augmentation ----

def test_gaussian_noise_snr():
    wav = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    noisy = gaussian_noise(snr_db=20)(wav)
    noise = noisy - wav
    snr = 10 * np.log10(np.mean(wav ** 2) / np.mean(noise ** 2))
    assert 18 < snr < 22


def test_crop_roll_masks():
    wav = np.arange(1000, dtype=np.float32)
    assert len(random_crop(0.5)(wav)) == 500
    assert len(time_roll(10)(wav)) == 1000
    spec = np.ones((100, 64), np.float32)
    masked = freq_mask(8, 2)(time_mask(20, 2)(spec))
    assert masked.shape == spec.shape
    assert masked.sum() <= spec.sum()


def test_build_transforms_registry():
    tfs = build_transforms([
        {"type": "captioning.datasets.augment.gaussian_noise",
         "args": {"snr_db": 15}},
        {"type": "time_roll", "args": {}},
    ])
    assert len(tfs) == 2
    wav = np.random.randn(100).astype(np.float32)
    out = tfs[1](tfs[0](wav))
    assert out.shape == wav.shape


def test_spec_augment_device():
    lms = jnp.ones((2, 200, 64))
    out = spec_augment(jax.random.PRNGKey(0), lms)
    assert out.shape == lms.shape
    assert float(out.sum()) < float(lms.sum())  # something was dropped


# ------------------------------------------------------------- ensemble ----

def test_ensemble_two_models_beam():
    m1 = make_model("transformer")
    m2 = make_model("transformer")
    v1, (wav, wav_len, cap, cap_len) = init_model(m1)
    v2, _ = init_model(m2)
    out = ensemble_generate([m1, m2], [v1, v2], wav, wav_len,
                            sample_method="beam", beam_size=2)
    assert out["seq"].shape == (2, SPECIAL.max_length)
    # single-model ensemble == plain generate (greedy)
    from audiocaption_tpu.models.captioner import generate
    e1 = ensemble_generate([m1], [v1], wav, wav_len,
                           sample_method="greedy")
    g1 = generate(m1, v1, wav, wav_len, sample_method="greedy")
    np.testing.assert_array_equal(np.asarray(e1["seq"]),
                                  np.asarray(g1["seq"]))


def test_ensemble_mixed_decoder_families():
    m1 = make_model("transformer")
    m2 = make_model("rnn")
    v1, (wav, wav_len, cap, cap_len) = init_model(m1)
    v2, _ = init_model(m2)
    out = ensemble_generate([m1, m2], [v1, v2], wav, wav_len,
                            sample_method="greedy")
    assert out["seq"].shape == (2, SPECIAL.max_length)


# ----------------------------------------------------------------- SCST ----

def test_scst_mask():
    seq = np.asarray([[5, 2, 0, 0], [5, 6, 7, 8]])
    mask = scst_mask(seq, eos=2)
    np.testing.assert_array_equal(mask, [[1, 1, 0, 0], [1, 1, 1, 1]])


def test_compute_batch_score_shapes():
    seqs = np.asarray([[1, 5, 6, 2, 0], [1, 7, 2, 0, 0]])
    idx2word = {5: "dog", 6: "barks", 7: "water"}
    key2refs = {"a": ["dog barks loud today"], "b": ["water flows here"]}
    scores = compute_batch_score(seqs, key2refs, ["a", "b"], idx2word,
                                 bos=1, eos=2)
    assert scores.shape == (2,)
    assert (scores >= 0).all()


def test_scst_step_end_to_end():
    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    fns = make_scst_fns(model, max_length=6)
    idx2word = {i: f"w{i}" for i in range(V)}
    key2refs = {"a": ["w5 w6 w7 w8"], "b": ["w9 w10"]}
    batch = {"wav": wav, "wav_len": wav_len}
    loss, grads, metrics = scst_step(model, variables, batch, key2refs,
                                     ["a", "b"], idx2word, fns,
                                     jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # grads flow into the decoder
    leaf = jax.tree_util.tree_leaves(grads["decoder"])[0]
    assert np.isfinite(np.asarray(leaf)).all()
    assert "reward_sample" in metrics


# ------------------------------------------------------------------- KD ----

def test_token_kd_loss_zero_when_equal():
    logit = jnp.asarray(np.random.RandomState(0).randn(2, 4, 9),
                        jnp.float32)
    tgt_len = jnp.asarray([4, 2])
    loss = token_kd_loss(logit, logit, tgt_len, "kl")
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)
    l2 = token_kd_loss(logit, logit + 1.0, tgt_len, "l2")
    np.testing.assert_allclose(float(l2), 1.0, rtol=1e-5)


def test_sup_kd_mix():
    assert float(sup_kd_loss(jnp.float32(2.0), jnp.float32(4.0), 0.5)) == 3.0


def test_info_nce_identity_favors_diagonal():
    emb = jnp.asarray(np.eye(4, 8), jnp.float32)
    aligned = float(info_nce_loss(emb, emb, jnp.float32(10.0)))
    shuffled = float(info_nce_loss(emb, emb[::-1], jnp.float32(10.0)))
    assert aligned < shuffled


def test_contra_kd_head():
    head = ContraEncoderKdHead(shared_dim=16)
    s = jnp.asarray(np.random.RandomState(1).randn(4, 32), jnp.float32)
    t = jnp.asarray(np.random.RandomState(2).randn(4, 24), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), s, t)
    loss = head.apply(params, s, t)
    assert np.isfinite(float(loss))
    assert "logit_scale" in params["params"]


def test_mse_kd_head():
    head = MseEncoderKdHead(tchr_dim=24)
    s = jnp.asarray(np.random.RandomState(1).randn(4, 32), jnp.float32)
    t = jnp.asarray(np.random.RandomState(2).randn(4, 24), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), s, t)
    assert np.isfinite(float(head.apply(params, s, t)))


def test_time_warp():
    from audiocaption_tpu.data.augment import time_warp
    spec = np.random.RandomState(0).randn(100, 64).astype(np.float32)
    out = time_warp(5)(spec)
    assert out.shape == spec.shape
    assert np.isfinite(out).all()
    assert not np.array_equal(out, spec)  # it actually warped


def test_mobilenet_v2_and_cnn14trm_registered():
    from audiocaption_tpu.models.encoders_extra import (
        MobileNetV2Encoder, Cnn14TransformerEncoder)
    assert MobileNetV2Encoder.downsample_ratio == 32


def test_effb2_remat_matches():
    """remat=True (per-MBConv rematerialization, trading FLOPs for HBM)
    must not change the forward or the gradients beyond rounding."""
    import flax.traverse_util as trav
    from audiocaption_tpu.models.effb2 import EfficientNetB2

    rng = np.random.RandomState(0)
    lms = jnp.asarray(rng.randn(2, 101, 64), jnp.float32)
    fl = jnp.asarray([101, 80])
    m0 = EfficientNetB2()
    m1 = EfficientNetB2(remat=True)
    v = m0.init({"params": jax.random.PRNGKey(0)}, lms, fl, train=False)
    np.testing.assert_array_equal(
        np.asarray(m0.apply(v, lms, fl)["fc_emb"]),
        np.asarray(m1.apply(v, lms, fl)["fc_emb"]))

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            lms, fl, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(out["fc_emb"] ** 2)

    g0 = jax.jit(jax.grad(lambda p: loss(m0, p)))(v["params"])
    g1 = jax.jit(jax.grad(lambda p: loss(m1, p)))(v["params"])
    f0 = np.concatenate([np.asarray(x).ravel()
                         for x in trav.flatten_dict(g0).values()])
    f1 = np.concatenate([np.asarray(x).ravel()
                         for x in trav.flatten_dict(g1).values()])
    assert np.linalg.norm(f0 - f1) / np.linalg.norm(f0) < 1e-4


def test_generate_data_parallel_mesh():
    """Batched decode under a data mesh: beam search with the batch
    sharded over 8 virtual devices produces the same tokens as the
    single-device decode (multi-chip serving path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from audiocaption_tpu.models.captioner import generate
    from audiocaption_tpu.parallel import make_mesh
    from test_captioner import make_model, init_model

    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    wav8 = jnp.concatenate([wav] * 4, axis=0)
    len8 = jnp.concatenate([wav_len] * 4, axis=0)

    ref = np.asarray(generate(model, variables, wav8, len8,
                              sample_method="beam", beam_size=3,
                              max_length=8)["seq"])

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    v_r = jax.device_put(variables, repl)
    wav_s = jax.device_put(wav8, NamedSharding(mesh, P("data")))
    len_s = jax.device_put(len8, NamedSharding(mesh, P("data")))

    @jax.jit
    def decode(w, l):
        return generate(model, v_r, w, l, sample_method="beam",
                        beam_size=3, max_length=8)["seq"]

    got = np.asarray(decode(wav_s, len_s))
    np.testing.assert_array_equal(got, ref)
