"""End-to-end captioner tests: training forwards, generation paths, and
KV-cache consistency between the step decoder and the full forward."""

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocaption_tpu.decoding import SpecialTokens
from audiocaption_tpu.models.captioner import Captioner, generate
from audiocaption_tpu.models.rnn_decoder import (
    BahAttnCatFcDecoder, TemporalBahAttnDecoder)
from audiocaption_tpu.models.transformer_decoder import TransformerDecoder
from audiocaption_tpu.ops.frontend import CNN14_MEL_32K, EFFB2_MEL_16K

V = 23
SPECIAL = SpecialTokens(max_length=8)


class TinyEncoder(nn.Module):
    """Cheap stand-in with the encoder interface (lms, feat_len) -> dict."""
    dim: int = 16
    downsample: int = 4

    @nn.compact
    def __call__(self, lms, feat_len, train: bool = False) -> Dict:
        x = nn.Dense(self.dim)(lms)
        B, T, _ = x.shape
        x = x[:, :T // self.downsample * self.downsample]
        x = x.reshape(B, T // self.downsample, self.downsample, self.dim)
        attn = jnp.mean(x, axis=2)
        out_len = feat_len // self.downsample
        return {"attn_emb": attn, "fc_emb": jnp.mean(attn, 1),
                "attn_emb_len": out_len}


def make_model(decoder="transformer"):
    enc = TinyEncoder()
    if decoder == "transformer":
        dec = TransformerDecoder(emb_dim=32, vocab_size=V, attn_emb_dim=16,
                                 dropout=0.0, nlayers=2, nhead=2)
    elif decoder == "rnn":
        dec = BahAttnCatFcDecoder(emb_dim=24, vocab_size=V, fc_emb_dim=16,
                                  attn_emb_dim=16, d_model=24, dropout=0.0)
    else:
        dec = TemporalBahAttnDecoder(emb_dim=24, vocab_size=V, fc_emb_dim=16,
                                     attn_emb_dim=16, d_model=24, dropout=0.0)
    return Captioner(encoder=enc, decoder=dec, mel=CNN14_MEL_32K,
                     special=SPECIAL)


def init_model(model, B=2, T=3200, Lc=7, **kwargs):
    wav = jax.random.normal(jax.random.PRNGKey(0), (B, T))
    wav_len = jnp.asarray([T, T // 2])
    cap = jax.random.randint(jax.random.PRNGKey(1), (B, Lc), 4, V)
    cap = cap.at[:, 0].set(SPECIAL.bos).at[:, -1].set(SPECIAL.eos)
    cap_len = jnp.asarray([Lc, Lc - 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "sample": jax.random.PRNGKey(3),
         "dropout": jax.random.PRNGKey(4)},
        wav, wav_len, cap, cap_len, **kwargs)
    return variables, (wav, wav_len, cap, cap_len)


@pytest.mark.parametrize("family", ["transformer", "rnn", "temporal"])
def test_train_forward_shapes(family):
    model = make_model(family)
    kwargs = {"ss_ratio": 0.7} if family == "transformer" else {}
    if family == "temporal":
        kwargs["temporal_tag"] = jnp.asarray([1, 2])
    variables, (wav, wav_len, cap, cap_len) = init_model(model, **kwargs)
    out = model.apply(variables, wav, wav_len, cap, cap_len,
                      rngs={"sample": jax.random.PRNGKey(5)}, **kwargs)
    B, Lc = cap.shape
    assert out["logit"].shape == (B, Lc - 1, V)
    assert out["seq"].shape == (B, Lc - 1)
    assert out["attn_emb"].shape[0] == B


def test_transformer_teacher_forcing_matches_stepwise_ss1():
    """With ss_ratio pinned to teacher (coin always < 1.0 -> 1.0-eps),
    the step-wise path must produce the same logits as seq_forward."""
    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    full = model.apply(variables, wav, wav_len, cap, cap_len, ss_ratio=1.0,
                       train=False)
    stepwise = model.apply(variables, wav, wav_len, cap, cap_len,
                           ss_ratio=0.99999, train=False,
                           rngs={"sample": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(full["logit"]),
                               np.asarray(stepwise["logit"]), atol=1e-5)


@pytest.mark.parametrize("ss_ratio", [0.0, 0.5, 0.99999])
def test_ss_cached_matches_recompute(ss_ratio):
    """The KV-cache-reusing scheduled-sampling forward must be
    logit/embed/seq-identical (eval mode: no dropout noise) to the
    reference-shaped per-step prefix recompute, at pure-model coin
    (0.0), mixed (0.5), and pure-teacher (~1.0) ratios.  Same 'sample'
    rng => identical coin draws in both paths (one draw per step)."""
    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    rngs = {"sample": jax.random.PRNGKey(7)}
    fast = model.apply(variables, wav, wav_len, cap, cap_len,
                       ss_ratio=ss_ratio, train=False, rngs=rngs)
    ref = model.apply(variables, wav, wav_len, cap, cap_len,
                      ss_ratio=ss_ratio, train=False,
                      ss_impl="recompute", rngs=rngs)
    np.testing.assert_array_equal(np.asarray(fast["seq"]),
                                  np.asarray(ref["seq"]))
    np.testing.assert_allclose(np.asarray(fast["logit"]),
                               np.asarray(ref["logit"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fast["embed"]),
                               np.asarray(ref["embed"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fast["sampled_logprob"]),
                               np.asarray(ref["sampled_logprob"]),
                               atol=2e-5)


def test_ss_cached_train_mode_runs_with_dropout():
    """Dropout draws differ between the cached and recompute paths by
    construction; here we only assert the train-mode cached path runs
    and produces finite outputs with dropout active."""
    enc = TinyEncoder()
    dec = TransformerDecoder(emb_dim=32, vocab_size=V, attn_emb_dim=16,
                             dropout=0.2, nlayers=2, nhead=2)
    model = Captioner(encoder=enc, decoder=dec, mel=CNN14_MEL_32K,
                      special=SPECIAL)
    variables, (wav, wav_len, cap, cap_len) = init_model(
        model, ss_ratio=0.7)
    out = model.apply(variables, wav, wav_len, cap, cap_len, ss_ratio=0.7,
                      train=True,
                      rngs={"sample": jax.random.PRNGKey(5),
                            "dropout": jax.random.PRNGKey(6)})
    assert np.isfinite(np.asarray(out["logit"])).all()


@pytest.mark.parametrize("family", ["transformer", "rnn"])
@pytest.mark.parametrize("method", ["greedy", "beam", "dbs", "top3"])
def test_generate_paths(family, method):
    model = make_model(family)
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    out = generate(model, variables, wav, wav_len, sample_method=method,
                   group_size=2, key=jax.random.PRNGKey(7))
    if method == "dbs":
        assert out["seq"].shape == (2, 6, SPECIAL.max_length)
    else:
        assert out["seq"].shape == (2, SPECIAL.max_length)
    s = np.asarray(out["seq"])
    assert (s >= 0).all() and (s < V).all()


def test_greedy_decode_consistent_with_full_forward():
    """KV-cached greedy decode tokens must equal argmax of the full
    causal forward over the generated prefix (cache consistency)."""
    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    out = generate(model, variables, wav, wav_len, sample_method="greedy")
    seq = np.asarray(out["seq"])

    # full forward over [bos] + generated words
    word = np.concatenate(
        [np.full((2, 1), SPECIAL.bos, np.int64), seq[:, :-1]], axis=1)
    enc = model.apply(variables, wav, wav_len, method=Captioner.encode)
    dec_vars = {"params": variables["params"]["decoder"]}
    full = model.decoder.apply(
        dec_vars, jnp.asarray(word), enc["attn_emb"], enc["attn_emb_len"],
        cap_padding_mask=jnp.asarray(word == SPECIAL.pad))
    logits = np.asarray(full["logit"])
    for b in range(2):
        for t in range(seq.shape[1]):
            assert seq[b, t] == logits[b, t].argmax(), (b, t)
            if seq[b, t] == SPECIAL.eos:
                break


def test_generate_is_jittable_and_deterministic():
    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)

    @jax.jit
    def run(w, wl):
        return generate(model, variables, w, wl, sample_method="beam",
                        beam_size=2)["seq"]
    a = np.asarray(run(wav, wav_len))
    b = np.asarray(run(wav, wav_len))
    np.testing.assert_array_equal(a, b)


def test_temporal_tag_changes_step0_logits():
    model = make_model("temporal")
    variables, (wav, wav_len, cap, cap_len) = init_model(
        model, temporal_tag=jnp.asarray([0, 0]))
    enc = model.apply(variables, wav, wav_len, method=Captioner.encode)
    dec_vars = {"params": variables["params"]["decoder"]}
    dec = model.decoder

    def step0_logits(tag):
        static, dyn = dec.apply(
            dec_vars, enc["attn_emb"], enc["attn_emb_len"], enc["fc_emb"],
            SPECIAL.max_length, temporal_tag=tag,
            method=TemporalBahAttnDecoder.init_cache)
        word = jnp.full((2,), SPECIAL.bos, jnp.int32)
        logit, dyn2 = dec.apply(dec_vars, word, jnp.int32(0), static, dyn,
                                method=TemporalBahAttnDecoder.step)
        logit1, _ = dec.apply(dec_vars, word, jnp.int32(1), static, dyn2,
                              method=TemporalBahAttnDecoder.step)
        return np.asarray(logit), np.asarray(logit1)

    l0_tag0, l1_tag0 = step0_logits(jnp.asarray([0, 0]))
    l0_tag3, l1_tag3 = step0_logits(jnp.asarray([3, 3]))
    # tag embedding replaces the <bos> embedding at t=0 only
    assert np.abs(l0_tag0 - l0_tag3).max() > 1e-6
