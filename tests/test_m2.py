"""Meshed-memory (M2) transformer family — the reference's
import-guarded external dependency, built natively (models/m2.py;
reference: transformer_encoder.py:22-62, transformer_decoder.py:106-143,
transformer_model.py:89-135).  No torch oracle exists (the package is
not installed for the reference either), so these tests pin internal
consistency: the cached stepwise decode must equal the full-sequence
forward (the reference decodes M2 by full-prefix recompute — logits are
a pure function of the prefix), and the family must run end-to-end
through the registry, the decode engine, and a train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocaption_tpu.decoding.engine import SpecialTokens
from audiocaption_tpu.models.captioner import Captioner, generate
from audiocaption_tpu.models.m2 import (M2TransformerDecoder,
                                        M2TransformerEncoder)
from audiocaption_tpu.ops.frontend import CNN14_MEL_32K

V = 37
D = 64
SPECIAL = SpecialTokens(pad=0, bos=1, eos=2)


def make_m2_model(nlayers_enc=2, nlayers_dec=2):
    enc = M2TransformerEncoder(d_model=D, nlayers=nlayers_enc, nhead=2,
                               dropout=0.1, n_memory=8)
    dec = M2TransformerDecoder(emb_dim=D, vocab_size=V, attn_emb_dim=D,
                               nhead=2, dropout=0.1,
                               nlayers=nlayers_dec,
                               n_enc_levels=nlayers_enc)
    return Captioner(encoder=enc, decoder=dec, mel=CNN14_MEL_32K,
                     special=SPECIAL, input_mode="features")


def init_m2(model, B=2, T=11, Dfeat=24, Lc=7):
    rng = np.random.RandomState(0)
    attn = jnp.asarray(rng.randn(B, T, Dfeat), jnp.float32)
    attn_len = jnp.asarray([T - (i % 2) * 4 for i in range(B)])
    cap = jnp.asarray(rng.randint(3, V, (B, Lc)), jnp.int32)
    cap = cap.at[:, 0].set(SPECIAL.bos).at[:, -1].set(SPECIAL.eos)
    cap_len = jnp.asarray([Lc - (i % 2) * 2 for i in range(B)])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        attn, attn_len, cap, cap_len, train=False)
    return variables, (attn, attn_len, cap, cap_len)


def test_m2_encoder_shapes_and_levels():
    enc = M2TransformerEncoder(d_model=D, nlayers=3, nhead=2, n_memory=8)
    rng = np.random.RandomState(1)
    attn = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    attn_len = jnp.asarray([9, 5])
    v = enc.init(jax.random.PRNGKey(0), attn, attn_len)
    out = enc.apply(v, attn, attn_len)
    assert out["attn_emb"].shape == (2, 3, 9, D)     # per-level stack
    assert out["fc_emb"].shape == (2, 3, D)          # ref: mean(-2)
    # memory slots exist per layer and are never masked: padded sample
    # still yields finite outputs
    assert np.isfinite(np.asarray(out["attn_emb"])).all()


def test_m2_train_forward_shapes():
    model = make_m2_model()
    variables, (attn, attn_len, cap, cap_len) = init_m2(model)
    out = model.apply(variables, attn, attn_len, cap, cap_len,
                      ss_ratio=1.0, train=False)
    B, Lc = cap.shape
    assert out["logit"].shape == (B, Lc - 1, V)
    assert out["attn_emb"].ndim == 4


def test_m2_stepwise_matches_full_forward():
    """Cached step logits == full causal forward logits (eval mode) —
    the identity that replaces the reference's per-step full-prefix
    recompute (transformer_model.py:104-135)."""
    model = make_m2_model()
    variables, (attn, attn_len, cap, cap_len) = init_m2(model)
    dec = model.decoder
    dec_vars = {"params": variables["params"]["decoder"]}
    enc = model.apply(variables, attn, attn_len,
                      method=Captioner.encode)
    word = cap[:, :-1]
    full = dec.apply(dec_vars, word, enc["attn_emb"],
                     enc["attn_emb_len"],
                     cap_padding_mask=word == SPECIAL.pad)
    L = word.shape[1]
    static, dyn = dec.apply(dec_vars, enc["attn_emb"],
                            enc["attn_emb_len"], L,
                            method=M2TransformerDecoder.init_cache)
    step_logits = []
    for t in range(L):
        w_t = word[:, t]
        logit_t, dyn = dec.apply(dec_vars, w_t, jnp.int32(t), static, dyn,
                                 is_pad_t=w_t == SPECIAL.pad,
                                 method=M2TransformerDecoder.step)
        step_logits.append(logit_t)
    np.testing.assert_allclose(np.asarray(jnp.stack(step_logits, 1)),
                               np.asarray(full["logit"]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("method,kw", [
    ("greedy", {}),
    ("beam", {"beam_size": 3}),
    ("dbs", {"group_size": 2, "beam_size": 4}),
])
def test_m2_generate_paths(method, kw):
    model = make_m2_model()
    variables, (attn, attn_len, _, _) = init_m2(model)
    out = generate(model, variables, attn, attn_len,
                   sample_method=method, max_length=6, **kw)
    if method == "dbs":       # group_nbest default returns [B, K, L]
        assert out["seq"].shape == (2, 4, 6)
    else:
        assert out["seq"].shape == (2, 6)
    assert np.asarray(out["seq"]).dtype.kind == "i"


def test_m2_scheduled_sampling_runs():
    model = make_m2_model()
    variables, (attn, attn_len, cap, cap_len) = init_m2(model)
    out = model.apply(variables, attn, attn_len, cap, cap_len,
                      ss_ratio=0.7, train=True,
                      rngs={"sample": jax.random.PRNGKey(3),
                            "dropout": jax.random.PRNGKey(4)})
    assert out["logit"].shape == (2, cap.shape[1] - 1, V)
    assert np.isfinite(np.asarray(out["logit"])).all()


def test_m2_registry_build_and_pairing():
    from audiocaption_tpu.utils.config import build_model_from_config
    cfg = {
        "type": "captioning.models.transformer_model.M2TransformerModel",
        "args": {},
        "encoder": {
            "type": "captioning.models.transformer_encoder."
                    "M2TransformerEncoder",
            "args": {"attn_feat_dim": 24, "fc_feat_dim": 24,
                     "spec_dim": 24, "d_model": 64, "nhead": 2,
                     "nlayers": 2, "m": 8},
        },
        "decoder": {
            "type": "captioning.models.transformer_decoder."
                    "M2TransformerDecoder",
            "args": {"attn_emb_dim": 64, "fc_emb_dim": 64, "nhead": 2,
                     "nlayers": 2},
        },
    }
    model, pre = build_model_from_config(cfg, vocab_size=V)
    assert isinstance(model.encoder, M2TransformerEncoder)
    assert isinstance(model.decoder, M2TransformerDecoder)
    assert model.decoder.n_enc_levels == 2
    assert model.input_mode == "features"

    # reference compat assert (transformer_model.py:100-101): the meshed
    # decoder cannot pair with a non-M2 encoder
    bad = dict(cfg)
    bad["encoder"] = {"type": "captioning.models.encoder.RnnEncoder",
                      "args": {"hidden_size": 32}}
    with pytest.raises(ValueError):
        build_model_from_config(bad, vocab_size=V)


def test_m2_train_step_reduces_loss():
    import optax
    from audiocaption_tpu.losses import masked_token_loss

    model = make_m2_model()
    variables, (attn, attn_len, cap, cap_len) = init_m2(model, B=4)
    loss_fn = masked_token_loss("label_smoothing", 0.1)
    tx = optax.adam(3e-3)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_of(p):
            out = model.apply(
                {"params": p}, attn, attn_len, cap, cap_len,
                ss_ratio=1.0, train=False)
            return loss_fn(dict(out, tgt=cap[:, 1:], tgt_len=cap_len - 1))
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
