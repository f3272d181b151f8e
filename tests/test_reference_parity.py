"""Token-for-token parity against the ACTUAL reference implementation.

The strongest parity evidence available without network egress: import
`/root/reference/captioning` (pure torch, runs on CPU), build reference
models with random weights, copy those weights through our converters,
and assert the decoded token sequences are identical.

Covered (reference anchors):
  * TransformerModel greedy + beam-3       (base.py:152-325,
    transformer_model.py:11-86)
  * Seq2SeqAttnModel greedy + beam-3 + DBS (attn_model.py:10-189,
    base.py:363-471)
  * TransformerDecoder full-seq logits     (transformer_decoder.py:80-103)
  * BahAttnCatFcDecoder single-step logits (rnn_decoder.py:159-215)

The reference snapshot has stale imports (style_model.py:6-7 names
captioning.models.base_model / .utils which no longer exist) and pulls
packages absent from this environment at import time (toml); tiny shims
are installed for those so the *models under test* are the reference's
own code.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "captioning")),
    reason="reference repo not mounted")


def _import_reference():
    """Import the reference captioning package with shims for deps that
    are absent here and for its own stale-module imports."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "toml" not in sys.modules:
        sys.modules["toml"] = types.ModuleType("toml")
    import captioning.models.base as ref_base
    # style_model.py:6-7 imports modules that no longer exist in the
    # snapshot; point them at the current locations.
    if "captioning.models.base_model" not in sys.modules:
        shim = types.ModuleType("captioning.models.base_model")
        shim.CaptionModel = ref_base.CaptionModel
        sys.modules["captioning.models.base_model"] = shim
    if "captioning.models.utils" not in sys.modules:
        import captioning.utils.model_util as ref_mu
        shim = types.ModuleType("captioning.models.utils")
        for name in dir(ref_mu):
            if not name.startswith("_"):
                setattr(shim, name, getattr(ref_mu, name))
        sys.modules["captioning.models.utils"] = shim
    import captioning.models.transformer_model as ref_tm
    import captioning.models.transformer_decoder as ref_td
    import captioning.models.attn_model as ref_am
    import captioning.models.rnn_decoder as ref_rd
    return types.SimpleNamespace(base=ref_base, tm=ref_tm, td=ref_td,
                                 am=ref_am, rd=ref_rd)


REF = _import_reference()

V = 50          # vocab
A = 24          # attn_emb dim
B = 3           # batch
T = 9           # memory length
MAXLEN = 12


class _FeedEncoder(torch.nn.Module):
    """Test fixture: reference encoders consume the input dict and emit
    {fc_emb, attn_emb, attn_emb_len} (base.py:73-75); this one feeds
    precomputed embeddings straight through."""

    def forward(self, input_dict):
        return {"attn_emb": input_dict["attn"],
                "attn_emb_len": input_dict["attn_len"],
                "fc_emb": input_dict["fc"]}


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    attn = rng.randn(B, T, A).astype(np.float32)
    attn_len = np.array([T, 5, 7], np.int64)
    fc = rng.randn(B, A).astype(np.float32)
    return attn, attn_len, fc


def _ref_infer(model, attn, attn_len, fc, **kwargs):
    REF.base.CaptionModel.set_index(1, 2, 0)
    model.eval()
    d = {"mode": "inference",
         "attn": torch.as_tensor(attn),
         "attn_len": torch.as_tensor(attn_len),
         "fc": torch.as_tensor(fc),
         "max_length": MAXLEN}
    d.update(kwargs)
    with torch.no_grad():
        return model(d)


# --------------------------------------------------------------- fixtures --

@pytest.fixture(scope="module")
def transformer_pair():
    """(reference TransformerModel, our Captioner + converted variables)."""
    from audiocaption_tpu.models.captioner import Captioner
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.transformer_decoder import (
        TransformerDecoder, convert_transformer_decoder)
    from audiocaption_tpu.ops.frontend import CNN14_MEL_32K

    torch.manual_seed(7)
    ref_dec = REF.td.TransformerDecoder(
        emb_dim=64, vocab_size=V, fc_emb_dim=A, attn_emb_dim=A,
        dropout=0.0, nhead=2, nlayers=2)
    ref_model = REF.tm.TransformerModel(encoder=_FeedEncoder(),
                                        decoder=ref_dec)
    sd = state_dict_to_numpy(ref_dec.state_dict())
    params = convert_transformer_decoder(sd, nlayers=2)
    my_dec = TransformerDecoder(emb_dim=64, vocab_size=V, attn_emb_dim=A,
                                dropout=0.0, nlayers=2, nhead=2)
    model = Captioner(encoder=_DummyFlaxEncoder(), decoder=my_dec,
                      mel=CNN14_MEL_32K)
    variables = {"params": {"decoder": params}}
    return ref_model, model, variables


@pytest.fixture(scope="module")
def rnn_pair():
    from audiocaption_tpu.models.captioner import Captioner
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.rnn_decoder import (
        BahAttnCatFcDecoder, convert_bahattn_decoder)
    from audiocaption_tpu.ops.frontend import CNN14_MEL_32K

    torch.manual_seed(11)
    ref_dec = REF.rd.BahAttnCatFcDecoder(
        emb_dim=32, vocab_size=V, fc_emb_dim=A, attn_emb_dim=A,
        dropout=0.0, d_model=40)
    ref_model = REF.am.Seq2SeqAttnModel(encoder=_FeedEncoder(),
                                        decoder=ref_dec)
    sd = state_dict_to_numpy(ref_dec.state_dict())
    params = convert_bahattn_decoder(sd)
    my_dec = BahAttnCatFcDecoder(emb_dim=32, vocab_size=V, fc_emb_dim=A,
                                 attn_emb_dim=A, d_model=40, dropout=0.0)
    model = Captioner(encoder=_DummyFlaxEncoder(), decoder=my_dec,
                      mel=CNN14_MEL_32K)
    variables = {"params": {"decoder": params}}
    return ref_model, model, variables


class _DummyFlaxEncoder:
    """Captioner.encoder placeholder; decode uses enc_override so the
    encoder is never applied."""
    pass


def _my_generate(model, variables, attn, attn_len, fc, **kwargs):
    from audiocaption_tpu.models.captioner import generate
    enc = {"attn_emb": jnp.asarray(attn),
           "attn_emb_len": jnp.asarray(attn_len),
           "fc_emb": jnp.asarray(fc)}
    return generate(model, variables, enc_override=enc,
                    max_length=MAXLEN, **kwargs)


# ------------------------------------------------------------ decode parity

def test_transformer_greedy_token_parity(transformer_pair):
    ref_model, model, variables = transformer_pair
    attn, attn_len, fc = _inputs(0)
    ref = _ref_infer(ref_model, attn, attn_len, fc, sample_method="greedy")
    out = _my_generate(model, variables, attn, attn_len, fc,
                       sample_method="greedy")
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  ref["seq"].numpy())


def test_transformer_beam3_token_parity(transformer_pair):
    ref_model, model, variables = transformer_pair
    attn, attn_len, fc = _inputs(1)
    ref = _ref_infer(ref_model, attn, attn_len, fc, sample_method="beam",
                     beam_size=3)
    out = _my_generate(model, variables, attn, attn_len, fc,
                       sample_method="beam", beam_size=3)
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  ref["seq"].numpy())


def test_rnn_greedy_token_parity(rnn_pair):
    ref_model, model, variables = rnn_pair
    attn, attn_len, fc = _inputs(2)
    ref = _ref_infer(ref_model, attn, attn_len, fc, sample_method="greedy")
    out = _my_generate(model, variables, attn, attn_len, fc,
                       sample_method="greedy")
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  ref["seq"].numpy())


def test_rnn_beam3_token_parity(rnn_pair):
    ref_model, model, variables = rnn_pair
    attn, attn_len, fc = _inputs(3)
    ref = _ref_infer(ref_model, attn, attn_len, fc, sample_method="beam",
                     beam_size=3)
    out = _my_generate(model, variables, attn, attn_len, fc,
                       sample_method="beam", beam_size=3)
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  ref["seq"].numpy())


def test_rnn_dbs_token_parity(rnn_pair):
    """Diverse beam search, beam 6 / 3 groups, group_nbest output
    (base.py:363-471): [B, 6, L], group-major, per-group score-sorted.

    The snapshot's Seq2SeqAttnModel.prepare_dbs_decoder_input is broken
    (it unsqueezes fc_emb to [bdash, 1, D] which the decoder unsqueezes
    again, attn_model.py:160 + rnn_decoder.py:204) — the test subclass
    un-does that extra dim so the reference's core DBS loop
    (base.py:363-471) actually runs; the loop itself is untouched."""
    ref_model, model, variables = rnn_pair

    class _FixedDbs(type(ref_model)):
        def prepare_dbs_decoder_input(self, input_dict, output_i):
            d = super().prepare_dbs_decoder_input(input_dict, output_i)
            if d["fc_emb"].dim() == 3:
                d["fc_emb"] = d["fc_emb"].squeeze(1)
            return d

    fixed = _FixedDbs(encoder=ref_model.encoder, decoder=ref_model.decoder)
    attn, attn_len, fc = _inputs(4)
    ref = _ref_infer(fixed, attn, attn_len, fc, sample_method="dbs",
                     beam_size=6, group_size=3, diversity_lambda=0.5,
                     group_nbest=True)
    out = _my_generate(model, variables, attn, attn_len, fc,
                       sample_method="dbs", beam_size=6, group_size=3,
                       diversity_lambda=0.5, group_nbest=True)
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  ref["seq"].numpy())


# ------------------------------------------------------------ logit parity

def test_transformer_decoder_seq_logits(transformer_pair):
    """Full-sequence teacher-forcing forward matches the reference
    decoder numerically (transformer_decoder.py:80-103)."""
    ref_model, model, variables = transformer_pair
    attn, attn_len, fc = _inputs(5)
    rng = np.random.RandomState(6)
    word = rng.randint(3, V, (B, 7)).astype(np.int64)
    word[:, 0] = 1
    word[1, 5:] = 0  # pad tail exercises cap_padding_mask
    pad_mask = word == 0

    with torch.no_grad():
        ref_out = ref_model.decoder({
            "word": torch.as_tensor(word),
            "attn_emb": torch.as_tensor(attn),
            "attn_emb_len": torch.as_tensor(attn_len),
            "cap_padding_mask": torch.as_tensor(pad_mask)})

    my_out = model.decoder.apply(
        {"params": variables["params"]["decoder"]},
        jnp.asarray(word), jnp.asarray(attn), jnp.asarray(attn_len),
        cap_padding_mask=jnp.asarray(pad_mask))
    np.testing.assert_allclose(np.asarray(my_out["logit"]),
                               ref_out["logit"].numpy(),
                               atol=2e-5, rtol=1e-5)


def test_bahattn_decoder_step_logits(rnn_pair):
    """Two chained decode steps match the reference decoder's stepwise
    forward incl. the carried GRU state (rnn_decoder.py:183-215)."""
    ref_model, model, variables = rnn_pair
    attn, attn_len, fc = _inputs(7)
    dec = model.decoder
    dec_vars = {"params": variables["params"]["decoder"]}

    static, dyn = dec.apply(dec_vars, jnp.asarray(attn),
                            jnp.asarray(attn_len), jnp.asarray(fc), MAXLEN,
                            method=type(dec).init_cache)
    w0 = np.full((B,), 1, np.int64)
    w1 = np.array([4, 9, 17], np.int64)

    with torch.no_grad():
        r0 = ref_model.decoder({"word": torch.as_tensor(w0)[:, None],
                                "fc_emb": torch.as_tensor(fc),
                                "attn_emb": torch.as_tensor(attn),
                                "attn_emb_len": torch.as_tensor(attn_len)})
        r1 = ref_model.decoder({"word": torch.as_tensor(w1)[:, None],
                                "state": r0["state"],
                                "fc_emb": torch.as_tensor(fc),
                                "attn_emb": torch.as_tensor(attn),
                                "attn_emb_len": torch.as_tensor(attn_len)})

    l0, dyn = dec.apply(dec_vars, jnp.asarray(w0), jnp.int32(0), static, dyn,
                        method=type(dec).step)
    l1, dyn = dec.apply(dec_vars, jnp.asarray(w1), jnp.int32(1), static, dyn,
                        method=type(dec).step)
    np.testing.assert_allclose(np.asarray(l0),
                               r0["logit"][:, 0].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l1),
                               r1["logit"][:, 0].numpy(), atol=2e-5)
