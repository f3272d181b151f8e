"""Extended token/output parity against the ACTUAL reference package:
conditioned transformer models, FcModel's decoder, the temporal
(SED + tag) pipeline from hf_wrapper.py, and the Cnn8rnn SED network.

Same approach as tests/test_reference_parity.py: import the reference
from /root/reference (pure torch on CPU), initialize randomly, round
trip the weights through our converters, assert equality.

Reference anchors:
  * EventCondTransformerModel / EventTransformerDecoder
    (transformer_model.py:181-220, transformer_decoder.py:146-174) —
    NOTE the snapshot is internally inconsistent: the model writes
    decoder_input["events"] but the decoder reads input_dict["event"],
    so its inference path crashes as-is; the test subclass bridges the
    key (the decoder math itself is untouched).
  * KeywordCondTransformerModel / KeywordProbTransformerDecoder
    (transformer_model.py:223-264, transformer_decoder.py:177-214).
  * RnnFcDecoder (rnn_decoder.py:37-71; FcModel's decoder) — stepwise
    logit parity with threaded GRU state.  (FcModel's own decode loop
    is stale in the snapshot: the decoder emits "logits" where
    decode_step expects "logit", base.py:172-177.)
  * hf_wrapper.py SED stack: double_threshold (:117-168),
    decode_with_timestamps + segments_to_temporal_tag (:191-216),
    Cnn8rnnSedModel.forward_prob (:1791-1859), and
    TemporalBahAttnDecoder's tag-embedding t=0 step (:1502-1554).
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "captioning")),
    reason="reference repo not mounted")


def _import_reference():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "toml" not in sys.modules:
        sys.modules["toml"] = types.ModuleType("toml")
    # hf_wrapper imports efficientnet_pytorch + torchaudio, which are
    # absent here; it only *uses* them inside EffB2 construction paths
    # the tests never touch, so empty shims suffice.
    if "efficientnet_pytorch" not in sys.modules:
        shim = types.ModuleType("efficientnet_pytorch")
        shim.EfficientNet = type("EfficientNet", (), {})
        shim.utils = types.ModuleType("efficientnet_pytorch.utils")
        sys.modules["efficientnet_pytorch"] = shim
        sys.modules["efficientnet_pytorch.utils"] = shim.utils
    if "torchaudio" not in sys.modules:
        # transformers probes find_spec("torchaudio") at import time;
        # import it BEFORE the stub exists (a stub without __spec__
        # breaks find_spec with ValueError)
        import transformers  # noqa: F401
        ta = types.ModuleType("torchaudio")
        tr = types.ModuleType("torchaudio.transforms")

        # benign no-op modules: other parity tests (test_uit_parity)
        # instantiate reference classes whose __init__ constructs these
        # (the frontends themselves are never exercised)
        class _Stub(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        tr.MelSpectrogram = _Stub
        tr.AmplitudeToDB = _Stub
        ta.transforms = tr
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr
    import captioning.models.base as ref_base
    import captioning.models.transformer_model as ref_tm
    import captioning.models.transformer_decoder as ref_td
    import captioning.models.rnn_decoder as ref_rd
    import captioning.models.hf_wrapper as ref_hf
    return types.SimpleNamespace(base=ref_base, tm=ref_tm, td=ref_td,
                                 rd=ref_rd, hf=ref_hf)


REF = _import_reference()

V = 50          # vocab
A = 24          # attn/fc emb dim
B = 3           # batch
T = 9           # memory length
MAXLEN = 10
E_CLS = 527     # event classes (hardcoded in EventCondTransformerModel)
K_CLS = 13      # keyword classes


class _FeedEncoder(torch.nn.Module):
    def forward(self, input_dict):
        return {"attn_emb": input_dict["attn"],
                "attn_emb_len": input_dict["attn_len"],
                "fc_emb": input_dict["fc"]}


class _DummyFlaxEncoder:
    pass


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


def _my_generate(model, variables, attn, attn_len, fc, **kwargs):
    from audiocaption_tpu.models.captioner import generate
    enc = {"attn_emb": jnp.asarray(attn),
           "attn_emb_len": jnp.asarray(attn_len),
           "fc_emb": jnp.asarray(fc)}
    return generate(model, variables, enc_override=enc,
                    max_length=MAXLEN, **kwargs)


# ------------------------------------------------- event-conditioned model --

@pytest.fixture(scope="module")
def event_pair():
    from audiocaption_tpu.models.captioner import Captioner
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.transformer_decoder import (
        EventTransformerDecoder, convert_transformer_decoder)
    from audiocaption_tpu.ops.frontend import CNN14_MEL_32K

    torch.manual_seed(21)
    ref_dec = REF.td.EventTransformerDecoder(
        emb_dim=32, vocab_size=V, fc_emb_dim=A, attn_emb_dim=A,
        dropout=0.0, nhead=2, nlayers=2)

    class _FixedEventModel(REF.tm.EventCondTransformerModel):
        """Bridge the snapshot's events/event key mismatch
        (transformer_model.py:208-220 writes "events",
        transformer_decoder.py:153 reads "event")."""

        def prepare_decoder_input(self, input_dict, output):
            d = super().prepare_decoder_input(input_dict, output)
            d["event"] = d["events"]
            return d

        def prepare_beamsearch_decoder_input(self, input_dict, output_i):
            d = super().prepare_beamsearch_decoder_input(input_dict,
                                                         output_i)
            d["event"] = d["events"]
            return d

    ref_model = _FixedEventModel(encoder=_FeedEncoder(), decoder=ref_dec)

    sd = state_dict_to_numpy(ref_dec.state_dict())
    params = convert_transformer_decoder(sd, nlayers=2)
    params["event_embedding"] = {
        "embedding":
            ref_model.label_encoder.label_embedding.detach().numpy()}
    my_dec = EventTransformerDecoder(
        emb_dim=32, vocab_size=V, attn_emb_dim=A, dropout=0.0,
        nlayers=2, nhead=2, event_classes=E_CLS)
    model = Captioner(encoder=_DummyFlaxEncoder(), decoder=my_dec,
                      mel=CNN14_MEL_32K)
    return ref_model, model, {"params": {"decoder": params}}


def _event_probs(seed):
    rng = np.random.RandomState(seed)
    probs = rng.rand(B, E_CLS).astype(np.float32)
    probs[probs < 0.97] = 0.0          # sparse multi-hot-ish
    probs[:, 0] += 0.5                 # never all-zero
    return probs


@pytest.mark.slow
def test_event_cond_greedy_token_parity(event_pair):
    ref_model, model, variables = event_pair
    attn, attn_len, fc = _inputs(30)
    ev = _event_probs(31)
    ref = _ref_infer(ref_model, attn, attn_len, fc, sample_method="greedy",
                     events=torch.as_tensor(ev))
    out = _my_generate(model, variables, attn, attn_len, fc,
                       sample_method="greedy",
                       cond_kwargs={"event": jnp.asarray(ev)})
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  ref["seq"].numpy())


@pytest.mark.slow
def test_event_cond_beam3_token_parity(event_pair):
    ref_model, model, variables = event_pair
    attn, attn_len, fc = _inputs(32)
    ev = _event_probs(33)
    ref = _ref_infer(ref_model, attn, attn_len, fc, sample_method="beam",
                     beam_size=3, events=torch.as_tensor(ev))
    out = _my_generate(model, variables, attn, attn_len, fc,
                       sample_method="beam", beam_size=3,
                       cond_kwargs={"event": jnp.asarray(ev)})
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  ref["seq"].numpy())


# ----------------------------------------------- keyword-conditioned model --

@pytest.fixture(scope="module")
def keyword_pair():
    from audiocaption_tpu.models.captioner import Captioner
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models import convert
    from audiocaption_tpu.models.transformer_decoder import (
        KeywordProbTransformerDecoder, convert_transformer_decoder)
    from audiocaption_tpu.ops.frontend import CNN14_MEL_32K

    torch.manual_seed(23)
    ref_dec = REF.td.KeywordProbTransformerDecoder(
        emb_dim=32, vocab_size=V, fc_emb_dim=A, attn_emb_dim=A,
        dropout=0.0, keyword_classes_num=K_CLS, nhead=2, nlayers=2)
    ref_model = REF.tm.KeywordCondTransformerModel(encoder=_FeedEncoder(),
                                                   decoder=ref_dec)
    sd = state_dict_to_numpy(ref_dec.state_dict())
    params = convert_transformer_decoder(sd, nlayers=2)
    params["keyword_proj"] = convert.linear(sd, "keyword_proj")
    params["word_keyword_norm"] = convert.layernorm(sd, "word_keyword_norm")
    my_dec = KeywordProbTransformerDecoder(
        emb_dim=32, vocab_size=V, attn_emb_dim=A, dropout=0.0,
        nlayers=2, nhead=2, keyword_classes_num=K_CLS)
    model = Captioner(encoder=_DummyFlaxEncoder(), decoder=my_dec,
                      mel=CNN14_MEL_32K)
    return ref_model, model, {"params": {"decoder": params}}


@pytest.mark.slow
def test_keyword_cond_greedy_token_parity(keyword_pair):
    ref_model, model, variables = keyword_pair
    attn, attn_len, fc = _inputs(40)
    kw = np.random.RandomState(41).rand(B, K_CLS).astype(np.float32)
    ref = _ref_infer(ref_model, attn, attn_len, fc, sample_method="greedy",
                     keyword=torch.as_tensor(kw))
    out = _my_generate(model, variables, attn, attn_len, fc,
                       sample_method="greedy",
                       cond_kwargs={"event": jnp.asarray(kw)})
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  ref["seq"].numpy())


@pytest.mark.slow
def test_keyword_cond_beam3_token_parity(keyword_pair):
    ref_model, model, variables = keyword_pair
    attn, attn_len, fc = _inputs(42)
    kw = np.random.RandomState(43).rand(B, K_CLS).astype(np.float32)
    ref = _ref_infer(ref_model, attn, attn_len, fc, sample_method="beam",
                     beam_size=3, keyword=torch.as_tensor(kw))
    out = _my_generate(model, variables, attn, attn_len, fc,
                       sample_method="beam", beam_size=3,
                       cond_kwargs={"event": jnp.asarray(kw)})
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  ref["seq"].numpy())


# --------------------------------------------------- FcModel's RnnFcDecoder --

@pytest.mark.slow
def test_rnn_fc_decoder_step_logits():
    """Three chained steps (threaded GRU state) match the reference
    RnnFcDecoder stepwise forward (rnn_decoder.py:37-71)."""
    from audiocaption_tpu.models import convert
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.rnn_decoder import RnnFcDecoder

    torch.manual_seed(27)
    ref_dec = REF.rd.RnnFcDecoder(emb_dim=20, vocab_size=V, fc_emb_dim=A,
                                  attn_emb_dim=A, dropout=0.0, d_model=28)
    ref_dec.eval()
    sd = state_dict_to_numpy(ref_dec.state_dict())
    params = {
        "word_embedding": convert.embedding(sd, "word_embedding"),
        "model": convert.gru_cell_stack(sd, "model", 1),
        "fc_proj": convert.linear(sd, "fc_proj"),
        "classifier": convert.linear(sd, "classifier"),
    }
    dec = RnnFcDecoder(emb_dim=20, vocab_size=V, fc_emb_dim=A,
                       d_model=28, dropout=0.0)
    dec_vars = {"params": params}

    rng = np.random.RandomState(5)
    fc = rng.randn(B, A).astype(np.float32)
    words = [np.full((B,), 1, np.int64),
             np.array([4, 9, 17], np.int64),
             np.array([30, 2, 8], np.int64)]

    static, dyn = dec.apply(dec_vars, None, None, jnp.asarray(fc), MAXLEN,
                            method=RnnFcDecoder.init_cache)
    state = None
    for t, w in enumerate(words):
        with torch.no_grad():
            d = {"word": torch.as_tensor(w)[:, None],
                 "fc_emb": torch.as_tensor(fc)[:, None, :]}
            if state is not None:
                d["state"] = state
            r = ref_dec(d)
            state = r["state"]
        logit, dyn = dec.apply(dec_vars, jnp.asarray(w), jnp.int32(t),
                               static, dyn, method=RnnFcDecoder.step)
        np.testing.assert_allclose(np.asarray(logit),
                                   r["logits"][:, 0].numpy(), atol=2e-5)


# ------------------------------------------------------ SED / temporal tags --

@pytest.mark.slow
def test_double_threshold_parity():
    rng = np.random.RandomState(8)
    x = rng.rand(4, 50, 6).astype(np.float32)
    x[0, 10:20, 1] = 0.9            # a clean high region
    x[1, :, :] = 0.3                # all below high -> empty
    ref = REF.hf.double_threshold(x, 0.75, 0.25)
    mine = __import__(
        "audiocaption_tpu.models.sed", fromlist=["double_threshold"]
    ).double_threshold(x, 0.75, 0.25)
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.slow
def test_temporal_tag_pipeline_parity():
    """framewise probs -> tag matches the reference pipeline
    (hf_wrapper.py:1810-1818: double_threshold -> decode_with_timestamps
    -> segments_to_temporal_tag)."""
    from audiocaption_tpu.models.sed import framewise_to_temporal_tags
    rng = np.random.RandomState(9)
    x = np.zeros((6, 80, 5), np.float32)
    # craft overlapping / sequential / single activations + noise
    x[0, 5:30, 0] = 0.9                                 # single event
    x[1, 5:30, 0] = 0.9; x[1, 10:40, 1] = 0.85          # simultaneous
    x[2, 5:20, 0] = 0.9; x[2, 50:70, 1] = 0.85          # sequential
    x[3, 5:30, 0] = 0.9; x[3, 20:40, 1] = 0.85
    x[3, 60:75, 2] = 0.95                               # complex
    x[4] = rng.rand(80, 5) * 0.6                        # sub-threshold
    x[5] = rng.rand(80, 5)                              # noisy
    thresholded = REF.hf.double_threshold(x, 0.75, 0.25)
    ref_tags = REF.hf.decode_with_timestamps(thresholded, 0.01)
    mine = framewise_to_temporal_tags(x)
    np.testing.assert_array_equal(mine, np.asarray(ref_tags))


@pytest.mark.slow
def test_cnn8rnn_sed_forward_prob_parity():
    """Cnn8rnnSedModel.forward_prob (hf_wrapper.py:1820-1859) framewise
    probabilities match with converted weights."""
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.sed import Cnn8RnnSedModel, convert_cnn8rnn

    torch.manual_seed(31)
    classes = 9
    ref = REF.hf.Cnn8rnnSedModel(classes_num=classes)
    ref.eval()
    params, stats = convert_cnn8rnn(state_dict_to_numpy(ref.state_dict()))
    mine = Cnn8RnnSedModel(classes_num=classes)

    rng = np.random.RandomState(12)
    lms = rng.randn(2, 16, 64).astype(np.float32) * 3.0
    with torch.no_grad():
        ref_out = ref.forward_prob(
            torch.as_tensor(lms).transpose(1, 2))   # ref takes [B, mel, T]
    out = mine.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(lms), train=False)
    np.testing.assert_allclose(
        np.asarray(out["framewise_output"]),
        ref_out["framewise_output"].numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["segmentwise_output"]),
        ref_out["segmentwise_output"].numpy(), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_temporal_bahattn_decoder_step_logits():
    """TemporalBahAttnDecoder (hf_wrapper.py:1502-1554): t=0 uses the
    temporal-tag embedding instead of <bos>, later steps the word
    embedding; GRU state + attention threaded across steps."""
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.rnn_decoder import (
        TemporalBahAttnDecoder, convert_bahattn_decoder)

    torch.manual_seed(33)
    ref_dec = REF.hf.TemporalBahAttnDecoder(
        emb_dim=20, vocab_size=V, fc_emb_dim=A, attn_emb_dim=A,
        dropout=0.0, d_model=28)
    ref_dec.eval()
    sd = state_dict_to_numpy(ref_dec.state_dict())
    params = convert_bahattn_decoder(sd, temporal=True)
    dec = TemporalBahAttnDecoder(emb_dim=20, vocab_size=V, fc_emb_dim=A,
                                 attn_emb_dim=A, d_model=28, dropout=0.0)
    dec_vars = {"params": params}

    attn, attn_len, fc = _inputs(13)
    tags = np.array([0, 2, 3], np.int64)
    static, dyn = dec.apply(dec_vars, jnp.asarray(attn),
                            jnp.asarray(attn_len), jnp.asarray(fc), MAXLEN,
                            temporal_tag=jnp.asarray(tags, jnp.int32),
                            method=TemporalBahAttnDecoder.init_cache)
    words = [np.full((B,), 1, np.int64),          # ignored at t=0
             np.array([4, 9, 17], np.int64),
             np.array([30, 2, 8], np.int64)]
    state = None
    for t, w in enumerate(words):
        with torch.no_grad():
            d = {"word": torch.as_tensor(w)[:, None],
                 "fc_emb": torch.as_tensor(fc),
                 "attn_emb": torch.as_tensor(attn),
                 "attn_emb_len": torch.as_tensor(attn_len),
                 "temporal_tag": torch.as_tensor(tags),
                 "t": t}
            if state is not None:
                d["state"] = state
            r = ref_dec(d)
            state = r["state"]
        logit, dyn = dec.apply(dec_vars, jnp.asarray(w), jnp.int32(t),
                               static, dyn,
                               method=TemporalBahAttnDecoder.step)
        np.testing.assert_allclose(np.asarray(logit),
                                   r["logit"][:, 0].numpy(), atol=2e-5)
