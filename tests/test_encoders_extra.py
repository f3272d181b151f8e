"""Shape/behavior tests for the extended encoder/decoder zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocaption_tpu.decoding import SpecialTokens, stepwise_decode
from audiocaption_tpu.models.encoders_extra import (
    AudioTransformerEncoder, Cdur5Encoder, Cdur8Encoder, Cnn6Encoder,
    Cnn10Encoder, lp_pool)
from audiocaption_tpu.models.rnn_decoder import (
    BahAttnAddFcDecoder, ConditionalBahAttnDecoder, RnnFcDecoder,
    SpecificityBahAttnDecoder)

SPECIAL = SpecialTokens(max_length=6)


@pytest.mark.parametrize("cls,fc_dim,ds", [
    (Cnn6Encoder, 512, 16), (Cnn10Encoder, 512, 16)])
def test_panns_small_encoders(cls, fc_dim, ds):
    enc = cls()
    lms = jnp.zeros((2, 201, 64))
    feat_len = jnp.asarray([201, 101])
    variables = enc.init(jax.random.PRNGKey(0), lms, feat_len)
    out = enc.apply(variables, lms, feat_len)
    assert out["fc_emb"].shape == (2, fc_dim)
    assert out["attn_emb"].shape[2] == fc_dim
    np.testing.assert_array_equal(np.asarray(out["attn_emb_len"]),
                                  [201 // ds, 101 // ds])


def test_audio_transformer_encoder_cls():
    enc = AudioTransformerEncoder(d_model=64, nlayers=1)
    attn = jnp.zeros((2, 10, 32))
    lens = jnp.asarray([10, 5])
    variables = enc.init(jax.random.PRNGKey(0), attn, lens)
    out = enc.apply(variables, attn, lens)
    assert out["attn_emb"].shape == (2, 11, 64)   # +1 cls token
    np.testing.assert_array_equal(np.asarray(out["attn_emb_len"]), [11, 6])
    np.testing.assert_allclose(np.asarray(out["fc_emb"]),
                               np.asarray(out["attn_emb"][:, 0]))


def test_lp_pool_matches_torch():
    import torch
    x = np.abs(np.random.RandomState(0).randn(1, 8, 8, 3)).astype(np.float32)
    got = np.asarray(lp_pool(jnp.asarray(x), (2, 4)))
    want = torch.nn.LPPool2d(4, (2, 4))(
        torch.as_tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4)


def test_cdur5_encoder():
    enc = Cdur5Encoder()
    lms = jnp.zeros((2, 100, 64))
    feat_len = jnp.asarray([100, 52])
    variables = enc.init(jax.random.PRNGKey(0), lms, feat_len)
    out = enc.apply(variables, lms, feat_len)
    assert out["attn_emb"].shape[-1] == 256   # BiGRU(128)
    np.testing.assert_array_equal(np.asarray(out["attn_emb_len"]),
                                  [25, 13])


def test_cdur8_encoder():
    enc = Cdur8Encoder()
    spec = jnp.zeros((2, 80, 64))
    lens = jnp.asarray([80, 40])
    variables = enc.init(jax.random.PRNGKey(0), spec, lens)
    out = enc.apply(variables, spec, lens)
    assert out["attn_emb"].shape[-1] == 512   # BiGRU(256)
    np.testing.assert_array_equal(np.asarray(out["attn_emb_len"]), [20, 10])


def _decode_with(decoder, init_kwargs=None):
    V = decoder.vocab_size
    B, S = 2, 7
    attn = jnp.asarray(np.random.RandomState(0).randn(B, S, 16),
                       jnp.float32)
    lens = jnp.asarray([7, 4])
    fc = jnp.asarray(np.random.RandomState(1).randn(B, 16), jnp.float32)
    kwargs = init_kwargs or {}

    def init_and_step(mdl):
        """Touch both init_cache and step params during init."""
        s, d = mdl.init_cache(attn, lens, fc, SPECIAL.max_length, **kwargs)
        return mdl.step(jnp.zeros((B,), jnp.int32), jnp.int32(0), s, d)

    variables = decoder.init(jax.random.PRNGKey(0), method=init_and_step)
    static, dyn = decoder.apply(variables, attn, lens, fc,
                                SPECIAL.max_length,
                                method=type(decoder).init_cache, **kwargs)

    def step_fn(word, t, d):
        return decoder.apply(variables, word, t, static, d,
                             method=type(decoder).step)
    out = stepwise_decode(step_fn, dyn, B, V, SPECIAL, method="greedy")
    return out["seq"]


@pytest.mark.parametrize("cls,kwargs", [
    (RnnFcDecoder, {}),
    (BahAttnAddFcDecoder, {}),
    (ConditionalBahAttnDecoder,
     {"condition": jnp.asarray([0.0, 1.0])}),
    (SpecificityBahAttnDecoder,
     {"condition": jnp.asarray([0.3, 0.9])}),
])
def test_decoder_variants_decode(cls, kwargs):
    dec = cls(emb_dim=16, vocab_size=19, fc_emb_dim=16, attn_emb_dim=16,
              d_model=16, dropout=0.0)
    seq = _decode_with(dec, kwargs)
    s = np.asarray(seq)
    assert s.shape == (2, SPECIAL.max_length)
    assert (s >= 0).all() and (s < 19).all()


@pytest.mark.parametrize("name,pooling", [("mn04", "mean_max_fc"),
                                          ("mn10", "mean")])
def test_mobilenet_v3_encoder(name, pooling):
    from audiocaption_tpu.models.mobilenet_v3 import MobileNetV3Encoder
    enc = MobileNetV3Encoder(model_name=name, pooling=pooling)
    lms = jnp.zeros((2, 101, 64))
    fl = jnp.asarray([101, 50])
    v = enc.init(jax.random.PRNGKey(0), lms, fl)
    out = enc.apply(v, lms, fl)
    assert out["fc_emb"].shape == (2, enc.fc_emb_size)
    np.testing.assert_array_equal(np.asarray(out["attn_emb_len"]), [3, 1])


def test_mobilenet_v3_width_mapping():
    from audiocaption_tpu.models.mobilenet_v3 import (
        NAME_TO_WIDTH, make_divisible)
    assert NAME_TO_WIDTH["mn10"] == 1.0
    assert make_divisible(16 * 0.4) == 8


@pytest.mark.parametrize("variant", ["uit_xxxs", "uit_xs"])
def test_uit_encoder(variant):
    """UIT trunk adapted to the captioning encoder contract."""
    from audiocaption_tpu.models.uit import (
        UIT_VARIANTS, UitEncoder)
    trunk = UIT_VARIANTS[variant](outputdim=537, target_length=496)
    enc = UitEncoder(trunk=trunk)
    lms = jnp.zeros((2, 501, 64))
    fl = jnp.asarray([501, 300])
    v = enc.init(jax.random.PRNGKey(0), lms, fl)
    out = enc.apply(v, lms, fl)
    assert out["attn_emb"].shape == (2, 496 // 16, 128)
    np.testing.assert_array_equal(np.asarray(out["attn_emb_len"]),
                                  [31, 18])
    assert out["fc_emb"].shape == (2, 128)


def test_uit_classifier_forward():
    """UITBase tagger: waveform -> sigmoid class probs, with eval-time
    chunking when the clip exceeds target_length (uit.py:468-492)."""
    from audiocaption_tpu.models.uit import uit_xxxs
    model = uit_xxxs(outputdim=10, target_length=102)
    wav = jnp.zeros((2, 32000))           # 2 s -> 201 frames, 2 chunks
    v = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(v, wav)
    assert out.shape == (2, 10)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
