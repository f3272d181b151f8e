"""Fused beam-search kernel: interpret-mode token parity vs the XLA
decoding engine (which is itself parity-tested against the reference's
per-sample beam search in test_reference_parity.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from test_fused_greedy import _small_model


@pytest.fixture()
def interp(monkeypatch):
    import audiocaption_tpu.decoding.fused_beam as FB
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FB.pl, "pallas_call", patched)
    FB._fused_beam_call._clear_cache()
    yield FB
    FB._fused_beam_call._clear_cache()


@pytest.mark.slow
def test_fused_beam_interpret_token_parity(interp):
    from audiocaption_tpu.models.captioner import generate
    model, variables = _small_model()
    wav = jnp.asarray(np.random.RandomState(0).randn(3, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000, 12000])
    ref = generate(model, variables, wav, lens, sample_method="beam",
                   beam_size=3, max_length=8, n_best=True, n_best_size=3)
    fb = interp.FusedBeamDecoder(model, variables, max_length=8,
                                 beam_size=3)
    seq, score = fb(wav, lens, n_best=True)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(ref["seq"]))
    np.testing.assert_allclose(np.asarray(score),
                               np.asarray(ref["score"]), atol=1e-4)


@pytest.mark.slow
def test_fused_beam_bf16_cache_token_parity(interp):
    """bf16 K/V cache storage (the serving configuration: halves VMEM,
    doubles the kernel batch) with f32 accumulate: token-identical to
    the engine on a well-separated model; scores within bf16 rounding."""
    from audiocaption_tpu.models.captioner import generate
    model, variables = _small_model()
    wav = jnp.asarray(np.random.RandomState(3).randn(3, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000, 12000])
    ref = generate(model, variables, wav, lens, sample_method="beam",
                   beam_size=3, max_length=8, n_best=True, n_best_size=3)
    fb = interp.FusedBeamDecoder(model, variables, max_length=8,
                                 beam_size=3, cache_bf16=True)
    assert fb.max_kernel_batch == 128
    seq, score = fb(wav, lens, n_best=True)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(ref["seq"]))
    np.testing.assert_allclose(np.asarray(score),
                               np.asarray(ref["score"]), atol=5e-2)


@pytest.mark.slow
def test_fused_beam_chunked_parity(interp):
    """B > max_kernel_batch, B NOT a multiple of it (regression: the
    unclamped slice raised at trace time): one full-batch encode,
    kernel per memory slice — beams and scores must match the
    whole-batch engine."""
    from audiocaption_tpu.models.captioner import generate
    from test_fused_greedy import _small_model
    model, variables = _small_model()
    wav = jnp.asarray(np.random.RandomState(2).randn(5, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000, 12000, 7000, 15000])
    ref = generate(model, variables, wav, lens, sample_method="beam",
                   beam_size=2, max_length=6, n_best=True, n_best_size=2)
    fb = interp.FusedBeamDecoder(model, variables, max_length=6,
                                 beam_size=2, max_kernel_batch=2)
    seq, score = fb(wav, lens, n_best=True)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(ref["seq"]))
    np.testing.assert_allclose(np.asarray(score),
                               np.asarray(ref["score"]), atol=1e-4)


def test_fused_beam_bake_params_modes_token_identical(interp):
    """Baked (constant-folded params) and traced (params as jit args)
    modes of the fused beam decoder decode identically, including the
    chunked path."""
    model, variables = _small_model()
    wav = jnp.asarray(np.random.RandomState(3).randn(3, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000, 12000])
    fb_auto = interp.FusedBeamDecoder(model, variables, max_length=8,
                                      beam_size=2)
    assert fb_auto.bake_params
    fb_traced = interp.FusedBeamDecoder(model, variables, max_length=8,
                                        beam_size=2, bake_params=False)
    fb_traced.max_kernel_batch = 2        # exercise the chunked path too
    np.testing.assert_array_equal(np.asarray(fb_auto(wav, lens)),
                                  np.asarray(fb_traced(wav, lens)))
