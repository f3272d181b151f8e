"""Pallas fused log-mel kernel vs the XLA frontend (interpret mode on
CPU; the TPU compile path is exercised by bench/TPU runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    import audiocaption_tpu.ops.pallas_logmel as P
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(P.pl, "pallas_call", patched)
    # clear jit cache so the interpreted version compiles fresh
    P.pallas_logmel._clear_cache()
    yield P
    P.pallas_logmel._clear_cache()


@pytest.mark.parametrize("cfg_name", ["EFFB2_MEL_16K", "CNN14_MEL_32K"])
def test_pallas_logmel_matches_frontend(interpreted_pallas, cfg_name):
    from audiocaption_tpu.ops import frontend as F
    cfg = getattr(F, cfg_name)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, cfg.sample_rate).astype(np.float32))
    want = np.asarray(F.LogMelFrontend(cfg)(wav))
    got = np.asarray(interpreted_pallas.pallas_logmel(wav, cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pallas_logmel_multi_tile(interpreted_pallas):
    """> 128 frames -> multiple grid tiles along time."""
    from audiocaption_tpu.ops import frontend as F
    cfg = F.EFFB2_MEL_16K
    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(1, 3 * cfg.sample_rate).astype(np.float32))
    want = np.asarray(F.LogMelFrontend(cfg)(wav))   # 301 frames, 3 tiles
    got = np.asarray(interpreted_pallas.pallas_logmel(wav, cfg))
    assert got.shape[1] == 301
    np.testing.assert_allclose(got, want, atol=2e-4)
