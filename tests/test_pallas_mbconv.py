"""Fused MBConv kernel: interpret-mode parity vs the flax MBConvBlock
and the XLA folded-weight fallback (experimental encoder path; see
NOTES_ROUND1.md for TPU status)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture()
def PM(monkeypatch):
    import audiocaption_tpu.ops.pallas_mbconv as mod
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(mod.pl, "pallas_call", patched)
    return mod


def _block_case(PM, in_ch, out_ch, expand, kernel, stride, pad, H, W,
                seed):
    from audiocaption_tpu.models.effb2 import MBConvBlock
    spec = PM.MBConvSpec(
        in_ch, out_ch, in_ch * expand, kernel, stride, pad,
        has_expand=expand != 1,
        has_residual=(stride == 1 and in_ch == out_ch))
    blk = MBConvBlock(in_filters=in_ch, out_filters=out_ch, kernel=kernel,
                      stride=stride, expand_ratio=expand, nominal_size=130,
                      drop_rate=0.0)
    x = jnp.asarray(
        np.random.RandomState(seed).randn(2, H, W, in_ch).astype(
            np.float32))
    v = blk.init(jax.random.PRNGKey(seed), x)
    ref = np.asarray(blk.apply(v, x))
    weights = {k: jnp.asarray(w) for k, w in PM.pack_mbconv(
        jax.device_get(v["params"]), jax.device_get(v["batch_stats"]),
        spec).items()}
    return spec, x, weights, ref


def test_fused_s1_expand_residual(PM):
    spec, x, w, ref = _block_case(PM, 16, 16, 6, 3, 1, (1, 1, 1, 1),
                                  16, 21, 0)
    got = np.asarray(PM.fused_mbconv_s1(x, w, spec))
    np.testing.assert_allclose(got, ref, atol=2e-6)
    got_xla = np.asarray(PM.xla_mbconv(x, w, spec))
    np.testing.assert_allclose(got_xla, ref, atol=2e-6)


def test_fused_s1_k5_no_expand(PM):
    spec, x, w, ref = _block_case(PM, 32, 16, 1, 5, 1, (2, 2, 2, 2),
                                  8, 17, 1)
    got = np.asarray(PM.fused_mbconv_s1(x, w, spec))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_xla_fallback_stride2(PM):
    spec, x, w, ref = _block_case(PM, 16, 24, 6, 3, 2, (0, 1, 0, 1),
                                  16, 22, 3)
    got = np.asarray(PM.xla_mbconv(x, w, spec))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_fold_bn_identity(PM):
    k = np.random.RandomState(0).randn(4, 5).astype(np.float32)
    bn_p = {"scale": np.ones(5), "bias": np.zeros(5)}
    bn_s = {"mean": np.zeros(5), "var": np.ones(5) - 1e-3}
    kf, bf = PM.fold_bn(k, None, bn_p, bn_s)
    np.testing.assert_allclose(kf, k, rtol=1e-5)
    np.testing.assert_allclose(bf, np.zeros(5), atol=1e-6)
