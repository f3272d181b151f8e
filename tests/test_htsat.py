"""HTSAT Swin audio encoder tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiocaption_tpu.models.htsat import (
    HtsatEncoder, _shift_mask, relative_position_index, window_partition,
    window_reverse)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3))
    w = window_partition(x, 8)
    assert w.shape == (2 * 4, 64, 3)
    back = window_reverse(w, 8, 16, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_range():
    idx = relative_position_index(8)
    assert idx.shape == (64, 64)
    assert idx.min() >= 0 and idx.max() < 15 * 15
    # symmetric pairs map to mirrored offsets: diag is the center index
    assert (np.diag(idx) == idx[0, 0]).all()


def test_shift_mask_blocks():
    mask = _shift_mask(16, 16, 8, 4)
    assert mask.shape == (4, 64, 64)
    # unshifted interior window has no masking
    assert (mask[0] == 0).all()
    # boundary windows mask cross-region attention
    assert (mask[-1] < 0).any()


@pytest.mark.slow
def test_htsat_encoder_shapes():
    enc = HtsatEncoder()
    lms = jnp.asarray(np.random.RandomState(0).randn(1, 1001, 64),
                      jnp.float32)
    fl = jnp.asarray([1001])
    v = enc.init(jax.random.PRNGKey(0), lms, fl)
    out = enc.apply(v, lms, fl)
    assert out["attn_emb"].shape == (1, 32, 768)
    assert out["fc_emb"].shape == (1, 768)
    assert int(out["attn_emb_len"][0]) == 31
    n = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    assert 25e6 < n < 30e6   # HTSAT-base ~28M params


@pytest.mark.slow
def test_htsat_short_audio_interpolates():
    enc = HtsatEncoder()
    lms = jnp.zeros((1, 501, 64))        # 5 s -> interpolated to 1024
    v = enc.init(jax.random.PRNGKey(0), lms, jnp.asarray([501]))
    out = enc.apply(v, lms, jnp.asarray([501]))
    assert out["attn_emb"].shape == (1, 32, 768)
    assert int(out["attn_emb_len"][0]) == 501 // 32
