import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.ops import (
    length_mask, mean_with_lens, max_with_lens, masked_softmax)


def test_length_mask():
    mask = length_mask(jnp.array([0, 2, 5]), 4)
    expected = np.array([
        [False, False, False, False],
        [True, True, False, False],
        [True, True, True, True],
    ])
    np.testing.assert_array_equal(np.asarray(mask), expected)


def test_mean_with_lens_matches_manual():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 7, 5).astype(np.float32)
    lens = np.array([7, 3, 1])
    got = np.asarray(mean_with_lens(jnp.asarray(x), jnp.asarray(lens)))
    want = np.stack([x[i, :lens[i]].mean(0) for i in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_max_with_lens_matches_manual():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 6, 3).astype(np.float32)
    lens = np.array([6, 2, 4, 1])
    got = np.asarray(max_with_lens(jnp.asarray(x), jnp.asarray(lens)))
    want = np.stack([x[i, :lens[i]].max(0) for i in range(4)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mean_with_lens_2d_features():
    x = jnp.asarray([[1.0, 2.0, 30.0], [4.0, 5.0, 6.0]])
    lens = jnp.asarray([2, 3])
    got = np.asarray(mean_with_lens(x, lens))
    np.testing.assert_allclose(got, [1.5, 5.0], rtol=1e-6)


def test_masked_softmax_ignores_padding():
    scores = jnp.asarray([[1.0, 100.0, 2.0]])
    mask = jnp.asarray([[True, False, True]])
    w = np.asarray(masked_softmax(scores, mask))
    assert w[0, 1] < 1e-6
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-6)
