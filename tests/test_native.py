"""Native C++ CIDEr-D scorer vs the pure-Python implementation."""

import numpy as np
import pytest

from audiocaption_tpu.metrics.cider import CiderD
from audiocaption_tpu.native import FastCiderD, native_available


REFS = {
    "a": ["a dog barks loudly in the park",
          "a dog is barking in a park",
          "dogs bark loudly outside today"],
    "b": ["water flows down a small stream",
          "a stream of water is flowing"],
    "c": ["someone plays a guitar melody softly",
          "a person plays guitar"],
}
PREDS = {
    "a": ["a dog barks loudly in the park"],
    "b": ["water is flowing down a stream"],
    "c": ["someone plays a nice guitar melody"],
}


def test_native_builds():
    assert native_available(), "g++ build of libcider.so failed"


def test_fast_cider_matches_python():
    py_mean, py_scores = CiderD().compute_score(REFS, PREDS)
    c_mean, c_scores = FastCiderD().compute_score(REFS, PREDS)
    np.testing.assert_allclose(c_scores, py_scores, rtol=1e-6)
    np.testing.assert_allclose(c_mean, py_mean, rtol=1e-6)


def test_fast_cider_random_corpus():
    rng = np.random.RandomState(0)
    vocab = [f"w{i}" for i in range(40)]
    refs, preds = {}, {}
    for i in range(30):
        k = f"k{i}"
        refs[k] = [" ".join(rng.choice(vocab, rng.randint(4, 12)))
                   for _ in range(rng.randint(2, 5))]
        preds[k] = [" ".join(rng.choice(vocab, rng.randint(4, 12)))]
    py_mean, py_scores = CiderD().compute_score(refs, preds)
    c_mean, c_scores = FastCiderD().compute_score(refs, preds)
    np.testing.assert_allclose(c_scores, py_scores, rtol=1e-5, atol=1e-8)


def test_fast_cider_speed():
    import time
    rng = np.random.RandomState(1)
    vocab = [f"w{i}" for i in range(100)]
    refs, preds = {}, {}
    for i in range(200):
        k = f"k{i}"
        refs[k] = [" ".join(rng.choice(vocab, 10)) for _ in range(5)]
        preds[k] = [" ".join(rng.choice(vocab, 10))]
    t0 = time.perf_counter()
    FastCiderD().compute_score(refs, preds)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    CiderD().compute_score(refs, preds)
    t_py = time.perf_counter() - t0
    # sanity: the native path should not be slower
    assert t_native < t_py
