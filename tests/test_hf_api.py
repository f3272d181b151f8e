"""HF-style public API tests (the reference's parity surface,
hf_wrapper.py:1162-1181 / 1942-1973) and SED tag-extraction logic."""

import numpy as np
import pytest

from audiocaption_tpu.hf_api import (
    Effb2TrmCaptioningModel, Effb2TrmConfig,
    Cnn14RnnTempAttnGruModel, Cnn14RnnTempAttnGruConfig)
from audiocaption_tpu.models.sed import (
    find_contiguous_regions, double_threshold, segments_to_temporal_tag,
    framewise_to_temporal_tags)


def test_find_contiguous_regions():
    act = np.array([0, 1, 1, 0, 0, 1, 1, 1, 0], bool)
    np.testing.assert_array_equal(find_contiguous_regions(act),
                                  [[1, 3], [5, 8]])
    act = np.array([1, 1, 0, 1], bool)
    np.testing.assert_array_equal(find_contiguous_regions(act),
                                  [[0, 2], [3, 4]])


def test_double_threshold():
    x = np.array([0.1, 0.3, 0.9, 0.3, 0.1, 0.3, 0.4, 0.3, 0.1])
    # low=0.25 region [1,4) contains 0.9 > 0.75 -> kept; [5,8) has no
    # high sample -> dropped
    out = double_threshold(x, 0.75, 0.25)
    np.testing.assert_array_equal(out, [0, 1, 1, 1, 0, 0, 0, 0, 0])


def test_segments_to_temporal_tag():
    # single event class -> 0
    assert segments_to_temporal_tag([(0, 0.0, 1.0)]) == 0
    # two overlapping different classes -> while (1)... and after logic
    tag = segments_to_temporal_tag([(0, 0.0, 1.0), (1, 0.2, 1.2)])
    assert tag in (1, 3)
    # two disjoint classes -> after flag set (2 or 3)
    tag = segments_to_temporal_tag([(0, 0.0, 0.4), (1, 0.6, 1.0)])
    assert tag >= 2


def test_framewise_to_temporal_tags_shapes():
    fw = np.zeros((2, 100, 5), np.float32)
    fw[0, 10:30, 0] = 0.9            # one event -> tag 0
    fw[1, 10:30, 0] = 0.9
    fw[1, 15:40, 1] = 0.9            # overlapping pair
    tags = framewise_to_temporal_tags(fw)
    assert tags.shape == (2,)
    assert tags[0] == 0
    assert tags[1] >= 1


@pytest.fixture(scope="module")
def effb2_api():
    return Effb2TrmCaptioningModel(Effb2TrmConfig(vocab_size=64))


def test_effb2_api_greedy_and_beam(effb2_api):
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 14000).astype(np.float32)
    ids = effb2_api(audio, [14000, 9000], sample_method="greedy",
                    max_length=6)
    assert ids.shape == (2, 6)
    ids = effb2_api(audio, [14000, 9000], sample_method="beam",
                    beam_size=2, max_length=6)
    assert ids.shape == (2, 6)
    assert ids.dtype in (np.int32, np.int64)


def test_effb2_api_bucketing_consistency(effb2_api):
    """Two different raw lengths in the same bucket decode identically
    when the valid prefix matches."""
    rng = np.random.RandomState(1)
    base = rng.randn(1, 9000).astype(np.float32)
    a = np.pad(base, ((0, 0), (0, 3000)))     # 12000 raw
    b = np.pad(base, ((0, 0), (0, 6500)))     # 15500 raw
    ia = effb2_api(a, [9000], max_length=6, sample_method="greedy")
    ib = effb2_api(b, [9000], max_length=6, sample_method="greedy")
    np.testing.assert_array_equal(ia, ib)


@pytest.mark.slow
def test_tempgru_api_runs():
    model = Cnn14RnnTempAttnGruModel(
        Cnn14RnnTempAttnGruConfig(vocab_size=64))
    rng = np.random.RandomState(2)
    audio = rng.randn(1, 32000).astype(np.float32)
    ids = model(audio, [32000], sample_method="greedy", max_length=5)
    assert ids.shape == (1, 5)
    # user tag merged via min()
    ids2 = model(audio, [32000], temporal_tag=[0], sample_method="greedy",
                 max_length=5)
    assert ids2.shape == (1, 5)
