"""Corpus v2 (quality headroom) generator properties: the levers that
de-saturate the quality axis must actually be present in the emitted
data (synonym-split references, arity-3 sequences, annotator coverage
noise, determinism)."""

import json

import numpy as np
import pytest

from audiocaption_tpu.cli.synthetic_corpus import (
    EVENTS_V2, captions_for_v2, generate_v2, sample_events_v2)



def test_sampler_arities_and_distinctness():
    rng = np.random.RandomState(0)
    arities = set()
    for _ in range(300):
        ev = sample_events_v2(rng)
        arities.add(len(ev))
        assert len(set(ev)) == len(ev)
    assert arities == {1, 2, 3}


def test_references_split_synonyms():
    """Across many clips, the 5 references must not always agree on the
    event phrasing (the v1 saturation mechanism was exact agreement)."""
    rng = np.random.RandomState(1)
    disagreements = 0
    for _ in range(100):
        caps = captions_for_v2(rng, [0, 7])     # both have >=3 synonyms
        if len({c.replace(" ", "|") for c in caps}) > 1:
            # check the *phrases* differ, not just templates
            used = set()
            for c in caps:
                for syn in EVENTS_V2[0][0]:
                    if syn in c:
                        used.add(syn)
            if len(used) > 1:
                disagreements += 1
    assert disagreements > 20


def test_arity3_coverage_noise():
    """Some arity-3 references drop one non-leading event."""
    rng = np.random.RandomState(2)
    lead, b, c = 0, 5, 9
    dropped = 0
    for _ in range(100):
        for cap in captions_for_v2(rng, [lead, b, c]):
            has_b = any(s in cap for s in EVENTS_V2[b][0])
            has_c = any(s in cap for s in EVENTS_V2[c][0])
            assert any(s in cap for s in EVENTS_V2[lead][0])
            if not (has_b and has_c):
                dropped += 1
    assert dropped > 20


def test_generate_v2_artifacts_and_determinism(tmp_path):
    p1 = generate_v2(str(tmp_path / "a"), n_train=6, n_val=2, n_test=2,
                     sr=8000, duration=3.0)
    data = json.load(open(p1["train"]["text"]))
    assert len(data["audios"]) == 6
    assert all(len(a["captions"]) == 5 for a in data["audios"])
    import h5py
    with h5py.File(p1["train"]["h5"]) as f:
        keys = list(f)
        assert len(keys) == 6
        wav1 = f[keys[0]][()]
    generate_v2(str(tmp_path / "b"), n_train=6, n_val=2, n_test=2,
                sr=8000, duration=3.0)
    with h5py.File(str(tmp_path / "b" / "train_waveform.h5")) as f:
        wav2 = f[sorted(f)[0]][()]
    np.testing.assert_array_equal(wav1, wav2)   # seeded: bit-identical
    data2 = json.load(open(tmp_path / "b" / "train_text.json"))
    assert data == data2
