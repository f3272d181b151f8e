"""Condition / keyword dataset variants (TPU re-design of
captioning/datasets/condition_dataset.py and keyword_dataset.py).

  * ConditionCaptionDataset: per-(audio_id, cap_id) specificity
    probability read from a csv ("{audio_id}_{cap_id}" -> prob)
    attached as ``condition``;
  * RandomConditionDataset: inference-time random condition sampling —
    and the oversample-below-threshold behavior — for
    condition-controlled generation;
  * KeywordProbCaptionDataset / KeywordProbInferenceDataset: per-audio
    keyword probabilities from an HDF5 map, optionally binarized by a
    float threshold, "topK", or "thr_topK" rule
    (keyword_dataset.py:28-49).
"""

from __future__ import annotations

import csv as _csv
import random
from typing import Dict, List, Optional, Union

import numpy as np

from audiocaption_tpu.data.dataset import (
    CaptionDataset, InferenceDataset, _H5Cache)


def load_dict_from_csv(path: str, cols) -> Dict:
    """train_util.load_dict_from_csv equivalent (tab-separated)."""
    out = {}
    with open(path) as f:
        reader = _csv.DictReader(f, delimiter="\t")
        for row in reader:
            out[row[cols[0]]] = _maybe_float(row[cols[1]])
    return out


def _maybe_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def binarize_keyword(keyword: np.ndarray,
                     threshold: Union[None, float, str]) -> np.ndarray:
    """keyword_dataset.py:28-49 threshold rules."""
    if threshold is None:
        return keyword
    keyword = keyword.copy()
    if isinstance(threshold, float):
        return np.where(keyword < threshold, 0.0, 1.0)
    if threshold.startswith("top"):
        k = int(threshold[3:])
        ind = keyword.argsort()
        keyword[ind[-k:]] = 1.0
        keyword[ind[:-k]] = 0.0
        return keyword
    thr_s, top_s = threshold.split("_")
    thr, k = float(thr_s), int(top_s[3:])
    onehot = np.where(keyword < thr, 0.0, 1.0)
    if (onehot == 1).sum() > k:
        ind = keyword.argsort()
        keyword[ind[-k:]] = 1.0
        keyword[ind[:-k]] = 0.0
        return keyword
    return onehot


class ConditionCaptionDataset(CaptionDataset):

    def __init__(self, features, caption: str, condition: str, **kwargs):
        super().__init__(features, caption, **kwargs)
        self.key_to_condition = load_dict_from_csv(condition,
                                                   ("cap_id", "prob"))

    def __getitem__(self, index):
        item = super().__getitem__(index)
        key = f"{item['audio_id']}_{item['cap_id']}"
        item["condition"] = np.float32(self.key_to_condition[key])
        return item


class RandomConditionDataset(InferenceDataset):
    """Inference dataset emitting a random condition drawn from the
    empirical caption-condition distribution, oversampling values below
    ``threshold`` (condition_dataset.py RandomConditionDataset)."""

    def __init__(self, features, condition: str,
                 threshold: Optional[float] = None,
                 oversample: int = 1, **kwargs):
        super().__init__(features, **kwargs)
        cond = load_dict_from_csv(condition, ("cap_id", "prob"))
        values = [float(v) for v in cond.values()]
        if threshold is not None and oversample > 1:
            low = [v for v in values if v < threshold]
            values = values + low * (oversample - 1)
        self.condition_pool = values or [0.0]

    def __getitem__(self, index):
        item = super().__getitem__(index)
        item["condition"] = np.float32(random.choice(self.condition_pool))
        return item


class TemporalTagCaptionDataset(CaptionDataset):
    """CaptionDataset + per-audio temporal tag (0-3) from a tsv
    (``audio_id\ttag``) — training data for the temporal-tag
    controllable captioner (hf_wrapper.py Cnn14RnnTempAttnGruModel;
    tag semantics README.md:114-124: 0 single, 1 simultaneous,
    2 sequential, 3 complex)."""

    def __init__(self, features, caption: str, temporal_tag: str,
                 **kwargs):
        super().__init__(features, caption, **kwargs)
        self.key_to_tag = load_dict_from_csv(temporal_tag,
                                             ("audio_id", "tag"))

    def __getitem__(self, index):
        item = super().__getitem__(index)
        item["temporal_tag"] = np.int32(
            self.key_to_tag[item["audio_id"]])
        return item


class TemporalTagInferenceDataset(InferenceDataset):
    """InferenceDataset + ground-truth temporal tag per audio (for
    tag-conditioned decoding with oracle tags; SED-predicted tags come
    from the ``predict_temporal`` runner instead)."""

    def __init__(self, features, temporal_tag: str, **kwargs):
        super().__init__(features, **kwargs)
        self.key_to_tag = load_dict_from_csv(temporal_tag,
                                             ("audio_id", "tag"))

    def __getitem__(self, index):
        item = super().__getitem__(index)
        item["temporal_tag"] = np.int32(
            self.key_to_tag[item["audio_id"]])
        return item


class _KeywordMixin:

    def _init_keywords(self, keyword_prob: str,
                       threshold: Union[None, float, str]):
        self.keyword_map = load_dict_from_csv(keyword_prob,
                                              ("audio_id", "hdf5_path"))
        self.keyword_cache = _H5Cache()
        self.keyword_threshold = threshold

    def load_keyword(self, audio_id: str) -> np.ndarray:
        kw = self.keyword_cache.read(self.keyword_map[audio_id], audio_id)
        return binarize_keyword(np.asarray(kw, np.float32),
                                self.keyword_threshold)


class KeywordProbInferenceDataset(InferenceDataset, _KeywordMixin):

    def __init__(self, features, keyword_prob: str,
                 threshold: Union[None, float, str] = None, **kwargs):
        super().__init__(features, **kwargs)
        self._init_keywords(keyword_prob, threshold)

    def __getitem__(self, index):
        item = super().__getitem__(index)
        item["keyword"] = self.load_keyword(item["audio_id"])
        return item


class KeywordProbCaptionDataset(CaptionDataset, _KeywordMixin):

    def __init__(self, features, caption: str, keyword_prob: str,
                 threshold: Union[None, float, str] = None, **kwargs):
        super().__init__(features, caption, **kwargs)
        self._init_keywords(keyword_prob, threshold)

    def __getitem__(self, index):
        item = super().__getitem__(index)
        item["keyword"] = self.load_keyword(item["audio_id"])
        return item
