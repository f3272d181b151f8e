"""Dual-rate student/teacher KD datasets + the wraparound iteration
sampler (TPU re-design of caption_dataset.py:230-436).

The KD datasets emit both a student waveform (resampled to the student
rate, random-cropped to ``audio_duration``) and a teacher waveform
(teacher rate, crop ALIGNED to the student crop —
caption_dataset.py:256-301).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional

import numpy as np

from audiocaption_tpu.data.dataset import (
    CaptionDataset, InferenceDataset, resample)


class _DualRateMixin:

    def _init_teacher(self, teacher_target_sr: int,
                      teacher_duration: Optional[float]):
        self.teacher_target_sr = teacher_target_sr
        self.teacher_duration = teacher_duration

    def _dual_waveforms(self, orig_wav: np.ndarray) -> Dict[str, np.ndarray]:
        stu = resample(orig_wav, self.orig_sr, self.target_sr) \
            if self.orig_sr and self.orig_sr != self.target_sr else orig_wav
        tea = resample(orig_wav, self.orig_sr, self.teacher_target_sr) \
            if self.orig_sr and self.orig_sr != self.teacher_target_sr \
            else orig_wav

        start = 0
        if self.audio_duration is not None:
            n = int(self.audio_duration * self.target_sr)
            if len(stu) > n:
                start = random.randint(0, len(stu) - n)
                stu = stu[start:start + n]
            elif len(stu) < n:
                stu = np.pad(stu, (0, n - len(stu)))
        if self.teacher_duration is not None:
            m = int(self.teacher_duration * self.teacher_target_sr)
            if len(tea) > m:
                # teacher crop aligned to the student crop (:273-279)
                t_start = self.teacher_target_sr * start // self.target_sr
                tea = tea[t_start:t_start + m]
            if len(tea) < m:
                tea = np.pad(tea, (0, m - len(tea)))
        return {"wav": np.asarray(stu, np.float32),
                "teacher_wav": np.asarray(tea, np.float32)}


class InferKdDataset(InferenceDataset, _DualRateMixin):

    def __init__(self, features, orig_sr: int = 32000,
                 target_sr: int = 32000, teacher_target_sr: int = 32000,
                 audio_duration: Optional[float] = None,
                 teacher_duration: Optional[float] = None, **kwargs):
        super().__init__(features, orig_sr=orig_sr, target_sr=target_sr,
                         audio_duration=audio_duration, **kwargs)
        self._init_teacher(teacher_target_sr, teacher_duration)

    def __getitem__(self, index: int) -> Dict:
        aid = self.audio_ids[index]
        orig = (self.mem[aid] if self.mem is not None
                else self.cache.read(self.aid_to_h5[aid], aid))
        item = {"audio_id": aid}
        item.update(self._dual_waveforms(np.asarray(orig, np.float32)))
        return item


class CaptionKdDataset(CaptionDataset, _DualRateMixin):

    def __init__(self, features, caption: str, orig_sr: int = 32000,
                 target_sr: int = 32000, teacher_target_sr: int = 32000,
                 audio_duration: Optional[float] = None,
                 teacher_duration: Optional[float] = None, **kwargs):
        super().__init__(features, caption, orig_sr=orig_sr,
                         target_sr=target_sr, audio_duration=audio_duration,
                         **kwargs)
        self._init_teacher(teacher_target_sr, teacher_duration)

    def __getitem__(self, index: int) -> Dict:
        item = dict(self.items[index])
        aid = item["audio_id"]
        orig = (self.mem[aid] if self.mem is not None
                else self.cache.read(self.aid_to_h5[aid], aid))
        item.update(self._dual_waveforms(np.asarray(orig, np.float32)))
        return item


class IterationBatchSampler:
    """Fixed-#samples-per-epoch batch sampler with wraparound shuffle
    (caption_dataset.py:390-436); usable as a torch DataLoader
    batch_sampler."""

    def __init__(self, data_source, batch_size: int, num_samples: int,
                 shuffle: bool = False):
        self.data_source = data_source
        self.batch_size = batch_size
        self.num_samples = num_samples
        self.shuffle = shuffle
        self.index_queue = list(range(len(data_source)))
        if shuffle:
            np.random.shuffle(self.index_queue)
        self.pointer = 0

    def __iter__(self):
        batches: List[List[int]] = []
        produced = 0
        while produced < self.num_samples:
            take = min(self.batch_size, self.num_samples - produced)
            batch = []
            for _ in range(take):
                if self.pointer >= len(self.index_queue):
                    self.index_queue = list(range(len(self.data_source)))
                    self.pointer = 0
                    if self.shuffle:
                        np.random.shuffle(self.index_queue)
                batch.append(self.index_queue[self.pointer])
                self.pointer += 1
            batches.append(batch)
            produced += take
        return iter(batches)

    def __len__(self):
        return (self.num_samples + self.batch_size - 1) // self.batch_size
