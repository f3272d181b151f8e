"""HDF5-backed audio (caption) datasets
(captioning/datasets/caption_dataset.py:20-227).

Map-style datasets compatible with torch.utils.data.DataLoader (used for
its battle-tested multiprocess prefetching; items are plain numpy, the
device path is pure JAX).  Key behaviors mirrored from the reference:

  * ``wav.csv`` maps audio_id -> hdf5_path (tab-separated,
    caption_dataset.py:78-85); AudioCaps ids fall back to "Y{id}.wav"
    keys (train_util.py:53-61);
  * per-worker lazy h5 handle cache, re-opened after fork (:20-36,
    106-108);
  * resample orig_sr -> target_sr (scipy polyphase; replaces
    torchaudio), then random-crop / zero-pad to ``audio_duration``
    seconds when set (:110-129);
  * CaptionDataset yields one item per (audio_id, cap_id) with the raw
    caption string tokenized later in the collate (:174-227).
"""

from __future__ import annotations

import json
import random
from fractions import Fraction
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def read_wav_csv(path: str) -> Dict[str, str]:
    """wav.csv (tab-separated: audio_id, hdf5_path | file_name)."""
    import csv
    mapping = {}
    with open(path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            key = row.get("hdf5_path") or row.get("file_name")
            mapping[row["audio_id"]] = key
    return mapping


def load_caption_json(path: str, zh: bool = False) -> Dict[str, List[str]]:
    """caption json -> {audio_id: [caption strings]} (the runner's
    key2refs construction, train_eval/base.py:322-328)."""
    with open(path) as f:
        data = json.load(f)
    key2refs: Dict[str, List[str]] = {}
    for audio in data["audios"]:
        refs = []
        for cap in audio["captions"]:
            if zh:
                refs.append(cap.get("tokens", cap.get("caption", "")))
            else:
                refs.append(cap.get("caption", cap.get("tokens", "")))
        key2refs[audio["audio_id"]] = refs
    return key2refs


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return wav
    from scipy.signal import resample_poly
    frac = Fraction(target_sr, orig_sr)
    return resample_poly(wav, frac.numerator, frac.denominator
                         ).astype(np.float32)


class _H5Cache:
    """Lazy per-process h5 file handles (re-created after fork)."""

    def __init__(self):
        self._handles: Dict[str, "h5py.File"] = {}
        self._pid = None

    def read(self, h5_path: str, key: str) -> np.ndarray:
        import os
        if self._pid != os.getpid():
            self._handles = {}
            self._pid = os.getpid()
        if h5_path not in self._handles:
            self._handles[h5_path] = h5py.File(h5_path, "r")
        f = self._handles[h5_path]
        if key not in f and not key.startswith("Y"):
            alt = f"Y{key}.wav"   # AudioCaps packing quirk
            if alt in f:
                key = alt
        # read in the dataset's native dtype (a straight memcpy), then
        # convert with numpy: h5py's in-read type conversion (what
        # np.asarray(dset, f32) triggers) is element-wise and ~60x
        # slower for f16/int16-packed corpora
        arr = f[key][...]
        if arr.dtype == np.int16:
            return arr.astype(np.float32) / 32768.0
        if arr.dtype != np.float32:
            return arr.astype(np.float32)
        return arr


class InferenceDataset:
    """audio only: {audio_id, wav} items."""

    def __init__(self,
                 features: Dict[str, str],
                 orig_sr: Optional[int] = None,
                 target_sr: Optional[int] = None,
                 audio_duration: Optional[float] = None,
                 transforms=None,
                 load_into_mem: bool = False):
        wav_csv = features["wav"] if isinstance(features, dict) else features
        self.aid_to_h5 = read_wav_csv(wav_csv)
        self.audio_ids = list(self.aid_to_h5.keys())
        self.orig_sr = orig_sr
        self.target_sr = target_sr
        self.audio_duration = audio_duration
        self.transforms = transforms or []
        self.cache = _H5Cache()
        self.mem: Optional[Dict[str, np.ndarray]] = None
        if load_into_mem:
            self.mem = {aid: self._load(aid) for aid in self.audio_ids}
        # device-resident corpus mode (data/device_bank.py): items carry
        # a bank row index instead of samples; the jitted step gathers
        # the wav on device
        self.wav_index_mode = False
        self._bank_lens: Optional[np.ndarray] = None
        self._aid_to_idx: Optional[Dict[str, int]] = None

    def enable_wav_index(self, bank_lens: np.ndarray) -> None:
        """Switch __getitem__ to emit {wav_idx, wav_len} (row i of the
        device bank built over ``self.audio_ids``) instead of samples."""
        self.wav_index_mode = True
        self._bank_lens = np.asarray(bank_lens, np.int32)
        self._aid_to_idx = {a: i for i, a in enumerate(self.audio_ids)}

    def _index_item(self, audio_id: str) -> Dict:
        i = self._aid_to_idx[audio_id]
        return {"wav_idx": np.int32(i), "wav_len": self._bank_lens[i]}

    def _load(self, audio_id: str) -> np.ndarray:
        wav = self.cache.read(self.aid_to_h5[audio_id], audio_id)
        if self.orig_sr and self.target_sr:
            wav = resample(wav, self.orig_sr, self.target_sr)
        return wav

    def _crop_or_pad(self, wav: np.ndarray) -> np.ndarray:
        if self.audio_duration is None:
            return wav
        sr = self.target_sr or self.orig_sr
        n = int(self.audio_duration * sr)
        if len(wav) > n:
            start = random.randint(0, len(wav) - n)
            return wav[start:start + n]
        if len(wav) < n:
            return np.pad(wav, (0, n - len(wav)))
        return wav

    def __len__(self):
        return len(self.audio_ids)

    def get_audio(self, audio_id: str) -> np.ndarray:
        wav = (self.mem[audio_id] if self.mem is not None
               else self._load(audio_id))
        wav = self._crop_or_pad(wav)
        for tf in self.transforms:
            wav = tf(wav)
        return np.asarray(wav, np.float32)

    def __getitem__(self, index: int) -> Dict:
        aid = self.audio_ids[index]
        if self.wav_index_mode:
            return {"audio_id": aid, **self._index_item(aid)}
        return {"audio_id": aid, "wav": self.get_audio(aid)}


class CaptionDataset(InferenceDataset):
    """One item per (audio_id, cap_id): adds the raw caption string
    (tokenized at collate) (caption_dataset.py:174-227)."""

    def __init__(self, features: Dict[str, str], caption: str,
                 zh: bool = False, **kwargs):
        super().__init__(features, **kwargs)
        with open(caption) as f:
            data = json.load(f)
        self.items: List[Dict] = []
        for audio in data["audios"]:
            aid = audio["audio_id"]
            if aid not in self.aid_to_h5:
                continue
            for cap in audio["captions"]:
                text = cap.get("tokens", cap.get("caption", ""))
                self.items.append({
                    "audio_id": aid,
                    "cap_id": str(cap.get("cap_id", 0)),
                    "cap": text,
                })

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Dict:
        item = dict(self.items[index])
        if self.wav_index_mode:
            item.update(self._index_item(item["audio_id"]))
        else:
            item["wav"] = self.get_audio(item["audio_id"])
        return item


class WavCaptionDataset(CaptionDataset):
    """CaptionDataset variant reading wav files directly from disk
    instead of HDF5 (captioning/datasets/caption_wav_read_dataset.py):
    wav.csv maps audio_id -> file_name."""

    def _load(self, audio_id: str) -> np.ndarray:
        from audiocaption_tpu.cli.inference import read_wav
        sr, wav = read_wav(self.aid_to_h5[audio_id])
        if self.target_sr and sr != self.target_sr:
            wav = resample(wav, sr, self.target_sr)
        return wav

    def __getitem__(self, index: int) -> Dict:
        item = dict(self.items[index])
        wav = self._load(item["audio_id"])
        wav = self._crop_or_pad(wav)
        for tf in self.transforms:
            wav = tf(wav)
        item["wav"] = np.asarray(wav, np.float32)
        return item
