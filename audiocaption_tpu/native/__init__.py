"""Native (C++) runtime components, with pure-Python fallbacks.

``FastCiderD`` — drop-in replacement for metrics.cider.CiderD backed by
the C++ scorer in cider.cc, used on the SCST reward hot path.  The
shared library is built lazily with g++ the first time it is needed and
cached next to this file; if no compiler is available the pure-Python
scorer is used transparently.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libcider.so"
_LIB = None
_BUILD_FAILED = False


def _build_library() -> Optional[ctypes.CDLL]:
    global _BUILD_FAILED
    if _LIB_PATH.exists():
        try:
            return ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _LIB_PATH.unlink()
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_DIR / "cider.cc"), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(str(_LIB_PATH))
    except (OSError, subprocess.SubprocessError):
        _BUILD_FAILED = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None and not _BUILD_FAILED:
        lib = _build_library()
        if lib is not None:
            lib.cider_d_score.argtypes = [
                ctypes.POINTER(ctypes.c_int32),   # hyp tokens
                ctypes.POINTER(ctypes.c_int64),   # hyp offsets
                ctypes.POINTER(ctypes.c_int32),   # ref tokens
                ctypes.POINTER(ctypes.c_int64),   # ref offsets
                ctypes.POINTER(ctypes.c_int64),   # ref doc offsets
                ctypes.c_int64,                   # n docs
                ctypes.c_double,                  # sigma
                ctypes.POINTER(ctypes.c_double),  # out
            ]
            lib.cider_d_score.restype = None
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def _flatten(sents: List[List[int]]) -> Tuple[np.ndarray, np.ndarray]:
    off = np.zeros(len(sents) + 1, np.int64)
    for i, s in enumerate(sents):
        off[i + 1] = off[i] + len(s)
    toks = np.fromiter((t for s in sents for t in s), np.int32,
                       count=int(off[-1]))
    return toks, off


class FastCiderD:
    """pycocoevalcap-style API: compute_score(gts, res) ->
    (corpus mean, per-key array).  Falls back to the Python CiderD when
    the native library is unavailable."""

    def __init__(self, n: int = 4, sigma: float = 6.0):
        assert n == 4, "native scorer is specialized to n=4"
        self.sigma = sigma
        self._word2id: Dict[str, int] = {}

    def _ids(self, sentence: str) -> List[int]:
        out = []
        for w in sentence.split():
            if w not in self._word2id:
                self._word2id[w] = len(self._word2id)
            out.append(self._word2id[w])
        return out

    def compute_score(self, key2refs: Dict[str, List[str]],
                      key2pred: Dict[str, List[str]]):
        lib = _get_lib()
        if lib is None:
            from audiocaption_tpu.metrics.cider import CiderD
            return CiderD(sigma=self.sigma).compute_score(key2refs,
                                                          key2pred)
        keys = list(key2pred.keys())
        hyps = [self._ids(key2pred[k][0]) for k in keys]
        refs: List[List[int]] = []
        ref_doc_off = np.zeros(len(keys) + 1, np.int64)
        for i, k in enumerate(keys):
            for r in key2refs[k]:
                refs.append(self._ids(r))
            ref_doc_off[i + 1] = len(refs)
        hyp_toks, hyp_off = _flatten(hyps)
        ref_toks, ref_off = _flatten(refs)
        out = np.zeros(len(keys), np.float64)

        p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
        # guard against zero-size arrays (ctypes null pointers are fine
        # since the C side never dereferences empty ranges)
        hyp_toks = np.ascontiguousarray(hyp_toks)
        ref_toks = np.ascontiguousarray(ref_toks)
        lib.cider_d_score(
            p(hyp_toks, ctypes.c_int32), p(hyp_off, ctypes.c_int64),
            p(ref_toks, ctypes.c_int32), p(ref_off, ctypes.c_int64),
            p(ref_doc_off, ctypes.c_int64), len(keys),
            float(self.sigma), p(out, ctypes.c_double))
        return float(out.mean()) if len(out) else 0.0, out
