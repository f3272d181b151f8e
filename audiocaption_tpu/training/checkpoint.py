"""Checkpoint save/resume (reference BaseRunner.save_checkpoint /
resume_checkpoint, train_eval/base.py:231-264).

A checkpoint is a single pickle of host numpy pytrees:
{variables: {params, batch_stats}, optimizer?, epoch, monitor state,
not_improve_cnt, tokenizer state_dict, lr_scheduler count}.  ``finetune``
resume loads weights only; full resume restores epoch/optimizer/monitor.
Partial loads are shape-checked and tolerant of missing keys
(train_util.py:188-202).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, variables: Dict, *,
                    epoch: int = 0,
                    opt_state: Any = None,
                    monitor_state: Optional[Dict] = None,
                    not_improve_cnt: int = 0,
                    tokenizer_state: Optional[Dict] = None,
                    lr_count: int = 0,
                    extra: Optional[Dict] = None) -> None:
    payload = {
        "variables": _to_host(variables),
        "epoch": epoch,
        "monitor_state": monitor_state,
        "not_improve_cnt": not_improve_cnt,
        "tokenizer": tokenizer_state,
        "lr_count": lr_count,
    }
    if opt_state is not None:
        payload["optimizer"] = _to_host(opt_state)
    if extra:
        payload.update(extra)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=4)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


class AsyncCheckpointer:
    """Run per-epoch checkpoint jobs on one worker thread so the
    device->host parameter fetch + pickle write overlap the next
    epoch's dispatched steps instead of sitting on the critical path
    (over a remote-TPU link the fetch alone is tens of seconds for
    Cnn14-size models).

    The reference saves synchronously every epoch
    (train_eval/run.py:333-343); the on-disk results here are
    identical — jobs run in submission order (single worker), each
    ``submit`` first joins the previous job (bounding in-flight
    payloads at one and surfacing the previous job's exception), and
    ``wait()`` joins before anyone reads what the job produced.
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor
        self._ex = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="ckpt")
        self._fut = None

    def submit(self, job) -> float:
        """Queue ``job`` (a no-arg callable); blocks until the previous
        job finished.  Returns seconds spent in that wait — ~0 means
        the write fully overlapped the epoch."""
        import time
        t0 = time.time()
        self.wait()
        self._fut = self._ex.submit(job)
        return time.time() - t0

    def wait(self) -> None:
        """Join the in-flight job (re-raising its exception, if any)."""
        if self._fut is not None:
            fut, self._fut = self._fut, None
            fut.result()


def merge_variables(target: Dict, source: Dict) -> Dict:
    """Shape-checked partial merge: copy source leaves into target where
    paths exist and shapes match (train_util.py:188-202)."""
    def merge(dst, src):
        if not isinstance(dst, dict) or not isinstance(src, dict):
            if hasattr(dst, "shape") and hasattr(src, "shape") and \
                    tuple(dst.shape) == tuple(src.shape):
                return np.asarray(src, dtype=np.asarray(dst).dtype)
            return dst
        out = {}
        for k in dst:
            out[k] = merge(dst[k], src[k]) if k in src else dst[k]
        return out
    return merge(target, source)


class MetricImprover:
    """min/max monitor (train_util.py:158-179)."""

    def __init__(self, mode: str = "max"):
        assert mode in ("min", "max")
        self.mode = mode
        self.best = float("inf") if mode == "min" else float("-inf")

    def __call__(self, value: float) -> bool:
        improved = (value < self.best if self.mode == "min"
                    else value > self.best)
        if improved:
            self.best = value
        return improved

    def state_dict(self) -> Dict:
        return {"mode": self.mode, "best": self.best}

    def load_state_dict(self, state: Dict):
        self.mode = state["mode"]
        self.best = state["best"]


def strip_optimizer(ckpt_path: str, out_path: str = None) -> str:
    """Drop the optimizer state from a checkpoint
    (python_scripts/utils/remove_optimizer.py)."""
    ckpt = load_checkpoint(ckpt_path)
    ckpt.pop("optimizer", None)
    out_path = out_path or ckpt_path
    import pickle
    from pathlib import Path
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(ckpt, f, protocol=4)
    return out_path
