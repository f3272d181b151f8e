"""Profiling / observability helpers (SURVEY.md section 5: the reference
ships only an offline FLOPs harness; here profiling is first-class):

  * ``trace`` context manager around jax.profiler for TensorBoard-viewable
    device traces;
  * ``StepTimer``: EMA step-time / clips-per-second meter for training
    and serving loops;
  * ``flops_estimate``: XLA cost analysis of a jitted function — the
    TPU-native replacement for flops_counting_model.py (thop/ptflops).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


def host_rss_gb() -> float:
    """Current host resident-set size in GB (0.0 where /proc is
    unavailable).  Surfaced in epoch logs so a leaking input pipeline
    (e.g. the remote-TPU tunnel client retaining every host->device
    transfer — see MIGRATION.md "Known environment limits") is visible
    long before the OOM killer fires."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope: view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, items: int = 1) -> Dict[str, float]:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else \
            self.ema * self.avg + (1 - self.ema) * dt
        return {"step_time_s": dt, "step_time_ema_s": self.avg,
                "items_per_sec": items / max(dt, 1e-9)}


def flops_estimate(fn: Callable, *args) -> Dict[str, float]:
    """Estimate FLOPs / bytes of a jitted function via XLA cost analysis
    (replaces the reference's torch FLOPs counters,
    flops_counting_model.py:297-375).

    Note: XLA's cost analysis counts a ``while`` loop body ONCE — for
    decode loops, estimate an equivalent loop-free program (e.g. the
    full teacher-forcing forward) instead."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {"flops": float(analysis.get("flops", -1.0)),
            "bytes_accessed": float(analysis.get("bytes accessed", -1.0))}


# peak dense bf16 matmul throughput per chip, FLOP/s (public spec
# sheets; used only to anchor MFU numbers in bench output)
_PEAK_BF16_FLOPS = (
    ("v6", 918e12),       # Trillium
    ("v5p", 459e12),
    ("v5 lite", 394e12),  # v5e device_kind is "TPU v5 lite..."
    ("v5e", 394e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def device_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s of a device by its device_kind, or None when
    unknown (e.g. CPU)."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16_FLOPS:
        if key in kind:
            return peak
    return None


def mfu(flops: float, seconds: float, device=None) -> Optional[float]:
    """Model FLOPs utilization: useful-work FLOPs / (time * peak)."""
    peak = device_peak_flops(device)
    if not peak or seconds <= 0 or flops <= 0:
        return None
    return flops / seconds / peak
