"""Background prefetch-to-device input pipeline.

The reference copies every batch to the accelerator synchronously
inside the train step (`python_scripts/train_eval/run.py:23-27`
``.to(self.device)``), serializing host batch prep + transfer with the
device compute.  Here a worker thread prepares batch N+1 (host-side
``transform``) and dispatches its host->device transfer (``transfer``,
default :func:`_default_transfer`) while the device runs batch N —
``jax.device_put`` is async, so by the time the consumer's step is
dispatched the bytes are already in flight.  This matters most on a
high-latency remote-TPU link, where the per-step wav transfer otherwise
dominates step time (see NOTES_ROUND3).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax
import numpy as np

_SENTINEL = object()


class _WorkerError:
    """Exception captured on the worker thread, re-raised in the
    consumer at the point of failure (mid-iteration)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _default_transfer(batch: dict) -> dict:
    """``jax.device_put`` every numpy-array leaf of a batch dict;
    host-only values (id lists, strings, python scalars) pass through
    untouched.  Compact wire dtypes (f16/int16 from
    ``VarLenPadCollate(wire_dtype=...)``) are sent as-is — the jitted
    step re-expands them to f32 on device (training/trainer.py)."""
    out = {}
    for k, v in batch.items():
        # kind check: collates emit audio_id as a numpy unicode array
        if isinstance(v, np.ndarray) and v.dtype.kind in "biufc":
            out[k] = jax.device_put(v)
        else:
            out[k] = v
    return out


def prefetch_to_device(source: Iterable,
                       transform: Optional[Callable[[Any], Any]] = None,
                       transfer: Optional[Callable[[dict], dict]] = None,
                       depth: int = 2) -> Iterator:
    """Iterate ``source`` on a worker thread, keeping up to ``depth``
    device-resident batches ahead of the consumer.

    Per batch the worker applies ``transform`` (host-side prep, e.g.
    key filtering / dtype casts) and then ``transfer`` (host->device
    dispatch; defaults to :func:`_default_transfer`).  Tuples of dicts
    (the aug runner's ``(real, aug)`` pairs, cli/run.py train_aug) are
    transferred element-wise.  Batches are yielded in source order;
    worker exceptions re-raise in the consumer.
    """
    xfer = transfer if transfer is not None else _default_transfer

    def _apply(b):
        if transform is not None:
            b = transform(b)
        if isinstance(b, tuple):
            return tuple(xfer(x) for x in b)
        return xfer(b)

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))

    def _worker():
        try:
            for b in source:
                q.put(_apply(b))
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            q.put(_WorkerError(exc))
            return
        q.put(_SENTINEL)

    # daemon: a consumer that stops iterating early (break / exception)
    # must not hang interpreter shutdown on a blocked q.put
    t = threading.Thread(target=_worker, daemon=True,
                         name="prefetch_to_device")
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, _WorkerError):
            raise item.exc
        yield item
