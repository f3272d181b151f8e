"""Micro-batching serve loop: amortize the per-request dispatch cost.

The reference's serving surface is a 1-clip gradio demo
(/root/reference/captioning/demo.py:27-51): every request pays a full
encode+decode dispatch.  On a TPU behind a high-latency link that is
RTT-bound — the device program is ~2.5 ms but a synced single-clip call
measures ~25 ms p50 (PERF.md) — and even locally it leaves the MXU idle
between requests.

``MicroBatchServer`` closes that gap the TPU-native way:

* a **collector** thread gathers submitted clips until ``max_batch``
  requests are waiting or the oldest has waited ``max_wait_ms``, pads
  the waveforms to one static shape (bucketed batch sizes so XLA
  compiles a handful of programs, not one per batch), and dispatches
  ONE batched decode;
* dispatch is **asynchronous** (JAX returns device futures), so the
  collector immediately goes back to gathering while the device works —
  the link RTT and the device time are paid once per *batch*;
* a **resolver** thread blocks on the device result and fans the token
  rows back to per-request futures, preserving submission order within
  the batch;
* at most ``max_inflight`` batches are outstanding (a semaphore the
  resolver releases).  While every slot is busy the collector keeps
  absorbing arrivals into the *current* batch instead of queueing
  another dispatch, so batch size adapts to load with no tuning: at low
  load a lone clip ships after ``max_wait_ms``; at saturation batches
  grow toward ``max_batch`` automatically.  Without this bound, a
  high-fixed-cost link (per-dispatch overhead ≫ per-clip cost) degrades
  into hundreds of near-singleton dispatches whose overheads serialize
  (measured on the axon tunnel: mean batch 1.6 at 3x the singleton
  capacity offered).  Depth 2 still pipelines the link against the
  device.

Backpressure: ``submit`` blocks once ``max_queue`` clips are waiting
(a bounded queue), so offered load beyond the device ceiling degrades
latency visibly instead of growing memory without bound.

Wire formats: on a link-bound host (the axon tunnel moves ~45 MB/s of
incompressible data regardless of dtype, measured), bytes-on-the-wire
set the serving ceiling — an f32 128x10s batch is 82 MB ≈ 1.8 s ≈ 72
clips/s.  ``wire=`` shrinks the waveform wire format on the submitting
thread and the decode side dequantizes on the VPU (free next to the
encoder's matmuls):

* ``"f32"`` — 4 B/sample, lossless (default);
* ``"f16"`` — 2 B/sample, ~1e-3 relative error: 1.9x;
* ``"i16"`` — 2 B/sample, native WAV precision (lossless when the
  source audio is 16-bit PCM, which the reference demo's inputs are —
  demo.py:27-45 normalizes int16/int32): 1.9x;
* ``"mulaw"`` — 1 B/sample G.711 µ-law companding, ~38 dB SNR: 3.7x.

Pair a non-f32 wire with ``wire_decoder(decode_fn, wire)`` so the
dequantize runs on device after the (cheap) transfer.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["MicroBatchServer", "encode_wire", "wire_dtype", "wire_decoder"]

WIRE_FORMATS = ("f32", "f16", "i16", "mulaw")
_MU = 255.0


def wire_dtype(wire: str) -> np.dtype:
    """Numpy dtype a wire format travels as."""
    return {"f32": np.dtype(np.float32), "f16": np.dtype(np.float16),
            "i16": np.dtype(np.int16), "mulaw": np.dtype(np.uint8)}[wire]


def encode_wire(wav: np.ndarray, wire: str) -> np.ndarray:
    """Host-side: one float waveform (≈[-1, 1]) -> its wire format.

    int16 input is passed through unscaled on the ``i16`` wire (the
    lossless path for 16-bit PCM sources)."""
    if wire == "f32":
        return np.asarray(wav, np.float32)
    if wire == "f16":
        return np.asarray(wav, np.float16)
    if wire == "i16":
        if np.asarray(wav).dtype == np.int16:
            return np.asarray(wav)
        x = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
        return np.round(x * 32767.0).astype(np.int16)
    if wire == "mulaw":
        x = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
        y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
        return np.round((y + 1.0) * 127.5).astype(np.uint8)
    raise ValueError(f"unknown wire format {wire!r}; "
                     f"expected one of {WIRE_FORMATS}")


def decode_wire_device(wav, wire: str):
    """Device-side (jnp, traceable): wire format -> float32 waveform."""
    import jax.numpy as jnp
    if wire == "f32":
        return wav
    if wire == "f16":
        return wav.astype(jnp.float32)
    if wire == "i16":
        return wav.astype(jnp.float32) / 32768.0
    if wire == "mulaw":
        y = wav.astype(jnp.float32) / 127.5 - 1.0
        return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(_MU))
                              / _MU)
    raise ValueError(f"unknown wire format {wire!r}")


def wire_decoder(decode_fn: Callable, wire: str) -> Callable:
    """Wrap ``decode_fn(wav_f32, lens)`` to accept the wire format.

    The dequantize is a separate tiny jitted program whose output stays
    on device, so the wrapped decode costs one extra async dispatch and
    zero extra host<->device traffic."""
    if wire == "f32":
        return decode_fn
    import jax

    dequant = jax.jit(lambda w: decode_wire_device(w, wire))

    def wrapped(wav, lens):
        return decode_fn(dequant(wav), lens)
    return wrapped


def _default_buckets(max_batch: int) -> Tuple[int, ...]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 4
    out.append(max_batch)
    return tuple(out)


class MicroBatchServer:
    """Batch single-clip caption requests into fused-kernel decodes.

    Parameters
    ----------
    decode_fn:
        ``decode_fn(wav [B,T] f32, wav_len [B] i32) -> tokens`` —
        typically ``FusedGreedyDecoder``/``FusedBeamDecoder`` or the
        XLA engine wrapped in jit.  Must accept every bucketed batch
        size; the result only needs to support ``np.asarray``.
    max_batch:
        largest dispatch batch (the fused kernels' efficient chunk,
        128, is the natural choice).
    max_wait_ms:
        latency budget a lone request spends waiting for company.
    max_samples:
        static waveform length every clip is padded/cropped to
        (one compiled shape per bucket).
    batch_buckets:
        dispatch batch sizes (each is one XLA program).  Default:
        1, 4, 16, 64, ..., max_batch.
    max_queue:
        bound on clips waiting for dispatch (backpressure).
    wire:
        waveform wire format (module docstring).  ``decode_fn`` must
        accept it — wrap with :func:`wire_decoder` for non-f32 wires.
    max_inflight:
        outstanding-dispatch window (module docstring).  2 pipelines
        the link against the device; 1 serializes (debug).
    """

    def __init__(self, decode_fn: Callable, *, max_batch: int = 128,
                 max_wait_ms: float = 5.0, max_samples: int = 160000,
                 batch_buckets: Optional[Sequence[int]] = None,
                 max_queue: int = 4096, wire: str = "f32",
                 max_inflight: int = 2):
        self._decode = decode_fn
        self.max_batch = int(max_batch)
        self.max_wait = float(max_wait_ms) / 1e3
        self.max_samples = int(max_samples)
        if wire not in WIRE_FORMATS:
            raise ValueError(f"unknown wire format {wire!r}; "
                             f"expected one of {WIRE_FORMATS}")
        self.wire = wire
        self._wire_np = wire_dtype(wire)
        self.buckets = tuple(sorted(set(
            batch_buckets or _default_buckets(self.max_batch))))
        assert self.buckets[-1] == self.max_batch
        self.dispatched_batches = 0
        # wire encoding of silence (mulaw's zero is not the zero byte)
        self._pad = encode_wire(np.zeros(1, np.float32), self.wire)[0]
        self._pending: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._inflight: "queue.Queue" = queue.Queue()
        self._slots = threading.BoundedSemaphore(int(max_inflight))
        self._stop = threading.Event()
        self._collector = threading.Thread(
            target=self._collect_loop, name="serve-collect", daemon=True)
        self._resolver = threading.Thread(
            target=self._resolve_loop, name="serve-resolve", daemon=True)
        self._collector.start()
        self._resolver.start()

    # ------------------------------------------------------------- API
    def submit(self, wav: np.ndarray) -> Future:
        """Enqueue one clip (1-D float waveform, or int16 PCM on the
        ``i16`` wire); returns a Future whose result is the clip's
        token row (np.ndarray).  The wire encode runs here, on the
        caller's thread, so quantization cost never serializes the
        collector."""
        fut: Future = Future()
        wav = encode_wire(np.asarray(wav).ravel(), self.wire)
        self._pending.put((wav, fut))
        return fut

    def stop(self, timeout: float = 30.0) -> None:
        """Drain in-flight work and stop the threads."""
        self._stop.set()
        self._collector.join(timeout)
        self._inflight.put(None)
        self._resolver.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()

    # ----------------------------------------------------------- loops
    def _collect_loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._pending.get(timeout=0.05)
            except queue.Empty:
                continue
            batch: List[Tuple[np.ndarray, Future]] = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self._pending.get(timeout=left))
                except queue.Empty:
                    break
            # adaptive batching: while every dispatch slot is busy, keep
            # absorbing arrivals into THIS batch (up to max_batch; the
            # rest stays queued for the next one)
            while not self._slots.acquire(timeout=0.002):
                while len(batch) < self.max_batch:
                    try:
                        batch.append(self._pending.get_nowait())
                    except queue.Empty:
                        break
            self._dispatch(batch)
        # drain whatever arrived before stop()
        leftover: List[Tuple[np.ndarray, Future]] = []
        while True:
            try:
                leftover.append(self._pending.get_nowait())
            except queue.Empty:
                break
        for i in range(0, len(leftover), self.max_batch):
            self._slots.acquire()
            self._dispatch(leftover[i:i + self.max_batch])

    def _dispatch(self, batch: List[Tuple[np.ndarray, Future]]) -> None:
        """Dispatch one batch.  Caller must hold a ``_slots`` permit;
        it is released by the resolver (or here, on dispatch error)."""
        n = len(batch)
        bucket = next(b for b in self.buckets if b >= n)
        wav = np.full((bucket, self.max_samples), self._pad, self._wire_np)
        lens = np.ones(bucket, np.int32)  # pad rows decode ~instantly
        for i, (w, _) in enumerate(batch):
            w = w[:self.max_samples]
            wav[i, :w.shape[0]] = w
            lens[i] = max(1, w.shape[0])
        try:
            out = self._decode(wav, lens)   # async device dispatch
        except Exception as e:              # resolve errors per-request
            self._slots.release()
            for _, fut in batch:
                fut.set_exception(e)
            return
        self.dispatched_batches += 1
        self._inflight.put((out, [f for _, f in batch]))

    def _resolve_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is None:
                return
            out, futs = item
            try:
                tokens = np.asarray(out)    # blocks on the device
            except Exception as e:
                self._slots.release()
                for fut in futs:
                    fut.set_exception(e)
                continue
            self._slots.release()
            for i, fut in enumerate(futs):
                fut.set_result(tokens[i])
