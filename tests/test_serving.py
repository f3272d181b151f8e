"""MicroBatchServer: batched results must equal per-clip decodes, and
requests submitted together must actually share dispatches (the whole
point vs the reference's 1-clip demo.py serving)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocaption_tpu.serving import (MicroBatchServer, encode_wire,
                                      decode_wire_device, wire_decoder,
                                      wire_dtype)


SR = 3200  # tiny: 0.2 s clips through the small captioner


def _decode_fn():
    from test_captioner import make_model, init_model
    from audiocaption_tpu.models.captioner import generate

    model = make_model("transformer")
    variables, _ = init_model(model)

    @jax.jit
    def fn(wav, wav_len):
        return generate(model, variables, wav, wav_len,
                        sample_method="greedy", max_length=8)["seq"]
    return fn


@pytest.fixture(scope="module")
def decode_fn():
    return _decode_fn()


def test_results_match_direct_decode(decode_fn):
    rng = np.random.RandomState(0)
    clips = [rng.randn(rng.randint(SR // 2, SR + 1)).astype(np.float32)
             for _ in range(10)]
    with MicroBatchServer(decode_fn, max_batch=8, max_wait_ms=50.0,
                          max_samples=SR) as srv:
        futs = [srv.submit(c) for c in clips]
        got = [f.result(timeout=120) for f in futs]
        n_batches = srv.dispatched_batches

    # direct per-clip reference through the same fn at the same shapes
    for clip, row in zip(clips, got):
        wav = np.zeros((1, SR), np.float32)
        wav[0, :clip.shape[0]] = clip[:SR]
        ref = np.asarray(decode_fn(jnp.asarray(wav),
                                   jnp.asarray([clip.shape[0]], np.int32)))
        np.testing.assert_array_equal(row, ref[0])

    # 10 clips, max_batch 8 -> at most 3 dispatches if batching works
    # (one full chunk + remainder; never 10 singleton dispatches)
    assert n_batches <= 4, n_batches


def test_lone_request_respects_wait_budget(decode_fn):
    with MicroBatchServer(decode_fn, max_batch=8, max_wait_ms=30.0,
                          max_samples=SR) as srv:
        t0 = time.perf_counter()
        fut = srv.submit(np.random.randn(SR).astype(np.float32))
        row = fut.result(timeout=120)
        dt = time.perf_counter() - t0
    assert row.shape[0] == 8
    # waited ~max_wait for company, then decoded alone (bucket 1);
    # generous ceiling — CPU jit of the bucket-1 shape happens here
    assert dt < 60.0


def test_stop_drains_pending(decode_fn):
    srv = MicroBatchServer(decode_fn, max_batch=4, max_wait_ms=1000.0,
                           max_samples=SR)
    futs = [srv.submit(np.random.randn(SR).astype(np.float32))
            for _ in range(3)]
    srv.stop()
    for f in futs:
        assert f.result(timeout=10) is not None


def test_decode_error_propagates():
    def boom(wav, lens):
        raise RuntimeError("device fell over")
    with MicroBatchServer(boom, max_batch=4, max_wait_ms=5.0,
                          max_samples=SR) as srv:
        # more failures than max_inflight: a leaked dispatch permit on
        # the error path would deadlock the later submits
        for _ in range(5):
            fut = srv.submit(np.zeros(SR, np.float32))
            with pytest.raises(RuntimeError, match="fell over"):
                fut.result(timeout=30)


def test_batches_coalesce_under_saturation():
    """While every dispatch slot is busy, arrivals must coalesce into
    the next batch instead of queueing singleton dispatches (the
    adaptive-batching contract that keeps a high-fixed-cost link from
    serializing per-request overheads)."""
    service = 0.03

    def slow_decode(wav, lens):
        time.sleep(service)                  # fixed per-dispatch cost
        return np.asarray(lens)[:, None]     # row i == len of clip i

    n, gap = 40, 0.002                       # 80 ms of arrivals
    lens_sent = []
    with MicroBatchServer(slow_decode, max_batch=64, max_wait_ms=0.5,
                          max_samples=SR, batch_buckets=(1, 4, 16, 64),
                          max_inflight=1) as srv:
        futs = []
        for i in range(n):
            ln = SR // 2 + i
            lens_sent.append(ln)
            futs.append(srv.submit(np.zeros(ln, np.float32)))
            time.sleep(gap)
        rows = [f.result(timeout=60) for f in futs]
    # every request answered with ITS OWN clip's row
    assert [int(r[0]) for r in rows] == lens_sent
    # without coalescing: ~40 dispatches x 30 ms each.  With it, each
    # 30 ms service window's arrivals ride one batch: ~80 ms / 30 ms
    # + stragglers.  Generous bound still fails the singleton regime.
    assert srv.dispatched_batches <= n // 3, srv.dispatched_batches


# ------------------------------------------------------------ wires
def _snr_db(x, y):
    err = np.mean((x - y) ** 2)
    return 10.0 * np.log10(np.mean(x ** 2) / max(err, 1e-30))


@pytest.mark.parametrize("wire,min_snr", [
    ("f16", 60.0), ("i16", 80.0), ("mulaw", 30.0)])
def test_wire_roundtrip_snr(wire, min_snr):
    rng = np.random.RandomState(3)
    x = np.clip(rng.randn(16000).astype(np.float32) * 0.2, -1, 1)
    enc = encode_wire(x, wire)
    assert enc.dtype == wire_dtype(wire)
    dec = np.asarray(decode_wire_device(jnp.asarray(enc), wire))
    assert _snr_db(x, dec) > min_snr


def test_i16_pcm_passthrough_is_lossless():
    """16-bit PCM source audio survives the i16 wire bit-exactly."""
    rng = np.random.RandomState(4)
    pcm = (np.clip(rng.randn(8000) * 0.2, -1, 1)
           * 32767).astype(np.int16)
    enc = encode_wire(pcm, "i16")
    np.testing.assert_array_equal(enc, pcm)
    dec = np.asarray(decode_wire_device(jnp.asarray(enc), "i16"))
    # float encode of the SAME pcm values lands on identical floats
    ref = pcm.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(dec, ref)


@pytest.mark.parametrize("wire", ["i16", "mulaw"])
def test_wire_server_matches_direct_decode(decode_fn, wire):
    """Server on a quantized wire == direct decode of the quantized
    waveform: the wire moves fewer bytes, not different audio."""
    rng = np.random.RandomState(5)
    clips = [np.clip(rng.randn(rng.randint(SR // 2, SR + 1)) * 0.2,
                     -1, 1).astype(np.float32) for _ in range(6)]
    wrapped = wire_decoder(decode_fn, wire)
    with MicroBatchServer(wrapped, max_batch=8, max_wait_ms=50.0,
                          max_samples=SR, wire=wire) as srv:
        futs = [srv.submit(c) for c in clips]
        got = [f.result(timeout=120) for f in futs]

    pad = np.asarray(decode_wire_device(
        jnp.asarray(encode_wire(np.zeros(1, np.float32), wire)),
        wire))[0]
    for clip, row in zip(clips, got):
        q = np.asarray(decode_wire_device(
            jnp.asarray(encode_wire(clip, wire)), wire))
        wav = np.full((1, SR), pad, np.float32)
        wav[0, :q.shape[0]] = q[:SR]
        ref = np.asarray(decode_fn(jnp.asarray(wav),
                                   jnp.asarray([clip.shape[0]], np.int32)))
        np.testing.assert_array_equal(row, ref[0])
