"""Serving latency vs offered load through MicroBatchServer on one chip.

The reference's serving surface is a 1-clip gradio demo
(/root/reference/captioning/demo.py:27-51) — every request pays a full
dispatch.  ``audiocaption_tpu.serving.MicroBatchServer`` batches
requests instead; this bench drives it with Poisson arrivals at several
offered loads and reports per-request latency percentiles (submit ->
tokens on host) plus achieved throughput, for each waveform wire
format (f32 / i16 / mulaw — serving.py module docstring).

Workload: flagship EffB2+Trm, fused greedy kernel, 10 s 16 kHz clips,
max_batch 128 (the kernel chunk).  Prints one JSON line per (wire,
load) to stdout and markdown tables to stderr (for PERF.md).

Caveat recorded in the JSON: on this axon-tunnel setup the synced
host->device link moves ~14-45 MB/s of incompressible data depending
on the day (measured via device-side-reduction fetch; raw
``device_put``+``block_until_ready`` lies — it returns before the
transfer lands), so serving here is LINK-bound, not compute-bound: an
f32 128x10s batch is 82 MB.  Wire formats attack exactly that — bytes
are the lever, so saturated capacity scales with the byte ratio even
as the absolute knee moves with tunnel weather; the default load grids
straddle each wire's knee across that range.  On a local PCIe host the
same design is compute-bound and the knee sits near the fused-kernel
throughput instead.
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent / ".cache" / "jax"))

import numpy as np

SR, SECONDS = 16000, 10
MAX_LEN = 20

# grids straddle each wire's knee across the tunnel's observed
# 14-45 MB/s day-to-day range (f32 knee 22-72 clips/s, i16 2x, mulaw 4x)
DEFAULT_LEVELS = {
    "f32": (20, 40, 60, 80, 120),
    "i16": (40, 80, 120, 160, 240),
    "mulaw": (60, 120, 240, 360, 480),
}


def build_decode_fn():
    import jax
    import jax.numpy as jnp
    # the env var alone is not bound to the config on this jax version
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from audiocaption_tpu.decoding.fused_greedy import FusedGreedyDecoder
    from audiocaption_tpu.models.zoo import effb2_trm

    model = effb2_trm(vocab_size=4981, compute_dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        wav0 = jnp.zeros((1, SR))
        cap0 = jnp.ones((1, 4), jnp.int32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            wav0, jnp.asarray([SR]), cap0, jnp.asarray([4]), train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    return FusedGreedyDecoder(model, variables, max_length=MAX_LEN)


def run_wire(decode, wire, levels, rng, pool):
    from audiocaption_tpu.serving import (MicroBatchServer, encode_wire,
                                          wire_decoder)
    wrapped = wire_decoder(decode, wire)
    rows = []
    for rate in levels:
        n = max(256, int(rate * 4))          # ~4 s of offered load
        n = min(n, 4096)
        lat = []
        # two buckets only: each bucket is one remote XLA compile on the
        # tunnel; a lone request padded to 16 costs negligible compute
        with MicroBatchServer(wrapped, max_batch=128, max_wait_ms=10.0,
                              max_samples=SR * SECONDS,
                              batch_buckets=(16, 128), wire=wire) as srv:
            # warm every bucket the level can hit so compile time is not
            # measured as latency
            for b in srv.buckets:
                wav = np.asarray(
                    encode_wire(np.zeros(SR * SECONDS, np.float32),
                                wire))[None].repeat(b, axis=0)
                lens = np.full((b,), SR * SECONDS, np.int32)
                np.asarray(wrapped(wav, lens))
            t0 = time.perf_counter()
            next_t = t0
            futs = []
            for i in range(n):
                next_t += rng.exponential(1.0 / rate)
                now = time.perf_counter()
                if next_t > now:
                    time.sleep(next_t - now)
                sub_t = time.perf_counter()
                fut = srv.submit(pool[i % len(pool)])
                fut.add_done_callback(
                    lambda f, s=sub_t: lat.append(time.perf_counter() - s))
                futs.append(fut)
            for f in futs:
                f.result(timeout=600)
            span = time.perf_counter() - t0
            n_batches = srv.dispatched_batches
        lat_ms = np.asarray(sorted(lat)) * 1e3
        row = {
            "wire": wire,
            "offered_clips_per_sec": float(rate),
            "achieved_clips_per_sec": round(n / span, 1),
            "n_requests": n,
            "dispatches": n_batches,
            "mean_batch": round(n / max(n_batches, 1), 1),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p90_ms": round(float(np.percentile(lat_ms, 90)), 1),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        }
        rows.append(row)
        print(json.dumps({"bench": "serve_load", **row,
                          "caveat": "axon tunnel link-bound; see PERF.md"}))
        sys.stdout.flush()
        print(f"[{wire}] offered {rate:.0f} -> "
              f"{row['achieved_clips_per_sec']} clips/s, "
              f"p50 {row['p50_ms']} ms", file=sys.stderr)
    return rows


def main():
    wires = [w for w in sys.argv[1:] if w in DEFAULT_LEVELS]
    levels = [float(x) for x in sys.argv[1:] if x not in DEFAULT_LEVELS]
    wires = wires or list(DEFAULT_LEVELS)

    decode = build_decode_fn()
    rng = np.random.RandomState(0)
    pool = [np.clip(rng.randn(SR * SECONDS) * 0.2, -1, 1).astype(np.float32)
            for _ in range(8)]

    all_rows = []
    for wire in wires:
        all_rows += run_wire(decode, wire,
                             levels or DEFAULT_LEVELS[wire], rng, pool)

    print("\n| wire | offered clips/s | achieved | mean batch | p50 ms "
          "| p90 ms | p99 ms |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in all_rows:
        print(f"| {r['wire']} | {r['offered_clips_per_sec']:.0f} | "
              f"{r['achieved_clips_per_sec']} | {r['mean_batch']} | "
              f"{r['p50_ms']} | {r['p90_ms']} | {r['p99_ms']} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
