"""On-chip A/B: fused greedy with bf16 cache storage (chunk 256) vs the
f32-cache/chunk-128 configuration.

The bf16 configuration halves the kernel's two dominant VMEM terms
(encoder-memory K/V inputs and self-attention decode caches), letting
the kernel chunk double from 128 to 256 so a large batch needs half the
encode+decode dispatches.  This script measures whether that wins on
the real chip (flagship EffB2+Trm bf16, 10 s clips, max_length 20).

Usage:  python bench_greedy_bf16.py [--trials 3]
Writes results/bench/bench_greedy_bf16_<date>.json
"""

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _median_ms(fn, wav, wl, trials):
    fn(wav, wl)  # compile + warm
    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        r = fn(wav, wl)
        jax.block_until_ready(r)
        out.append((time.perf_counter() - t0) * 1000)
    return float(np.median(out)), float(min(out)), float(max(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[256, 512])
    args = ap.parse_args()

    from audiocaption_tpu.decoding.fused_greedy import FusedGreedyDecoder
    from audiocaption_tpu.models.zoo import effb2_trm

    model = effb2_trm(vocab_size=4981, compute_dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, 16000)), jnp.asarray([16000]),
            jnp.ones((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    rng = np.random.RandomState(0)
    results = {}
    for cache_bf16 in (False, True):
        fd = FusedGreedyDecoder(model, variables, max_length=20,
                                cache_bf16=cache_bf16)
        tag = ("bf16_cache_chunk%d" if cache_bf16
               else "f32_cache_chunk%d") % fd.max_kernel_batch
        for B in args.batches:
            wav = jnp.asarray(rng.randn(B, 160000) * 0.1, jnp.float32)
            wl = jnp.asarray(np.full((B,), 160000, np.int32))
            wav = jax.device_put(wav)
            wl = jax.device_put(wl)
            med, lo, hi = _median_ms(fd, wav, wl, args.trials)
            key = f"{tag}_b{B}"
            results[key] = {"ms_median": round(med, 2),
                            "ms_min": round(lo, 2),
                            "ms_max": round(hi, 2),
                            "clips_per_sec": round(B / med * 1000, 1)}
            print(key, results[key], flush=True)

    out = {"device": str(jax.devices()[0]),
           "workload": "fused greedy, flagship EffB2+Trm bf16, "
                       "10 s 16 kHz clips, max_length 20",
           "trials": args.trials,
           "results": results}
    day = time.strftime("%Y-%m-%d")
    path = Path("results/bench") / f"bench_greedy_bf16_{day}.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
