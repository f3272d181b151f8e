"""Benchmark: batched 10 s clip captioning throughput on one TPU chip.

Workload = the BASELINE.md north-star config: flagship EffB2 + 2-layer
transformer decoder (vocab 4981), batched padded 16 kHz 10 s clips,
beam search (beam 3, max_length 20), bfloat16 encoder compute.

Prints ONE JSON line:
  {"metric": "clips_per_sec_per_chip", "value": N, "unit": "clips/s",
   "vs_baseline": N, ...}
The reference repo publishes no benchmark numbers (BASELINE.json
"published": {}), so ``vs_baseline`` is derived against a measured
UPPER bound on the reference's A100 beam-3 throughput
(results/reference_floor.json, produced by bench_reference_floor.py:
the reference's per-sample Python beam loop dispatches 3,203 torch ops
per clip — a >=12.8 ms/clip host floor at 4 us/launch that no GPU can
remove).  vs_baseline = our best beam-3 clips/s / that ceiling, i.e. a
LOWER bound on the true speedup.  Full derivation in PERF.md.

Extra diagnostics (greedy throughput, p50 single-clip latency) go to
stderr.
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

import jax
import jax.numpy as jnp
import numpy as np

# the env var alone is not bound to the config on this jax version
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def _sync(out):
    """Force device completion via a 4-byte scalar transfer.

    On the axon TPU tunnel ``block_until_ready`` does not actually wait
    and bulk host transfers are extremely slow, so the only reliable
    sync is fetching an on-device reduction of the output.
    """
    return float(_SUM(out))


def _bench_fn(fn, args, iters=10, warmup=2, trials=3):
    """Median of ``trials`` independent timing windows (each the mean of
    ``iters`` pipelined dispatches).  A single window on the shared axon
    tunnel is noisy — BENCH_r03 recorded a 2.6x outlier on one config
    from exactly that — so the record is the median with the spread
    returned alongside.  Returns (median_s, min_s, max_s)."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    samples = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        samples.append((time.perf_counter() - t0) / iters)
    return float(np.median(samples)), min(samples), max(samples)


def _workload_flops(model, variables, sr, seconds, max_length):
    """Per-clip useful-work FLOPs for greedy and beam-3 decode, via XLA
    cost analysis on the CPU backend (fast local compile; flops counts
    are backend-independent at HLO level).

    XLA counts while-loop bodies once, so the decode loop is estimated
    through its loop-free equivalent: the full teacher-forcing forward
    (same matmul work as a greedy decode of max_length tokens).  Beam-K
    decode = encoder + K x decoder, so decoder flops are separated via
    an encoder-only analysis.
    """
    from audiocaption_tpu.models.captioner import Captioner
    from audiocaption_tpu.utils.profiling import flops_estimate

    B = 8  # flops scale linearly in batch; keep the CPU compile cheap
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vars_cpu = jax.device_put(jax.device_get(variables), cpu)
        wav = jnp.zeros((B, seconds * sr), jnp.float32)
        wl = jnp.full((B,), seconds * sr, jnp.int32)
        cap = jnp.ones((B, max_length + 1), jnp.int32)
        cl = jnp.full((B,), max_length + 1, jnp.int32)
        enc_f = flops_estimate(
            lambda w, l: model.apply(vars_cpu, w, l,
                                     method=Captioner.encode), wav, wl)
        full_f = flops_estimate(
            lambda w, l, c, n: model.apply(
                vars_cpu, w, l, c, n, ss_ratio=1.0, train=False),
            wav, wl, cap, cl)
    enc, full = enc_f["flops"] / B, full_f["flops"] / B
    dec = max(full - enc, 0.0)
    return {"greedy": full, "beam3": enc + 3.0 * dec}


def main():
    import argparse

    from audiocaption_tpu.models.captioner import generate
    from audiocaption_tpu.models.zoo import effb2_trm, kd_student_cdur5
    from audiocaption_tpu.utils.profiling import device_peak_flops

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("flagship", "kd_student"),
                    default="flagship",
                    help="flagship = EffB2+Trm (the BASELINE workload; "
                         "the driver runs this). kd_student = the 1.0M-"
                         "param Cdur5 KD student that matches the 88M "
                         "teacher's quality (efficiency-frontier row).")
    cli = ap.parse_args()

    seconds = 10
    vocab = 4981
    if cli.model == "kd_student":
        sr = 32000
        model = kd_student_cdur5(vocab_size=vocab,
                                 compute_dtype=jnp.bfloat16)
    else:
        sr = 16000
        model = effb2_trm(vocab_size=vocab, compute_dtype=jnp.bfloat16)
    # init on the (fast-compiling) CPU backend, then transfer — the
    # remote-compiled TPU backend takes minutes for the init graph
    with jax.default_device(jax.devices("cpu")[0]):
        wav0 = jnp.zeros((1, sr))
        cap0 = jnp.ones((1, 4), jnp.int32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            wav0, jnp.asarray([sr]), cap0, jnp.asarray([4]), train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    rng = np.random.RandomState(0)

    def make_batch(B):
        if cli.model == "kd_student":
            # 32 kHz batches are 100s of MB; generate on device rather
            # than pushing them through the slow tunnel h2d path (the
            # transfer sits outside the timed loop either way)
            key = jax.random.PRNGKey(B)
            wav = jax.jit(lambda k: jax.random.normal(
                k, (B, seconds * sr), jnp.float32))(key)
            wav.block_until_ready()
        else:
            wav = jnp.asarray(rng.randn(B, seconds * sr)
                              .astype(np.float32))
        lens = jnp.asarray(
            rng.randint(int(0.6 * seconds * sr), seconds * sr, B)
            .astype(np.int32))
        return wav, lens

    @jax.jit
    def beam_fn(wav, wav_len):
        return generate(model, variables, wav, wav_len,
                        sample_method="beam", beam_size=3,
                        max_length=20)["seq"]

    @jax.jit
    def greedy_fn(wav, wav_len):
        return generate(model, variables, wav, wav_len,
                        sample_method="greedy", max_length=20)["seq"]

    best = 0.0
    best_cfg = None
    config_stats = {}

    def record(name, B, fn, args):
        nonlocal best, best_cfg
        med, lo, hi = _bench_fn(fn, args)
        cps = B / med
        config_stats[name] = {
            "ms_median": round(med * 1e3, 2),
            "ms_min": round(lo * 1e3, 2),
            "ms_max": round(hi * 1e3, 2),
            "clips_per_sec": round(cps, 1),
        }
        print(f"{name}: {med * 1e3:.1f} ms/batch "
              f"[{lo * 1e3:.1f}-{hi * 1e3:.1f}], {cps:.1f} clips/s",
              file=sys.stderr)
        if cps > best:
            best, best_cfg = cps, name
        return med

    small = cli.model == "kd_student"
    for B in ((256, 512) if small else (64, 128, 256)):
        try:
            record(f"beam3_b{B}", B, beam_fn, make_batch(B))
        except Exception as e:  # OOM at large batch: keep best so far
            print(f"B={B} failed: {type(e).__name__}", file=sys.stderr)
            break

    # fused-greedy kernel path (whole decode loop in one Pallas kernel).
    # Each B gets its own try: one failing batch size must not silently
    # drop the remaining configs from the record (a B=128 compile
    # failure once hid every fused-beam row of a capture).
    try:
        from audiocaption_tpu.decoding.fused_greedy import FusedGreedyDecoder
        fd = FusedGreedyDecoder(model, variables, max_length=20)
    except Exception as e:
        print(f"fused greedy failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        fd = None
    if fd is not None:
        # flagship sweep extends to 2048: the per-batch fixed dispatch
        # overhead (~2.4 ms measured) amortizes with B at a constant
        # 105.2 us/clip marginal chunk cost, crossing 9,400 clips/s at
        # B=2048 (capture: results/bench/bench_batch_scaling_2026-08-21)
        for B in ((256, 512, 1024) if small
                  else (128, 256, 512, 1024, 2048)):
            try:
                record(f"fused_greedy_b{B}", B, lambda w, l: fd(w, l),
                       make_batch(B))
            except Exception as e:
                print(f"fused greedy B={B} failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)

    # fused beam-3 kernel (the reference's DEFAULT decode, base.py:88-98,
    # as one Pallas kernel; token-identical to the XLA engine)
    try:
        from audiocaption_tpu.decoding.fused_beam import FusedBeamDecoder
        fb = FusedBeamDecoder(model, variables, max_length=20,
                              beam_size=3)   # bf16 model -> bf16 caches,
        # kernel batch 128 (f32 caches cap it at 64)
    except Exception as e:
        print(f"fused beam failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        fb = None
    if fb is not None:
        for B in ((256, 512, 1024) if small else (64, 128, 256, 512)):
            try:
                record(f"fused_beam3_b{B}", B, lambda w, l: fb(w, l),
                       make_batch(B))
            except Exception as e:
                print(f"fused beam B={B} failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)

    # diagnostics
    try:
        record("greedy_b64", 64, greedy_fn, make_batch(64))
        # single-clip latency two ways, with variance (r01->r02 the
        # mean drifted 19% with no variance data):
        #   * amortized: 16 pipelined dispatches / 16 (device time);
        #   * synced: per-call wall time incl. one host sync (what a
        #     serving caller sees through the tunnel).
        one = make_batch(1)
        lat, _, _ = _bench_fn(greedy_fn, one, iters=16)
        print(f"greedy single-clip amortized latency ~ {lat * 1e3:.2f} ms",
              file=sys.stderr)
        samples = []
        for _ in range(32):
            t0 = time.perf_counter()
            _sync(greedy_fn(*one))
            samples.append((time.perf_counter() - t0) * 1e3)
        qs = np.percentile(samples, [10, 50, 90])
        print(f"greedy single-clip synced latency ms: p10={qs[0]:.2f} "
              f"p50={qs[1]:.2f} p90={qs[2]:.2f} (n=32)", file=sys.stderr)
    except Exception as e:
        print(f"diagnostics failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # MFU: useful-work FLOPs per clip (cost analysis on the CPU backend,
    # see _workload_flops) over achieved clips/s vs the chip's bf16 peak
    mfu_fields = {}
    try:
        fl = _workload_flops(model, variables, sr, seconds, 20)
        peak = device_peak_flops()
        method = "greedy" if "greedy" in (best_cfg or "") else "beam3"
        achieved = best * fl[method]
        print(f"flops/clip greedy={fl['greedy']/1e9:.2f}G "
              f"beam3={fl['beam3']/1e9:.2f}G; best path achieves "
              f"{achieved/1e12:.2f} TFLOP/s", file=sys.stderr)
        mfu_fields = {
            "flops_per_clip": round(fl[method], 0),
            "achieved_tflops": round(achieved / 1e12, 3),
            "peak_bf16_tflops": round(peak / 1e12, 1) if peak else None,
            "mfu": round(achieved / peak, 4) if peak else None,
        }
    except Exception as e:
        print(f"mfu estimate failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # vs_baseline: our best beam-3 config against the derived ceiling
    # on reference-on-A100 beam-3 throughput (see module docstring).
    vs_baseline = None
    vs_basis = None
    floor_path = Path(__file__).resolve().parent / "results" / \
        "reference_floor.json"
    try:
        with open(floor_path) as f:
            floor = json.load(f)
        ref_bound = floor["bound"][
            "reference_a100_beam3_clips_per_s_upper_bound"]
        beam_cfgs = {k: v["clips_per_sec"]
                     for k, v in config_stats.items() if "beam" in k}
        if beam_cfgs and ref_bound:
            best_beam_cfg = max(beam_cfgs, key=beam_cfgs.get)
            vs_baseline = round(beam_cfgs[best_beam_cfg] / ref_bound, 1)
            vs_basis = {
                "ours": best_beam_cfg,
                "ours_clips_per_s": beam_cfgs[best_beam_cfg],
                "reference_a100_beam3_ceiling_clips_per_s": ref_bound,
                "kind": "lower bound (reference ceiling is one-sided "
                        "in its favor)",
                "derivation": floor["bound"]["derivation"],
            }
    except Exception as e:
        print(f"vs_baseline unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "clips_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "clips/s",
        "vs_baseline": vs_baseline,
        "vs_baseline_basis": vs_basis,
        "workload": (
            "batched 10s 32kHz clips, Cdur5+Trm 1.0M-param KD student "
            "len20 (best of XLA beam-3 / fused greedy / fused beam-3 "
            "whole-loop kernels)" if small else
            "batched 10s 16kHz clips, EffB2+Trm len20 bf16 "
            "(best of XLA beam-3 / fused greedy / fused beam-3 "
            "whole-loop kernels)"),
        "model": cli.model,
        "config": best_cfg,
        "device": str(jax.devices()[0]),
        "trials_per_config": 3,
        "configs": config_stats,
        **mfu_fields,
    }))


if __name__ == "__main__":
    main()
