"""Derive a defensible UPPER bound on the reference implementation's
A100 throughput — the denominator for ``vs_baseline``.

BASELINE.md's north star is ">= 20x A100 clips/sec/chip", but the
reference repo publishes no benchmark numbers and no A100 is available
here.  What IS measurable in this environment: the reference package
imports and runs on CPU (the parity tests already execute it), and its
decode loops have a host-side Python floor that NO accelerator can
remove:

  * beam search runs PER SAMPLE in a Python loop
    (captioning/models/base.py:254-325): for each clip, 20 sequential
    steps of beam bookkeeping + a decoder forward that re-encodes the
    FULL prefix each step (transformer_model.py:59-86, no KV cache).
    Every torch call in that loop is issued from Python serially; GPU
    async launch lets the device lag behind, but the Python wall time
    itself lower-bounds the per-clip latency, and each op is also a
    CUDA kernel launch (~4 us floor on A100-class hosts).
  * greedy decode is batched (base.py:152-168) so its host floor
    amortizes over the batch — it is reported as a diagnostic, not used
    for the headline bound (the reference's DEFAULT and published
    decode is beam 3, base.py:88-98 + eg test.yaml:22-25).

Method: run the ACTUAL reference beam search with (a) flagship decoder
dims and (b) a tiny decoder whose tensor compute is negligible, so the
tiny wall time isolates framework/Python overhead; separately count
the torch ops dispatched per clip (each >= one kernel launch on GPU).
The A100 bound combines them conservatively:

  per-clip floor = min( tiny_wall_ms / HOST_SPEED_SAFETY,
                        ops_per_clip * A100_LAUNCH_US )
  reference A100 beam-3 clips/s <= 1000 / per-clip floor

(the encoder FLOPs term, ~2.4 GF/clip EffB2 over 312 TFLOPS peak
= ~8 us/clip, is orders of magnitude below the host floor and is
reported but not added — keeping the bound one-sided in the
reference's favor).

Writes results/reference_floor.json; bench.py reads it to emit a
non-null vs_baseline.  Run on any CPU:  python bench_reference_floor.py
"""

import json
import sys
import time
import types
from pathlib import Path

import numpy as np
import torch

REF_ROOT = "/root/reference"
HOST_SPEED_SAFETY = 2.0     # assume the A100 host's Python is 2x ours
A100_LAUNCH_US = 4.0        # per-kernel launch latency floor
A100_BF16_PEAK = 312e12
MAX_LENGTH = 20
BEAM = 3
T_MEM = 31                  # 10 s @ 16 kHz EffB2: (1001 frames)//32


def _import_reference():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "toml" not in sys.modules:
        sys.modules["toml"] = types.ModuleType("toml")
    import captioning.models.base as ref_base
    import captioning.models.transformer_decoder as ref_td
    import captioning.models.transformer_model as ref_tm
    return types.SimpleNamespace(base=ref_base, tm=ref_tm, td=ref_td)


class _FeedEncoder(torch.nn.Module):
    """Feed precomputed attn features through (the encoder cost is
    bounded separately by its FLOPs)."""

    def forward(self, input_dict):
        return {"attn_emb": input_dict["attn"],
                "attn_emb_len": input_dict["attn_len"],
                "fc_emb": input_dict["fc"]}


def _build(ref, emb_dim, vocab, attn_dim, nlayers, nhead):
    torch.manual_seed(0)
    dec = ref.td.TransformerDecoder(
        emb_dim=emb_dim, vocab_size=vocab, fc_emb_dim=attn_dim,
        attn_emb_dim=attn_dim, dropout=0.0, nhead=nhead, nlayers=nlayers)
    model = ref.tm.TransformerModel(encoder=_FeedEncoder(), decoder=dec)
    ref.base.CaptionModel.set_index(1, 2, 0)
    model.eval()
    return model


def _decode(model, B, attn_dim, sample_method, beam_size=BEAM):
    rng = np.random.RandomState(0)
    d = {"mode": "inference",
         "attn": torch.as_tensor(rng.randn(B, T_MEM, attn_dim)
                                 .astype(np.float32)),
         "attn_len": torch.as_tensor(np.full(B, T_MEM, np.int64)),
         "fc": torch.as_tensor(rng.randn(B, attn_dim)
                               .astype(np.float32)),
         "max_length": MAX_LENGTH,
         "sample_method": sample_method,
         "beam_size": beam_size}
    with torch.no_grad():
        return model(d)


def _time(fn, repeats=3):
    fn()                                    # warmup
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


class _OpCounter(torch.utils._python_dispatch.TorchDispatchMode):
    def __init__(self):
        super().__init__()
        self.count = 0

    def __torch_dispatch__(self, func, types_, args=(), kwargs=None):
        self.count += 1
        return func(*args, **(kwargs or {}))


def main():
    torch.set_num_threads(max(1, torch.get_num_threads()))
    ref = _import_reference()

    flagship = _build(ref, emb_dim=256, vocab=4981, attn_dim=1408,
                      nlayers=2, nhead=4)
    tiny = _build(ref, emb_dim=16, vocab=32, attn_dim=16,
                  nlayers=1, nhead=2)

    B = 32
    out = {}

    # beam-3: the reference's default decode — per-sample Python loop
    t_flag = _time(lambda: _decode(flagship, B, 1408, "beam"))
    t_tiny = _time(lambda: _decode(tiny, B, 16, "beam"))
    with _OpCounter() as c:
        _decode(tiny, 1, 16, "beam")
    ops_per_clip = c.count
    out["beam3"] = {
        "batch": B,
        "flagship_cpu_ms_per_clip": round(t_flag / B * 1e3, 3),
        "tiny_cpu_ms_per_clip": round(t_tiny / B * 1e3, 3),
        "torch_ops_per_clip": ops_per_clip,
    }

    # greedy: batched (host floor amortizes over B) — diagnostic only
    tg_flag = _time(lambda: _decode(flagship, B, 1408, "greedy"))
    tg_tiny = _time(lambda: _decode(tiny, B, 16, "greedy"))
    with _OpCounter() as c:
        _decode(tiny, B, 16, "greedy")
    out["greedy"] = {
        "batch": B,
        "flagship_cpu_ms_per_clip": round(tg_flag / B * 1e3, 3),
        "tiny_cpu_ms_per_clip": round(tg_tiny / B * 1e3, 3),
        "torch_ops_per_batch": c.count,
    }

    # the A100 bound (beam-3, one-sided in the reference's favor)
    wall_floor_ms = out["beam3"]["tiny_cpu_ms_per_clip"] / HOST_SPEED_SAFETY
    launch_floor_ms = ops_per_clip * A100_LAUNCH_US / 1e3
    floor_ms = min(wall_floor_ms, launch_floor_ms)
    enc_flops = 2.4e9        # EffB2 10 s clip (bench.py cost analysis)
    enc_us = enc_flops / A100_BF16_PEAK * 1e6
    bound = 1000.0 / floor_ms
    out["bound"] = {
        "host_speed_safety": HOST_SPEED_SAFETY,
        "a100_launch_us": A100_LAUNCH_US,
        "python_wall_floor_ms_per_clip": round(wall_floor_ms, 3),
        "kernel_launch_floor_ms_per_clip": round(launch_floor_ms, 3),
        "per_clip_floor_ms": round(floor_ms, 3),
        "encoder_flops_per_clip": enc_flops,
        "encoder_a100_us_per_clip_at_peak": round(enc_us, 2),
        "reference_a100_beam3_clips_per_s_upper_bound": round(bound, 1),
        "derivation": (
            "per-sample Python beam loop (base.py:254-325) -> per-clip "
            "host floor = min(tiny-decoder CPU wall / "
            f"{HOST_SPEED_SAFETY}x host-speed margin, torch-op count x "
            f"{A100_LAUNCH_US} us A100 launch); encoder FLOPs term "
            "negligible and excluded (one-sided bound)"),
    }
    out["meta"] = {
        "workload": "10 s clip, beam 3, max_length 20, EffB2-Trm dims "
                    "(emb 256, vocab 4981, attn 1408, 2 layers)",
        "reference_anchor": "captioning/models/base.py:254-325, "
                            "transformer_model.py:59-86",
        "measured_on": "in-env CPU (torch eager), reference code "
                       "imported from /root/reference",
    }

    path = Path(__file__).resolve().parent / "results" / \
        "reference_floor.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
