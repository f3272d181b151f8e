"""On-chip decode parity on TRAINED weights.

Round-2 verdict: all fused-kernel parity evidence was on random or
synthetic weights, where every beam candidate is a numerical near-tie
(random-init EffB2 collapses embeddings to ~1e-10) and token flips say
nothing.  This script re-certifies the whole-loop Pallas decode kernels
against the XLA decode engine using a *trained* checkpoint, whose
logit gaps are real, under both precision stories:

  * f32: engine f32 vs fused kernels with f32 caches — must be
    token-identical (the kernels compute f32 end to end);
  * bf16 (the serving story, `hf_api.py`): engine with
    ``compute_dtype=bfloat16`` vs fused kernels fed by the same bf16
    encoder (beam kernel stores bf16 K/V, accumulates f32).

Audio comes from the experiment's own val-split loader (real clips of
the corpus it was trained on), so the memories are exactly the serving
distribution.

Usage (TPU or CPU):
    python bench_parity.py experiments/synthetic/effb2_trm/seed_1 \
        [--resume swa.pth] [--clips 64] [--max-length 20]

Prints one JSON line per comparison plus a summary table to stderr.
Reference anchor for decode semantics: captioning/models/base.py:254-325.
"""

import argparse
import json
import sys

import os as _os
_os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax
import jax.numpy as jnp
import numpy as np

from pathlib import Path as _Path
jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                    str(_Path(__file__).resolve().parent / ".cache" / "jax")))


def _first_eos_mask(seq: np.ndarray, eos: int) -> np.ndarray:
    """True for positions up to and including the first EOS (the
    caption proper); False for the padding tail after it."""
    B, L = seq.shape
    is_eos = seq == eos
    # position of first eos, L-1 if none
    first = np.where(is_eos.any(1), is_eos.argmax(1), L - 1)
    pos = np.arange(L)[None, :]
    return pos <= first[:, None]


def _compare(name, ref_seq, got_seq, eos, out):
    ref = np.asarray(ref_seq)
    got = np.asarray(got_seq)
    total = ref.size
    neq = int((ref != got).sum())
    mask = _first_eos_mask(ref, eos)
    neq_live = int(((ref != got) & mask).sum())
    cap_eq = int((ref == got).all(1).sum())
    rec = {
        "comparison": name,
        "tokens": total,
        "token_mismatches": neq,
        "token_mismatches_pre_eos": neq_live,
        "captions": int(ref.shape[0]),
        "captions_exact": cap_eq,
    }
    out.append(rec)
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment_path")
    ap.add_argument("--resume", default="swa.pth")
    ap.add_argument("--clips", type=int, default=64)
    ap.add_argument("--max-length", type=int, default=20)
    ap.add_argument("--beam-size", type=int, default=3)
    ap.add_argument("--interpret", action="store_true",
                    help="run the Pallas kernels in interpret mode "
                    "(CPU smoke test; very slow — use tiny --clips)")
    args = ap.parse_args()

    if args.interpret:
        import functools

        import jax.experimental.pallas as pl

        import audiocaption_tpu.decoding.fused_beam as FB
        import audiocaption_tpu.decoding.fused_greedy as FG
        orig = pl.pallas_call

        @functools.wraps(orig)
        def patched(*a, **kw):
            kw["interpret"] = True
            kw.pop("compiler_params", None)
            return orig(*a, **kw)

        FB.pl.pallas_call = patched
        FG.pl.pallas_call = patched

    from audiocaption_tpu.cli.run import Runner, build_dataloader
    from audiocaption_tpu.decoding.fused_beam import FusedBeamDecoder
    from audiocaption_tpu.decoding.fused_greedy import FusedGreedyDecoder
    from audiocaption_tpu.models.captioner import generate
    from audiocaption_tpu.utils.config import build_model_from_config

    runner = Runner()
    cfg, model, variables, tokenizer = runner._load_experiment(
        args.experiment_path, args.resume)
    eos = model.special.eos
    L, K = args.max_length, args.beam_size

    # ---- real val clips through the experiment's own data config ----
    val_cfg = dict(cfg["data"]["val"])
    val_cfg.setdefault("dataloader_args", {})
    loader = build_dataloader(val_cfg, train=False)
    wavs, lens = [], []
    n = 0
    for batch in loader:
        wavs.append(np.asarray(batch["wav"]))
        lens.append(np.asarray(batch["wav_len"]))
        n += wavs[-1].shape[0]
        if n >= args.clips:
            break
    T = max(w.shape[1] for w in wavs)
    wav = np.concatenate(
        [np.pad(w, ((0, 0), (0, T - w.shape[1]))) for w in wavs])[
            :args.clips]
    wav_len = np.concatenate(lens)[:args.clips]
    wav = jnp.asarray(wav, jnp.float32)
    wav_len = jnp.asarray(wav_len, jnp.int32)
    print(f"{wav.shape[0]} val clips, padded T={T}", file=sys.stderr)

    model_bf16, _ = build_model_from_config(
        cfg["model"], vocab_size=len(tokenizer),
        compute_dtype=jnp.bfloat16)

    results = []
    for story, m in (("f32", model), ("bf16", model_bf16)):
        # variables are a jit ARGUMENT, not a closure: closed-over params
        # are baked into the HLO as constants, and a large checkpoint
        # (Cnn14Rnn ~350 MB) then exceeds the remote-compile request
        # body limit on the axon tunnel (HTTP 413)
        eng_g = jax.jit(lambda v, w, l, m=m: generate(
            m, v, w, l, sample_method="greedy",
            max_length=L)["seq"])(variables, wav, wav_len)
        eng_b = jax.jit(lambda v, w, l, m=m: generate(
            m, v, w, l, sample_method="beam", beam_size=K,
            max_length=L)["seq"])(variables, wav, wav_len)
        fg = FusedGreedyDecoder(m, variables, max_length=L)
        fb = FusedBeamDecoder(m, variables, max_length=L, beam_size=K)
        print(f"[{story}] beam cache dtype: "
              f"{'bf16' if fb.cache_bf16 else 'f32'}, "
              f"kernel batch {fb.max_kernel_batch}", file=sys.stderr)
        _compare(f"{story}: engine greedy vs fused greedy",
                 eng_g, fg(wav, wav_len), eos, results)
        _compare(f"{story}: engine beam{K} vs fused beam{K}",
                 eng_b, fb(wav, wav_len), eos, results)
        if story == "f32":
            f32_g, f32_b = eng_g, eng_b
        else:
            _compare("engine f32 vs engine bf16 (greedy, dtype "
                     "sensitivity baseline)", f32_g, eng_g, eos, results)
            _compare(f"engine f32 vs engine bf16 (beam{K})",
                     f32_b, eng_b, eos, results)

    print("\n--- summary ---", file=sys.stderr)
    for r in results:
        print(f"{r['comparison']}: {r['token_mismatches']}/{r['tokens']}"
              f" token mismatches ({r['token_mismatches_pre_eos']} before"
              f" EOS), {r['captions_exact']}/{r['captions']} captions"
              f" exact", file=sys.stderr)


if __name__ == "__main__":
    main()
