"""Standalone batch inference CLI
(python_scripts/inference/inference.py:114-180):

    python -m audiocaption_tpu.cli.inference \
        --input wav_dir_or_csv_or_file --output captions.json \
        --checkpoint EXP/seed_1/swa.pth [--sample_method beam ...]

Reads wavs (stdlib/scipy; 16/24/32-bit PCM and float), resamples to the
model rate, pads per batch, decodes, writes {audio_id: caption} json.
Clips shorter than 0.32 s are skipped like the reference's WavPadCollate
(inference.py:94-99).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_SECONDS = 0.32


def read_wav(path: str) -> Tuple[int, np.ndarray]:
    """-> (sample_rate, float32 mono waveform in [-1, 1])."""
    from scipy.io import wavfile
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data / 32768.0
    elif data.dtype == np.int32:
        data = data / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    data = np.asarray(data, np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    return sr, data


def collect_inputs(input_path: str) -> List[Tuple[str, str]]:
    """file | directory | csv of paths -> [(audio_id, path)]."""
    p = Path(input_path)
    if p.is_dir():
        files = sorted(list(p.glob("*.wav")) + list(p.glob("*.WAV")))
        return [(f.name, str(f)) for f in files]
    if p.suffix.lower() == ".csv":
        import csv
        out = []
        with open(p) as f:
            reader = csv.DictReader(f, delimiter="\t")
            for row in reader:
                fn = row.get("file_name") or row.get("path")
                out.append((row.get("audio_id", Path(fn).name), fn))
        return out
    return [(p.name, str(p))]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--sample_method", default="beam")
    parser.add_argument("--beam_size", type=int, default=3)
    parser.add_argument("--max_length", type=int, default=20)
    args = parser.parse_args(argv)

    from audiocaption_tpu.cli.run import Runner
    from audiocaption_tpu.data.collate import pad_sequences
    from audiocaption_tpu.data.dataset import resample
    from audiocaption_tpu.models.captioner import generate

    ckpt_path = Path(args.checkpoint)
    cfg, model, variables, tokenizer = Runner()._load_experiment(
        str(ckpt_path.parent), ckpt_path.name)
    target_sr = model.mel.sample_rate

    entries = collect_inputs(args.input)
    wavs, ids = [], []
    for aid, path in entries:
        try:
            sr, wav = read_wav(path)
        except Exception as e:
            print(f"skipping {path}: {e}", file=sys.stderr)
            continue
        wav = resample(wav, sr, target_sr)
        if len(wav) < MIN_SECONDS * target_sr:
            print(f"skipping {aid}: shorter than {MIN_SECONDS}s",
                  file=sys.stderr)
            continue
        wavs.append(wav)
        ids.append(aid)

    decode_jit: Dict = {}

    def run(batch_wav, batch_len):
        key = batch_wav.shape
        if key not in decode_jit:
            decode_jit[key] = jax.jit(lambda v, w, wl: generate(
                model, v, w, wl, sample_method=args.sample_method,
                beam_size=args.beam_size,
                max_length=args.max_length)["seq"])
        return decode_jit[key](variables, batch_wav, batch_len)

    output: Dict[str, str] = {}
    for i in range(0, len(wavs), args.batch_size):
        chunk = wavs[i:i + args.batch_size]
        padded, lens = pad_sequences(chunk, bucket=target_sr)
        seq = run(jnp.asarray(padded), jnp.asarray(lens))
        for aid, cap in zip(ids[i:i + args.batch_size],
                            tokenizer.decode(np.asarray(seq))):
            output[aid] = cap

    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(output, f, indent=2, ensure_ascii=False)
    print(f"wrote {len(output)} captions to {args.output}")


if __name__ == "__main__":
    main()
