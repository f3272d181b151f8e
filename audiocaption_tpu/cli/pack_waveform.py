"""Pack wav files into float16 HDF5 + wav.csv
(python_scripts/utils/pack_waveform.py:60-104): parallel reading,
optional resampling and mono mixdown, multi-part sharding, tolerant of
corrupt files (pack_waveform.py:53-57).

    python -m audiocaption_tpu.cli.pack_waveform \
        --input wav_dir_or_csv --output_dir data/xyz \
        [--sample_rate 32000] [--num_parts 1] [--workers 8]
"""

from __future__ import annotations

import argparse
import csv
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np


def _load_one(entry: Tuple[str, str], target_sr: Optional[int]
              ) -> Tuple[str, Optional[np.ndarray]]:
    aid, path = entry
    try:
        from audiocaption_tpu.cli.inference import read_wav
        from audiocaption_tpu.data.dataset import resample
        sr, wav = read_wav(path)
        if target_sr and sr != target_sr:
            wav = resample(wav, sr, target_sr)
        return aid, wav.astype(np.float16)
    except Exception as e:  # corrupt file tolerance
        print(f"error reading {path}: {e}", file=sys.stderr)
        return aid, None


def pack_waveform(entries: List[Tuple[str, str]], output_dir: str,
                  sample_rate: Optional[int] = None, num_parts: int = 1,
                  workers: int = 4) -> None:
    import h5py
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    shards = [entries[i::num_parts] for i in range(num_parts)]
    csv_rows = []
    for part, shard in enumerate(shards):
        h5_path = out / (f"waveform_{part}.h5" if num_parts > 1
                         else "waveform.h5")
        with h5py.File(h5_path, "w") as store, \
                ProcessPoolExecutor(max_workers=workers) as pool:
            for aid, wav in pool.map(
                    _load_one, shard,
                    [sample_rate] * len(shard)):
                if wav is None:
                    continue
                store[aid] = wav
                csv_rows.append((aid, str(h5_path)))
    with open(out / "waveform.csv", "w", newline="") as f:
        writer = csv.writer(f, delimiter="\t")
        writer.writerow(["audio_id", "hdf5_path"])
        writer.writerows(csv_rows)
    print(f"packed {len(csv_rows)}/{len(entries)} files into {output_dir}")


def collect_entries(input_path: str) -> List[Tuple[str, str]]:
    from audiocaption_tpu.cli.inference import collect_inputs
    return collect_inputs(input_path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="wav directory or tsv with audio_id/file_name")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--sample_rate", type=int, default=None)
    p.add_argument("--num_parts", type=int, default=1)
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args(argv)
    pack_waveform(collect_entries(args.input), args.output_dir,
                  args.sample_rate, args.num_parts, args.workers)


if __name__ == "__main__":
    main()
