"""Deterministic learnable synthetic captioning corpus.

The reference trains/evaluates on Clotho-v2 / AudioCaps, which cannot be
downloaded in this environment — so quality (CIDEr/SPIDEr) claims need a
corpus where the caption is a LEARNABLE function of the audio.  This
generator synthesizes event-structured audio (tones / chirps / noise
bursts with distinct spectral signatures, sequenced in time) and emits
captions from a fixed paraphrase grammar over the event sequence.  A
model that hears the events and their order can reach the corpus's
round-robin (inter-annotator) CIDEr ceiling; a model that doesn't,
can't.

Artifact layout matches the reference prep pipeline outputs
(data/create_dataset/*, python_scripts/utils/pack_waveform.py:60-104):
per split ``{split}_waveform.h5`` + ``{split}_wav.csv``
(audio_id\thdf5_path) + ``{split}_text.json``
({"audios": [{audio_id, captions: [{tokens, caption, cap_id}]}]}),
plus a train-split ``vocab.pkl`` (DictTokenizer state).

Everything is seeded: the same (seed, sizes) always produces the same
corpus bit-for-bit, so experiments are reproducible without committing
audio data.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

# ----------------------------------------------------------------- events --
# Each event type: (noun phrase, synthesis function(rng, t) -> wave).
# Signatures are spectrally disjoint so the mapping audio -> phrase is
# unambiguous; onset/offset ramps avoid clicks.


def _ramp(n: int, sr: int, ms: float = 30.0) -> np.ndarray:
    r = int(sr * ms / 1000)
    env = np.ones(n, np.float32)
    if r > 0 and n > 2 * r:
        env[:r] = np.linspace(0, 1, r, dtype=np.float32)
        env[-r:] = np.linspace(1, 0, r, dtype=np.float32)
    return env


def _sine(f):
    def synth(rng, t, sr):
        return np.sin(2 * np.pi * f * t).astype(np.float32)
    return synth


def _chirp(f0, f1):
    def synth(rng, t, sr):
        T = t[-1] if len(t) else 1.0
        inst = f0 + (f1 - f0) * t / max(T, 1e-6)
        phase = 2 * np.pi * np.cumsum(inst) / sr
        return np.sin(phase).astype(np.float32)
    return synth


def _noise(rng, t, sr):
    return rng.randn(len(t)).astype(np.float32) * 0.7


def _beeps(rng, t, sr):
    gate = (np.sin(2 * np.pi * 6.0 * t) > 0.3).astype(np.float32)
    return (np.sin(2 * np.pi * 1000.0 * t) * gate).astype(np.float32)


def _rumble(rng, t, sr):
    # narrowband low-frequency noise: smoothed white noise
    x = rng.randn(len(t) + 256).astype(np.float32)
    k = np.hanning(257).astype(np.float32)
    k /= k.sum()
    y = np.convolve(x, k, mode="valid")[: len(t)]
    return (y / (np.std(y) + 1e-8)).astype(np.float32)


def _chime(rng, t, sr):
    # repeated decaying harmonic strikes at 1.2 kHz
    period = 0.8
    phase = (t % period)
    env = np.exp(-6.0 * phase).astype(np.float32)
    tone = sum(np.sin(2 * np.pi * 1320.0 * (h + 1) * t) / (h + 1)
               for h in range(3))
    return (tone * env).astype(np.float32) * 0.8


EVENTS: List[Tuple[str, object]] = [
    ("low tone", _sine(220.0)),
    ("high whistle", _sine(2600.0)),
    ("rising siren", _chirp(400.0, 1600.0)),
    ("falling siren", _chirp(1600.0, 400.0)),
    ("static noise", _noise),
    ("quick beeps", _beeps),
    ("deep rumble", _rumble),
    ("bright chime", _chime),
]

# ---------------------------------------------------------------- grammar --
# 5 paraphrase templates per arity; every audio gets all 5 (cap_id 0..4)
# in a clip-deterministic order, mirroring Clotho's 5 captions/audio
# (prepare_clotho.py:21-39).

TEMPLATES_1 = [
    "a {a} is heard",
    "the sound of a {a}",
    "a {a} sounds steadily",
    "someone hears a {a}",
    "a {a} plays alone",
]

TEMPLATES_2 = [
    "a {a} is followed by a {b}",
    "a {a} and then a {b}",
    "first a {a} then a {b}",
    "a {b} comes after a {a}",
    "a {a} sounds before a {b}",
]


def synth_clip(rng: np.random.RandomState, events: List[int], sr: int,
               duration: float) -> np.ndarray:
    """Events fill sequential segments with short silence gaps; levels
    are randomized mildly so amplitude is not a caption cue."""
    n = int(sr * duration)
    wav = rng.randn(n).astype(np.float32) * 0.003  # noise floor
    n_ev = len(events)
    seg = duration / n_ev
    for i, ev in enumerate(events):
        start = i * seg + rng.uniform(0.1, 0.4)
        end = (i + 1) * seg - rng.uniform(0.1, 0.4)
        s, e = int(start * sr), int(end * sr)
        t = np.arange(e - s, dtype=np.float32) / sr
        x = EVENTS[ev][1](rng, t, sr)
        gain = rng.uniform(0.25, 0.6)
        wav[s:e] += x * _ramp(e - s, sr) * gain
    peak = np.abs(wav).max()
    if peak > 0.99:
        wav *= 0.99 / peak
    return wav


def captions_for(rng: np.random.RandomState, events: List[int]
                 ) -> List[str]:
    phrases = [EVENTS[e][0] for e in events]
    if len(events) == 1:
        temps = TEMPLATES_1
        fills = {"a": phrases[0]}
    else:
        temps = TEMPLATES_2
        fills = {"a": phrases[0], "b": phrases[1]}
    order = rng.permutation(len(temps))
    return [temps[i].format(**fills) for i in order]


def sample_events(rng: np.random.RandomState) -> List[int]:
    if rng.rand() < 0.35:
        return [int(rng.randint(len(EVENTS)))]
    a = int(rng.randint(len(EVENTS)))
    b = int(rng.randint(len(EVENTS) - 1))
    if b >= a:
        b += 1  # distinct pair; order is the thing to learn
    return [a, b]


def generate(output_dir: str, n_train: int = 2000, n_val: int = 200,
             n_test: int = 200, sr: int = 16000, duration: float = 10.0,
             seed: int = 0) -> Dict[str, Dict[str, str]]:
    """Write the corpus; returns {split: {wav_csv, text, h5}} paths."""
    import h5py
    from audiocaption_tpu.data.tokenizer import DictTokenizer

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    sizes = {"train": n_train, "val": n_val, "test": n_test}
    paths: Dict[str, Dict[str, str]] = {}
    train_caps: List[str] = []
    for si, (split, n) in enumerate(sizes.items()):
        rng = np.random.RandomState(seed * 1000 + si)
        h5p = out / f"{split}_waveform.h5"
        audios = []
        with h5py.File(h5p, "w") as f, \
                open(out / f"{split}_wav.csv", "w") as csv:
            csv.write("audio_id\thdf5_path\n")
            for i in range(n):
                aid = f"syn_{split}_{i:05d}"
                events = sample_events(rng)
                wav = synth_clip(rng, events, sr, duration)
                f[aid] = wav.astype(np.float16)
                csv.write(f"{aid}\t{h5p}\n")
                caps = captions_for(rng, events)
                audios.append({"audio_id": aid, "captions": [
                    {"tokens": c, "caption": c.capitalize() + ".",
                     "cap_id": str(j)} for j, c in enumerate(caps)]})
                if split == "train":
                    train_caps.extend(caps)
        with open(out / f"{split}_text.json", "w") as f:
            json.dump({"audios": audios}, f)
        paths[split] = {"wav_csv": str(out / f"{split}_wav.csv"),
                        "text": str(out / f"{split}_text.json"),
                        "h5": str(h5p)}

    tok = DictTokenizer()
    for c in train_caps:
        for w in c.split():
            tok.add_word(w)
    with open(out / "vocab.pkl", "wb") as f:
        pickle.dump(tok.state_dict(), f)
    paths["vocab"] = {"vocab": str(out / "vocab.pkl")}
    return paths


def ceiling(text_json: str, n_audios: int = 0) -> Dict[str, float]:
    """Round-robin inter-annotator score ceiling on a split
    (eval_round_robin.py:52-108 semantics via metrics/tools.py)."""
    from audiocaption_tpu.metrics.tools import round_robin_scores
    with open(text_json) as f:
        data = json.load(f)
    key2refs = {a["audio_id"]: [c["tokens"] for c in a["captions"]]
                for a in data["audios"]}
    if n_audios:
        keys = sorted(key2refs)[:n_audios]
        key2refs = {k: key2refs[k] for k in keys}
    return round_robin_scores(key2refs)


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(
        prog="audiocaption_tpu.cli.synthetic_corpus")
    sub = parser.add_subparsers(dest="command", required=True)
    g = sub.add_parser("generate")
    g.add_argument("output_dir")
    g.add_argument("--n_train", type=int, default=2000)
    g.add_argument("--n_val", type=int, default=200)
    g.add_argument("--n_test", type=int, default=200)
    g.add_argument("--sr", type=int, default=16000)
    g.add_argument("--duration", type=float, default=10.0)
    g.add_argument("--seed", type=int, default=0)
    c = sub.add_parser("ceiling")
    c.add_argument("text_json")
    c.add_argument("--n_audios", type=int, default=0)
    args = parser.parse_args(argv)
    if args.command == "generate":
        paths = generate(args.output_dir, args.n_train, args.n_val,
                         args.n_test, args.sr, args.duration, args.seed)
        print(json.dumps(paths, indent=1))
    else:
        print(json.dumps(ceiling(args.text_json, args.n_audios), indent=1))


if __name__ == "__main__":
    main()
