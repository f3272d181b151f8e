"""Precompute encoder features (fc/attn embeddings) into HDF5
(data/create_dataset/prepare_pretrained_features/{panns,effb0,clap}.py):

    python -m audiocaption_tpu.cli.prepare_features \
        --wav_csv data/x/waveform.csv --output_dir data/x/features \
        --encoder cnn14 [--checkpoint Cnn14_mAP=0.431.pth] [--batch_size 16]

or, from a trained native experiment (its Captioner encoder — the way
the reference extracts features from its own trained models for the
feature-input families like M2/RnnEncoder):

    python -m audiocaption_tpu.cli.prepare_features \
        --wav_csv data/x/waveform.csv --output_dir data/x/features \
        --experiment experiments/x/cnn14rnn_trm/seed_1 [--resume swa.pth]

Writes fc.h5, attn.h5, features.csv (all columns), and attn.csv
(audio_id\thdf5_path — directly usable as a dataset ``features.wav``
csv) consumable by feature-input models (generate(...,
enc_override=...), RnnEncoder / AudioTransformerEncoder / the M2
family over precomputed features).
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav_csv", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--encoder", default="cnn14",
                   choices=["cnn14", "cnn10", "cnn6", "effb2", "htsat",
                            "panns_cnn10", "panns_wavegram"],
                   help="panns_* select the original PANNs CLASSIFIERS "
                        "(models/panns.py, reference panns.py:44-320): "
                        "features come from the tagger and probs.h5 "
                        "gets the 527-class AudioSet probabilities "
                        "(the keyword/event-conditioned families read "
                        "that h5, keyword_dataset.py:28-49)")
    p.add_argument("--checkpoint", default=None,
                   help="torch checkpoint (PANNs / COLA / BLAT / HEAR; "
                        "htsat also covers CLAP-style HTS-AT audio "
                        "towers, prepare_pretrained_features/clap.py)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--experiment", default=None,
                   help="trained experiment dir (config.yaml + checkpoint); "
                        "extracts the experiment Captioner's encoder "
                        "features instead of a named pretrained encoder")
    p.add_argument("--resume", default="swa.pth",
                   help="checkpoint file inside --experiment")
    args = p.parse_args(argv)

    import h5py
    import jax
    import jax.numpy as jnp
    from audiocaption_tpu.models.cnn14 import Cnn14Encoder, convert_cnn14
    from audiocaption_tpu.models.effb2 import EfficientNetB2, convert_effb2
    from audiocaption_tpu.models.encoders_extra import (
        Cnn6Encoder, Cnn10Encoder, convert_panns_small)
    from audiocaption_tpu.ops.frontend import (
        CNN14_MEL_32K, EFFB2_MEL_16K, LogMelFrontend)

    if args.experiment:
        from audiocaption_tpu.models.captioner import Captioner
        from audiocaption_tpu.training.checkpoint import load_checkpoint
        from audiocaption_tpu.utils.config import (
            _short, build_model_from_config, load_config)
        exp_dir = Path(args.experiment)
        cfg = load_config(str(exp_dir / "config.yaml"))
        ckpt = load_checkpoint(str(exp_dir / args.resume))
        model_cfg = cfg["model"]
        if _short(model_cfg.get("type", "")) == "ScstWrapper":
            model_cfg = model_cfg["model"]  # passthrough at inference
        # tokenizer state is the raw word2idx dict (DictTokenizer)
        vocab = len(ckpt["tokenizer"]) if ckpt.get("tokenizer") else None
        model, _ = build_model_from_config(model_cfg, vocab_size=vocab)
        variables = {"params": ckpt["variables"]["params"],
                     "batch_stats": ckpt["variables"].get(
                         "batch_stats", {})}

        # params as traced jit args, NOT closure constants: big
        # checkpoints (Cnn14Rnn ~350 MB) exceed the remote-compile
        # request cap as baked constants (HTTP 413)
        variables = jax.device_put(variables, jax.devices()[0])

        @jax.jit
        def _encode(v, wav, wav_len):
            return model.apply(v, wav, wav_len, train=False,
                               method=Captioner.encode)

        def encode(wav, wav_len):
            return _encode(variables, wav, wav_len)

        bucket_sr = (model.mel.sample_rate
                     if model.input_mode == "mel" else 16000)
        _write_features(args, encode, bucket_sr, h5py, jnp)
        return

    if args.encoder in ("panns_cnn10", "panns_wavegram"):
        from audiocaption_tpu.models.panns import (
            Cnn10, Wavegram_Logmel_Cnn14, convert_cnn10_classifier,
            convert_wavegram_cnn14)
        mel = CNN14_MEL_32K
        frontend = LogMelFrontend(mel)
        wavegram = args.encoder == "panns_wavegram"
        clf = Wavegram_Logmel_Cnn14() if wavegram else Cnn10()
        with jax.default_device(jax.devices("cpu")[0]):
            lms0 = jnp.zeros((1, 101, 64))
            if wavegram:
                variables = clf.init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 32000)), lms0)
            else:
                variables = clf.init(jax.random.PRNGKey(0), lms0)
        if args.checkpoint:
            import torch
            from audiocaption_tpu.models import convert as C
            ckpt = torch.load(args.checkpoint, map_location="cpu",
                              weights_only=False)
            sd = C.state_dict_to_numpy(
                ckpt.get("model", ckpt) if isinstance(ckpt, dict)
                else ckpt)
            conv = (convert_wavegram_cnn14 if wavegram
                    else convert_cnn10_classifier)
            params, stats = conv(sd)
            variables = {"params": params, "batch_stats": stats}
        variables = jax.device_put(variables, jax.devices()[0])

        @jax.jit
        def _encode(v, wav, wav_len):
            lms = frontend(wav)
            out = clf.apply(v, wav, lms) if wavegram else clf.apply(v, lms)
            feat_len = mel.feat_len(wav_len)
            # downsample ratio from the realized shapes (Cnn10: 16,
            # wavegram-Cnn14: 32+) — masked length for the attn rows
            ratio = max(1, lms.shape[1] // out["attn_feat"].shape[1])
            return {"fc_emb": out["fc_feat"],
                    "attn_emb": out["attn_feat"],
                    "attn_emb_len": feat_len // ratio,
                    "clipwise_output": out["clipwise_output"]}

        def encode(wav, wav_len):
            return _encode(variables, wav, wav_len)

        _write_features(args, encode, mel.sample_rate, h5py, jnp)
        return

    if args.encoder == "effb2":
        enc_def, mel = EfficientNetB2(), EFFB2_MEL_16K
    elif args.encoder == "cnn14":
        enc_def, mel = Cnn14Encoder(), CNN14_MEL_32K
    elif args.encoder == "cnn10":
        enc_def, mel = Cnn10Encoder(), CNN14_MEL_32K
    elif args.encoder == "htsat":
        from audiocaption_tpu.models.htsat import HtsatEncoder
        enc_def, mel = HtsatEncoder(), CNN14_MEL_32K
    else:
        enc_def, mel = Cnn6Encoder(), CNN14_MEL_32K

    frontend = LogMelFrontend(mel)
    lms0 = jnp.zeros((1, 101, 64))
    with jax.default_device(jax.devices("cpu")[0]):
        variables = enc_def.init(jax.random.PRNGKey(0), lms0,
                                 jnp.asarray([101]))
    if args.checkpoint:
        import torch
        from audiocaption_tpu.models import convert as C
        ckpt = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=False)
        sd = C.state_dict_to_numpy(
            ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt)
        if args.encoder == "effb2":
            params, stats = convert_effb2(sd)
        elif args.encoder == "cnn14":
            params, stats = convert_cnn14(sd)
        elif args.encoder == "htsat":
            from audiocaption_tpu.models.htsat import convert_htsat
            params, stats = convert_htsat(sd)
        else:
            params, stats = convert_panns_small(sd)
        variables = {"params": params, "batch_stats": stats}

    variables = jax.device_put(variables, jax.devices()[0])

    @jax.jit
    def _encode(v, wav, wav_len):
        lms = frontend(wav)
        return enc_def.apply(v, lms, mel.feat_len(wav_len))

    def encode(wav, wav_len):
        return _encode(variables, wav, wav_len)

    _write_features(args, encode, mel.sample_rate, h5py, jnp)


def _write_features(args, encode, bucket_sr, h5py, jnp):
    from audiocaption_tpu.data.collate import pad_sequences
    from audiocaption_tpu.data.dataset import InferenceDataset

    ds = InferenceDataset({"wav": args.wav_csv})
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    probs_h5 = None
    with h5py.File(out_dir / "fc.h5", "w") as fc_h5, \
            h5py.File(out_dir / "attn.h5", "w") as attn_h5:
        for i in range(0, len(ds), args.batch_size):
            items = [ds[j] for j in range(i, min(i + args.batch_size,
                                                 len(ds)))]
            wav, lens = pad_sequences([it["wav"] for it in items],
                                      bucket=bucket_sr)
            out = encode(jnp.asarray(wav), jnp.asarray(lens))
            fc = np.asarray(out["fc_emb"])
            attn = np.asarray(out["attn_emb"])
            alens = np.asarray(out["attn_emb_len"])
            probs = (np.asarray(out["clipwise_output"])
                     if "clipwise_output" in out else None)
            if probs is not None and probs_h5 is None:
                # tagger probabilities for the keyword/event-conditioned
                # families (keyword_dataset h5 contract)
                probs_h5 = h5py.File(out_dir / "probs.h5", "w")
            for k, it in enumerate(items):
                aid = it["audio_id"]
                fc_h5[aid] = fc[k]
                attn_h5[aid] = attn[k, :alens[k]]
                if probs is not None:
                    probs_h5[aid] = probs[k]
                rows.append((aid, str(out_dir / "fc.h5"),
                             str(out_dir / "attn.h5")))
    if probs_h5 is not None:
        probs_h5.close()
    with open(out_dir / "features.csv", "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["audio_id", "fc_hdf5", "attn_hdf5"])
        w.writerows(rows)
    # attn.csv is a ready-made dataset csv (audio_id -> attn.h5): point
    # a feature-input model's ``features.wav`` at it directly
    with open(out_dir / "attn.csv", "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["audio_id", "hdf5_path"])
        w.writerows((aid, attn_path) for aid, _, attn_path in rows)
    print(f"wrote features for {len(rows)} clips to {out_dir}")


if __name__ == "__main__":
    main()
