"""YAML config system with reference ergonomics
(captioning/utils/train_util.py:63-151):

  * ``inherit_from`` recursive merge (train_util.py:111-136);
  * CLI ``--key=value`` overrides with typed parsing and dotted paths
    (train_util.py:138-151 uses TOML; YAML parsing is equivalent here);
  * model construction from {type, args} nodes.  Instead of blind
    reflection-by-dotted-path (train_util.py:63-81) there is an explicit
    registry that ALSO accepts the reference's dotted type names, so
    existing eg_configs YAML files work unchanged (e.g.
    "captioning.models.cnn_encoder.Cnn14Encoder" maps to our encoder).
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import yaml


def merge_dicts(base: Dict, override: Dict) -> Dict:
    """Recursive dict merge; override wins (train_util.py:122-136)."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(path: str, overrides: Optional[Dict] = None) -> Dict:
    """Load YAML with recursive ``inherit_from`` + overrides."""
    path = Path(path)
    with open(path) as f:
        config = yaml.safe_load(f)
    if config and "inherit_from" in config:
        parent_rel = config.pop("inherit_from")
        parent = load_config(str((path.parent / parent_rel).resolve()))
        config = merge_dicts(parent, config)
    if overrides:
        config = merge_dicts(config, overrides)
    return config


def parse_overrides(pairs) -> Dict:
    """["a.b=1", "c=[2,3]"] -> nested dict with YAML-typed values."""
    out: Dict = {}
    for pair in pairs:
        key, _, value = pair.partition("=")
        node = out
        parts = key.strip().lstrip("-").split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(value)
    return out


# --------------------------------------------------------------------------
# Model construction
# --------------------------------------------------------------------------

def _short(type_name: str) -> str:
    return type_name.split(".")[-1]


def build_model_from_config(model_cfg: Dict,
                            vocab_size: Optional[int] = None,
                            compute_dtype=jnp.float32):
    """Build a Captioner from a reference-style model config node.

    Returns (captioner, pretrained_specs) where pretrained_specs is a
    list of (subtree_path, checkpoint_path, kind) for the trainer to
    load (the reference's per-submodule ``pretrained`` hooks,
    train_util.py:83-94).
    """
    from audiocaption_tpu.decoding.engine import SpecialTokens
    from audiocaption_tpu.models.captioner import Captioner
    from audiocaption_tpu.models.cnn14 import Cnn14Encoder
    from audiocaption_tpu.models.effb2 import EfficientNetB2
    from audiocaption_tpu.models.rnn_encoder import Cnn14RnnEncoder
    from audiocaption_tpu.models.rnn_decoder import (
        BahAttnCatFcDecoder, TemporalBahAttnDecoder)
    from audiocaption_tpu.models.transformer_decoder import TransformerDecoder
    from audiocaption_tpu.ops.frontend import (
        CNN14_MEL_16K, CNN14_MEL_32K, EFFB2_MEL_16K)

    pretrained = []

    enc_cfg = model_cfg["encoder"]
    enc_type = _short(enc_cfg["type"])
    enc_args = dict(enc_cfg.get("args", {}) or {})
    sample_rate = 32000
    mel = CNN14_MEL_32K
    input_mode = "mel"

    if enc_type in ("CrnnEncoder", "Cnn14RnnEncoder"):
        cnn_cfg = enc_cfg.get("cnn", {})
        rnn_cfg = enc_cfg.get("rnn", {})
        cnn_args = cnn_cfg.get("args", {}) or {}
        rnn_args = rnn_cfg.get("args", {}) or {}
        sample_rate = cnn_args.get("sample_rate", 32000)
        mel = CNN14_MEL_32K if sample_rate == 32000 else CNN14_MEL_16K
        encoder = Cnn14RnnEncoder(
            rnn_hidden_size=rnn_args.get("hidden_size", 512),
            rnn_bidirectional=rnn_args.get("bidirectional", False),
            rnn_num_layers=rnn_args.get("num_layers", 1),
            rnn_dropout=rnn_args.get("dropout", 0.2),
            rnn_pooling=rnn_args.get("pooling", "mean"),
            freeze_cnn=enc_args.get("freeze_cnn", False),
            freeze_cnn_bn=enc_args.get("freeze_cnn_bn", False),
            compute_dtype=compute_dtype)
        enc_out_dim = (rnn_args.get("hidden_size", 512) *
                       (2 if rnn_args.get("bidirectional", False) else 1))
        if cnn_cfg.get("pretrained"):
            pretrained.append(("encoder/cnn", cnn_cfg["pretrained"],
                               "cnn14"))
        if rnn_cfg.get("pretrained"):
            pretrained.append(("encoder/rnn", rnn_cfg["pretrained"], "raw"))
    elif enc_type == "Cnn14Encoder":
        sample_rate = enc_args.get("sample_rate", 32000)
        mel = CNN14_MEL_32K if sample_rate == 32000 else CNN14_MEL_16K
        encoder = Cnn14Encoder(compute_dtype=compute_dtype)
        enc_out_dim = 2048
        if enc_cfg.get("pretrained"):
            pretrained.append(("encoder", enc_cfg["pretrained"], "cnn14"))
    elif enc_type == "EfficientNetB2":
        encoder = EfficientNetB2(compute_dtype=compute_dtype,
                                 remat=enc_args.get("remat", False))
        mel = EFFB2_MEL_16K
        sample_rate = 16000
        enc_out_dim = 1408
        if enc_cfg.get("pretrained"):
            pretrained.append(("encoder", enc_cfg["pretrained"], "effb2"))
    elif enc_type in ("MobileNetV3", "MobileNetV3Encoder"):
        from audiocaption_tpu.models.mobilenet_v3 import MobileNetV3Encoder
        sample_rate = enc_args.get("sample_rate", 32000)
        mel = CNN14_MEL_32K if sample_rate == 32000 else CNN14_MEL_16K
        encoder = MobileNetV3Encoder(
            model_name=enc_args.get("model_name", "mn10"),
            pooling=enc_args.get("pooling", "mean_max_fc"),
            compute_dtype=compute_dtype)
        enc_out_dim = encoder.last_channels
    elif enc_type == "Htsat":
        from audiocaption_tpu.models.htsat import HtsatEncoder
        sample_rate = enc_args.get("sample_rate", 32000)
        mel = CNN14_MEL_32K if sample_rate == 32000 else CNN14_MEL_16K
        encoder = HtsatEncoder()
        enc_out_dim = encoder.fc_emb_size
        if enc_cfg.get("pretrained"):
            pretrained.append(("encoder", enc_cfg["pretrained"], "htsat"))
    elif enc_type in ("Cnn6Encoder", "Cnn10Encoder", "MobileNetV2",
                      "MobileNetV2Encoder", "Cdur5Encoder", "Cdur8Encoder",
                      "Cnn14TransformerEncoder"):
        from audiocaption_tpu.models.encoders_extra import (
            Cdur5Encoder, Cnn6Encoder, Cnn10Encoder,
            Cnn14TransformerEncoder, MobileNetV2Encoder)
        sample_rate = enc_args.get("sample_rate", 32000)
        mel = CNN14_MEL_32K if sample_rate == 32000 else CNN14_MEL_16K
        if enc_type == "Cnn6Encoder":
            encoder, enc_out_dim = Cnn6Encoder(), 512
        elif enc_type == "Cnn10Encoder":
            encoder, enc_out_dim = Cnn10Encoder(), 512
        elif enc_type in ("MobileNetV2", "MobileNetV2Encoder"):
            encoder, enc_out_dim = MobileNetV2Encoder(), 1280
        elif enc_type == "Cdur5Encoder":
            encoder, enc_out_dim = Cdur5Encoder(), 256
        elif enc_type == "Cdur8Encoder":
            from audiocaption_tpu.models.encoders_extra import Cdur8Encoder
            encoder, enc_out_dim = Cdur8Encoder(), 512
        else:
            trm_cfg = enc_cfg.get("transformer", {}).get("args", {}) or {}
            d_model = trm_cfg.get("d_model", 512)
            encoder = Cnn14TransformerEncoder(
                d_model=d_model,
                nlayers=trm_cfg.get("nlayers", 2),
                freeze_cnn=enc_args.get("freeze_cnn", False),
                freeze_cnn_bn=enc_args.get("freeze_cnn_bn", False),
                compute_dtype=compute_dtype)
            enc_out_dim = d_model
            cnn_cfg = enc_cfg.get("cnn", {})
            if cnn_cfg.get("pretrained"):
                pretrained.append(("encoder/cnn", cnn_cfg["pretrained"],
                                   "cnn14"))
    elif enc_type in ("UiT", "UitEncoder") or enc_type.startswith("uit_"):
        from audiocaption_tpu.models.uit import (
            UIT_MEL_16K, UIT_VARIANTS, UitEncoder)
        variant = enc_args.get("model_name",
                               enc_type if enc_type.startswith("uit_")
                               else "uit_xs")
        trunk = UIT_VARIANTS[variant](
            outputdim=enc_args.get("outputdim", 537),
            target_length=enc_args.get("target_length", 1008))
        encoder = UitEncoder(trunk=trunk)
        mel = UIT_MEL_16K
        sample_rate = 16000
        enc_out_dim = trunk.embed_dim
        if enc_cfg.get("pretrained"):
            pretrained.append(("encoder", enc_cfg["pretrained"], "uit"))
    elif enc_type in ("ESResNeXtFBSP", "ESResNeXtFBSPEncoder"):
        from audiocaption_tpu.models.resnext import (
            ESResNeXtFBSP, ESResNeXtFBSPEncoder)
        fbsp = ESResNeXtFBSP(
            n_fft=enc_args.get("n_fft", 2048),
            hop_length=enc_args.get("hop_length", 561),
            win_length=enc_args.get("win_length", 1654),
            window=enc_args.get("window", "blackmanharris"),
            normalized=enc_args.get("normalized", True),
            num_classes=enc_args.get("num_classes", 527),
            apply_attention=enc_args.get("apply_attention", True))
        encoder = ESResNeXtFBSPEncoder(fbsp_model=fbsp)
        input_mode = "raw_wav"
        sample_rate = enc_args.get("sample_rate", 44100)
        enc_out_dim = 2048
        if enc_cfg.get("pretrained"):
            pretrained.append(("encoder/fbsp_model", enc_cfg["pretrained"],
                               "esresnext"))
    elif enc_type == "RnnEncoder":
        # precomputed-feature input (the reference's attn/attn_len
        # contract, rnn_encoder.py:10-49)
        from audiocaption_tpu.models.rnn_encoder import RnnEncoder
        encoder = RnnEncoder(
            hidden_size=enc_args.get("hidden_size", 512),
            bidirectional=enc_args.get("bidirectional", False),
            num_layers=enc_args.get("num_layers", 1),
            dropout=enc_args.get("dropout", 0.2),
            pooling=enc_args.get("pooling", "mean"))
        input_mode = "features"
        enc_out_dim = (enc_args.get("hidden_size", 512) *
                       (2 if enc_args.get("bidirectional", False) else 1))
    elif enc_type in ("TransformerEncoder", "AudioTransformerEncoder"):
        from audiocaption_tpu.models.encoders_extra import (
            AudioTransformerEncoder)
        encoder = AudioTransformerEncoder(
            d_model=enc_args.get("d_model", 512),
            nlayers=enc_args.get("nlayers", 2),
            nhead=enc_args.get("nhead"),
            dim_feedforward=enc_args.get("dim_feedforward"),
            dropout=enc_args.get("dropout", 0.2))
        input_mode = "features"
        enc_out_dim = enc_args.get("d_model", 512)
    elif enc_type == "M2TransformerEncoder":
        # meshed-memory encoder (transformer_encoder.py:22-62) — native
        # build, no external package needed (models/m2.py)
        from audiocaption_tpu.models.m2 import M2TransformerEncoder
        encoder = M2TransformerEncoder(
            d_model=enc_args.get("d_model", 512),
            nlayers=enc_args.get("nlayers", 2),
            nhead=enc_args.get("nhead"),
            dim_feedforward=enc_args.get("dim_feedforward"),
            dropout=enc_args.get("dropout", 0.1),
            n_memory=enc_args.get("m", 40),
            compute_dtype=compute_dtype)
        input_mode = "features"
        enc_out_dim = enc_args.get("d_model", 512)
    else:
        raise ValueError(f"unsupported encoder type: {enc_type}")

    dec_cfg = model_cfg["decoder"]
    dec_type = _short(dec_cfg["type"])
    dec_args = dict(dec_cfg.get("args", {}) or {})
    vocab = vocab_size or dec_args.get("vocab_size")
    if vocab is None:
        raise ValueError("vocab_size required (config or tokenizer)")

    if dec_type in ("TransformerDecoder", "EventTransformerDecoder",
                    "KeywordProbTransformerDecoder"):
        from audiocaption_tpu.models import transformer_decoder as TD
        cls = getattr(TD, dec_type)
        extra = {}
        if dec_type == "EventTransformerDecoder":
            extra["event_classes"] = dec_args.get("event_classes", 527)
        if dec_type == "KeywordProbTransformerDecoder":
            extra["keyword_classes_num"] = dec_args.get(
                "keyword_classes_num", 527)
        decoder = cls(
            emb_dim=dec_args.get("emb_dim", 256),
            vocab_size=vocab,
            attn_emb_dim=dec_args.get("attn_emb_dim", enc_out_dim),
            fc_emb_dim=dec_args.get("fc_emb_dim", enc_out_dim),
            dropout=dec_args.get("dropout", 0.2),
            nlayers=dec_args.get("nlayers", 2),
            nhead=dec_args.get("nhead"),
            dim_feedforward=dec_args.get("dim_feedforward"),
            tie_weights=dec_args.get("tie_weights", False),
            compute_dtype=compute_dtype, **extra)
    elif dec_type == "M2TransformerDecoder":
        # meshed decoder (transformer_decoder.py:106-143); d_model =
        # attn_emb_dim (:114), gates follow the encoder's level count
        from audiocaption_tpu.models.m2 import (M2TransformerDecoder,
                                                M2TransformerEncoder)
        if not isinstance(encoder, M2TransformerEncoder):
            # reference compat assert, transformer_model.py:100-101
            raise ValueError("M2TransformerDecoder requires an "
                             "M2TransformerEncoder")
        d_model = dec_args.get("attn_emb_dim", enc_out_dim)
        decoder = M2TransformerDecoder(
            emb_dim=d_model,
            vocab_size=vocab,
            attn_emb_dim=d_model,
            fc_emb_dim=dec_args.get("fc_emb_dim", enc_out_dim),
            dropout=dec_args.get("dropout", 0.1),
            nlayers=dec_args.get("nlayers", 2),
            nhead=dec_args.get("nhead"),
            dim_feedforward=dec_args.get("dim_feedforward"),
            n_enc_levels=encoder.nlayers,
            compute_dtype=compute_dtype)
    elif dec_type in ("BahAttnCatFcDecoder", "TemporalBahAttnDecoder",
                      "BahAttnAddFcDecoder", "BahAttnDecoder",
                      "ConditionalBahAttnDecoder", "StyleBahAttnDecoder",
                      "SpecificityBahAttnDecoder", "StructBahAttnDecoder",
                      "RnnFcDecoder"):
        from audiocaption_tpu.models import rnn_decoder as RD
        cls = getattr(RD, dec_type)
        decoder = cls(
            emb_dim=dec_args.get("emb_dim", 512),
            vocab_size=vocab,
            fc_emb_dim=dec_args.get("fc_emb_dim", enc_out_dim),
            attn_emb_dim=dec_args.get("attn_emb_dim", enc_out_dim),
            d_model=dec_args.get("d_model", 512),
            dropout=dec_args.get("dropout", 0.5),
            num_layers=dec_args.get("num_layers", 1))
    else:
        raise ValueError(f"unsupported decoder type: {dec_type}")

    if dec_cfg.get("pretrained"):
        pretrained.append(("decoder", dec_cfg["pretrained"], "decoder"))

    model_type = _short(model_cfg.get("type", ""))
    if model_type in ("StyleCaptionModel", "StyleSeq2SeqAttnModel"):
        # style bank + reference-caption encoder wrapper
        # (style_model.py:62-91); style vector dim = decoder emb_dim
        # (the StyleBahAttnDecoder fc slot, rnn_decoder.py:412-466)
        from audiocaption_tpu.models.style import (
            StyleBank, StyleCaptioner, TextRefEncoder)
        style_args = dict(model_cfg.get("style", {}).get("args", {}) or {})
        emb_dim = decoder.emb_dim
        captioner = StyleCaptioner(
            encoder=encoder, decoder=decoder, mel=mel,
            special=SpecialTokens(), input_mode=input_mode,
            ref_encoder=TextRefEncoder(
                vocab_size=vocab,
                d_model=style_args.get("ref_d_model", emb_dim),
                nlayers=style_args.get("ref_nlayers", 2),
                dropout=style_args.get("ref_dropout", 0.2)),
            style_bank=StyleBank(
                n_styles=style_args.get("n_styles", 4),
                style_dim=emb_dim))
        return captioner, pretrained

    captioner = Captioner(encoder=encoder, decoder=decoder, mel=mel,
                          special=SpecialTokens(), input_mode=input_mode)
    return captioner, pretrained


def load_pretrained_into(variables: Dict, spec: Tuple[str, str, str]
                         ) -> Dict:
    """Apply one pretrained spec (path, ckpt, kind) to a variables tree.

    Handles the reference checkpoint-format adapters: PANNs
    ({"model": ...}), COLA ("backbone." prefixes) and BLAT
    ({"state_dict": ..., "audio_encoder." prefixes})
    (cnn_encoder.py:376-412).
    """
    import numpy as np
    import torch
    from audiocaption_tpu.models import convert
    from audiocaption_tpu.models.cnn14 import convert_cnn14
    from audiocaption_tpu.models.effb2 import convert_effb2
    from audiocaption_tpu.models.transformer_decoder import (
        convert_transformer_decoder)

    subtree, ckpt_path, kind = spec
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        sd = ckpt["model"]
        if any(k.startswith("backbone.") for k in sd):  # COLA
            sd = {k[len("backbone."):]: v for k, v in sd.items()
                  if k.startswith("backbone.")}
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:  # BLAT
        sd = {k.replace("audio_encoder.", ""): v
              for k, v in ckpt["state_dict"].items() if "audio_encoder" in k}
    else:
        sd = ckpt
    sd = convert.state_dict_to_numpy(sd)

    if kind == "cnn14":
        params, stats = convert_cnn14(sd)
    elif kind == "effb2":
        params, stats = convert_effb2(sd)
    elif kind == "htsat":
        from audiocaption_tpu.models.htsat import convert_htsat
        params, stats = convert_htsat(sd)
    elif kind == "esresnext":
        from audiocaption_tpu.models.resnext import convert_esresnext
        params, stats = convert_esresnext(sd)
    elif kind == "uit":
        from audiocaption_tpu.models.uit import convert_uit
        params, stats = convert_uit(sd)
        params = {"trunk": params}
        stats = {"trunk": stats}
    elif kind == "decoder":
        if next(iter(sd)).startswith("decoder."):
            sd = {k[len("decoder."):]: v for k, v in sd.items()
                  if k.startswith("decoder.")}
        params = convert_transformer_decoder(sd)
        stats = None
    else:
        raise ValueError(kind)

    def set_path(tree, path_parts, value, merge_shapes=True):
        node = tree
        for p in path_parts[:-1]:
            node = node[p]
        target = node[path_parts[-1]]
        # shape-checked partial load (train_util.py:188-202)
        def merge(dst, src):
            out = dict(dst)
            for k, v in src.items():
                if k not in dst:
                    continue
                if isinstance(v, dict) and isinstance(dst[k], dict):
                    out[k] = merge(dst[k], v)
                elif hasattr(dst[k], "shape") and \
                        tuple(np.shape(v)) == tuple(dst[k].shape):
                    out[k] = jnp.asarray(v, dst[k].dtype)
            return out
        node[path_parts[-1]] = merge(target, value)

    import jax
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy refs
    variables = {k: dict(v) if isinstance(v, dict) else v
                 for k, v in variables.items()}
    parts = subtree.split("/")

    def deep_copy_dicts(d):
        return ({k: deep_copy_dicts(v) for k, v in d.items()}
                if isinstance(d, dict) else d)
    variables = deep_copy_dicts(variables)
    set_path(variables["params"], parts, params)
    if stats and "batch_stats" in variables:
        set_path(variables["batch_stats"], parts, stats)
    return variables
