"""Flax param-tree -> reference-named torch state_dict exporters.

The inverse of ``models/convert.py``: emit a flat dict of numpy arrays
in the exact key naming + tensor layout of the reference HF checkpoints
(hf_wrapper.py:1115-1181 EffB2-Trm, :1862-1973 Cnn14Rnn-TempGru), so

  * our trained weights can be shipped in the reference's zoo format
    (a user of the reference can load them with their existing code);
  * the ingestion path (hf_api.load_torch_checkpoint ->
    load_torch_state_dict -> converters) is testable offline without
    downloading the real checkpoints: export -> torch.save -> load
    must be a parity-exact roundtrip (tests/test_hf_checkpoint_io.py).

Layout inverses (convert.py:8-13):
  Linear  kernel [in, out]        -> weight [out, in]
  Conv2d  kernel [kh, kw, I, O]   -> weight [O, I, kh, kw]
  GRU     w_ih [in, 3H]           -> weight_ih_l{k} [3H, in]
  MHA     q/k/v kernels           -> packed in_proj_weight [3E, E]
  BN      scale/bias + mean/var   -> weight/bias/running_mean/running_var
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _n(x) -> np.ndarray:
    return np.asarray(x)


def linear(p: Dict, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = _n(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _n(p["bias"])


def embedding(p: Dict, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = _n(p["embedding"])


def conv2d(p: Dict, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = np.transpose(_n(p["kernel"]), (3, 2, 0, 1))
    if "bias" in p:
        out[f"{prefix}.bias"] = _n(p["bias"])


def batchnorm(p: Dict, s: Dict, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = _n(p["scale"])
    out[f"{prefix}.bias"] = _n(p["bias"])
    out[f"{prefix}.running_mean"] = _n(s["mean"])
    out[f"{prefix}.running_var"] = _n(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def layernorm(p: Dict, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = _n(p["scale"])
    out[f"{prefix}.bias"] = _n(p["bias"])


def mha(p: Dict, prefix: str, out: Dict) -> None:
    wq = _n(p["q_proj"]["kernel"]).T
    wk = _n(p["k_proj"]["kernel"]).T
    wv = _n(p["v_proj"]["kernel"]).T
    out[f"{prefix}.in_proj_weight"] = np.concatenate([wq, wk, wv], axis=0)
    if "bias" in p["q_proj"]:
        out[f"{prefix}.in_proj_bias"] = np.concatenate(
            [_n(p["q_proj"]["bias"]), _n(p["k_proj"]["bias"]),
             _n(p["v_proj"]["bias"])], axis=0)
    linear(p["out_proj"], f"{prefix}.out_proj", out)


def gru(p: Dict, prefix: str, num_layers: int, bidirectional: bool,
        out: Dict) -> None:
    for layer in range(num_layers):
        for d in range(2 if bidirectional else 1):
            suf = f"l{layer}" + ("_reverse" if d == 1 else "")
            out[f"{prefix}.weight_ih_{suf}"] = _n(p[f"w_ih_{suf}"]).T
            out[f"{prefix}.bias_ih_{suf}"] = _n(p[f"b_ih_{suf}"])
            cell = p[f"cell_{suf}"]
            out[f"{prefix}.weight_hh_{suf}"] = _n(cell["w_hh"]).T
            out[f"{prefix}.bias_hh_{suf}"] = _n(cell["b_hh"])


def gru_cell_stack(p: Dict, prefix: str, num_layers: int,
                   out: Dict) -> None:
    for layer in range(num_layers):
        out[f"{prefix}.weight_ih_l{layer}"] = _n(p[f"w_ih_l{layer}"]).T
        out[f"{prefix}.bias_ih_l{layer}"] = _n(p[f"b_ih_l{layer}"])
        cell = p[f"cell_l{layer}"]
        out[f"{prefix}.weight_hh_l{layer}"] = _n(cell["w_hh"]).T
        out[f"{prefix}.bias_hh_l{layer}"] = _n(cell["b_hh"])


def conv_block(p: Dict, s: Dict, prefix: str, out: Dict) -> None:
    conv2d(p["conv1"], f"{prefix}.conv1", out)
    conv2d(p["conv2"], f"{prefix}.conv2", out)
    batchnorm(p["bn1"], s["bn1"], f"{prefix}.bn1", out)
    batchnorm(p["bn2"], s["bn2"], f"{prefix}.bn2", out)


# --------------------------------------------------------------------------
# Model-level exporters (inverse of the model-level converters)
# --------------------------------------------------------------------------

def effb2_state_dict(params: Dict, stats: Dict, prefix: str = "",
                     out: Dict = None) -> Dict[str, np.ndarray]:
    """Inverse of effb2.convert_effb2 (efficientnet_pytorch naming)."""
    from audiocaption_tpu.models.effb2 import _b2_block_plan
    out = {} if out is None else out
    k = lambda name: f"{prefix}.{name}" if prefix else name
    conv2d(params["conv_stem"], k("_conv_stem"), out)
    batchnorm(params["bn0"], stats["bn0"], k("_bn0"), out)
    for i, args in enumerate(_b2_block_plan()):
        bp, bs = params[f"block{i}"], stats[f"block{i}"]
        tp = k(f"_blocks.{i}")
        if args["expand_ratio"] != 1:
            conv2d(bp["expand_conv"], f"{tp}._expand_conv", out)
            batchnorm(bp["bn0"], bs["bn0"], f"{tp}._bn0", out)
        conv2d(bp["depthwise_conv"], f"{tp}._depthwise_conv", out)
        batchnorm(bp["bn1"], bs["bn1"], f"{tp}._bn1", out)
        conv2d(bp["se_reduce"], f"{tp}._se_reduce", out)
        conv2d(bp["se_expand"], f"{tp}._se_expand", out)
        conv2d(bp["project_conv"], f"{tp}._project_conv", out)
        batchnorm(bp["bn2"], bs["bn2"], f"{tp}._bn2", out)
    conv2d(params["conv_head"], k("_conv_head"), out)
    batchnorm(params["bn1"], stats["bn1"], k("_bn1"), out)
    return out


def transformer_decoder_state_dict(params: Dict, prefix: str = "",
                                   nlayers: int = 2,
                                   tie_weights: bool = True,
                                   out: Dict = None
                                   ) -> Dict[str, np.ndarray]:
    """Inverse of transformer_decoder.convert_transformer_decoder."""
    out = {} if out is None else out
    k = lambda name: f"{prefix}.{name}" if prefix else name
    embedding(params["word_embedding"], k("word_embedding"), out)
    linear(params["attn_proj_dense"], k("attn_proj.0"), out)
    layernorm(params["attn_proj_norm"], k("attn_proj.3"), out)
    if "pe" in params:
        out[k("pos_encoder.pe")] = _n(params["pe"])[:, None, :]
    for i in range(nlayers):
        lp = params[f"layer{i}"]
        tp = k(f"model.layers.{i}")
        mha(lp["self_attn"], f"{tp}.self_attn", out)
        mha(lp["cross_attn"], f"{tp}.multihead_attn", out)
        linear(lp["linear1"], f"{tp}.linear1", out)
        linear(lp["linear2"], f"{tp}.linear2", out)
        layernorm(lp["norm1"], f"{tp}.norm1", out)
        layernorm(lp["norm2"], f"{tp}.norm2", out)
        layernorm(lp["norm3"], f"{tp}.norm3", out)
    if not tie_weights and "classifier" in params:
        linear(params["classifier"], k("classifier"), out)
    return out


def cnn14_state_dict(params: Dict, stats: Dict, prefix: str = "",
                     out: Dict = None) -> Dict[str, np.ndarray]:
    """Inverse of cnn14.convert_cnn14."""
    out = {} if out is None else out
    k = lambda name: f"{prefix}.{name}" if prefix else name
    batchnorm(params["bn0"], stats["bn0"], k("bn0"), out)
    for i in range(1, 7):
        conv_block(params[f"conv_block{i}"], stats[f"conv_block{i}"],
                   k(f"conv_block{i}"), out)
    if "fc1" in params:
        linear(params["fc1"], k("fc1"), out)
    return out


def cnn14_rnn_state_dict(params: Dict, stats: Dict,
                         cnn_prefix: str = "cnn", rnn_prefix: str = "rnn",
                         rnn_num_layers: int = 3,
                         rnn_bidirectional: bool = True,
                         out: Dict = None) -> Dict[str, np.ndarray]:
    """Inverse of rnn_encoder.convert_cnn14_rnn."""
    out = {} if out is None else out
    cnn14_state_dict(params["cnn"], stats["cnn"], cnn_prefix, out)
    gru(params["rnn"]["network"], f"{rnn_prefix}.network",
        rnn_num_layers, rnn_bidirectional, out)
    return out


def bahattn_decoder_state_dict(params: Dict, prefix: str = "",
                               num_layers: int = 1,
                               temporal: bool = False,
                               out: Dict = None) -> Dict[str, np.ndarray]:
    """Inverse of rnn_decoder.convert_bahattn_decoder."""
    out = {} if out is None else out
    k = lambda name: f"{prefix}.{name}" if prefix else name
    embedding(params["word_embedding"], k("word_embedding"), out)
    gru_cell_stack(params["model"], k("model"), num_layers, out)
    linear(params["attn"]["h2attn"], k("attn.h2attn"), out)
    out[k("attn.v")] = _n(params["attn"]["v"])
    linear(params["fc_proj"], k("fc_proj"), out)
    linear(params["ctx_proj"], k("ctx_proj"), out)
    linear(params["classifier"], k("classifier"), out)
    if temporal:
        embedding(params["temporal_embedding"], k("temporal_embedding"),
                  out)
    return out


def cnn8rnn_state_dict(params: Dict, stats: Dict, prefix: str = "",
                       out: Dict = None) -> Dict[str, np.ndarray]:
    """Inverse of sed.convert_cnn8rnn."""
    out = {} if out is None else out
    k = lambda name: f"{prefix}.{name}" if prefix else name
    batchnorm(params["bn0"], stats["bn0"], k("bn0"), out)
    for i in range(1, 5):
        conv_block(params[f"conv_block{i}"], stats[f"conv_block{i}"],
                   k(f"conv_block{i}"), out)
    linear(params["fc1"], k("fc1"), out)
    gru(params["rnn"], k("rnn"), 1, True, out)
    linear(params["fc_audioset"], k("fc_audioset"), out)
    return out


# --------------------------------------------------------------------------
# HF-checkpoint exporters (the exact key space the HF zoo ships)
# --------------------------------------------------------------------------

def effb2_trm_hf_state_dict(variables: Dict, nlayers: int = 2,
                            tie_weights: bool = True
                            ) -> Dict[str, np.ndarray]:
    """Our flax variables -> the wsntxxn/effb2-trm-* checkpoint key
    space (hf_wrapper.py:1144-1160: model.model.encoder.backbone.eff_net
    + model.model.decoder)."""
    import jax
    variables = jax.device_get(variables)
    out: Dict[str, np.ndarray] = {}
    effb2_state_dict(variables["params"]["encoder"],
                     variables["batch_stats"]["encoder"],
                     "model.model.encoder.backbone.eff_net", out)
    transformer_decoder_state_dict(variables["params"]["decoder"],
                                   "model.model.decoder",
                                   nlayers=nlayers,
                                   tie_weights=tie_weights, out=out)
    return out


def cnn14rnn_tempgru_hf_state_dict(variables: Dict, sed_variables: Dict,
                                   rnn_num_layers: int = 3
                                   ) -> Dict[str, np.ndarray]:
    """Our flax variables -> the wsntxxn/cnn14rnn-tempgru checkpoint key
    space (hf_wrapper.py:1898-1935: cap_model.encoder.{cnn,rnn} +
    cap_model.decoder + sed_model)."""
    import jax
    variables = jax.device_get(variables)
    sed_variables = jax.device_get(sed_variables)
    out: Dict[str, np.ndarray] = {}
    cnn14_rnn_state_dict(variables["params"]["encoder"],
                         variables["batch_stats"]["encoder"],
                         "cap_model.encoder.cnn", "cap_model.encoder.rnn",
                         rnn_num_layers=rnn_num_layers, out=out)
    bahattn_decoder_state_dict(variables["params"]["decoder"],
                               "cap_model.decoder", temporal=True, out=out)
    cnn8rnn_state_dict(sed_variables["params"],
                       sed_variables["batch_stats"], "sed_model", out)
    return out
