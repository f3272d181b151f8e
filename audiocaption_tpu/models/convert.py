"""PyTorch state_dict -> flax param-tree converters.

The reference model zoo ships torch checkpoints (PANNs Cnn14, HEAR
EffB2, the HF captioning models — README.md:25-31,171).  These helpers
map torch tensor layouts onto the layouts used by
``audiocaption_tpu.models.layers``:

  * Linear:      torch [out, in]        -> kernel [in, out]
  * Conv2d:      torch [O, I, kh, kw]   -> kernel [kh, kw, I, O] (NHWC/HWIO)
  * Depthwise:   torch [O, 1, kh, kw]   -> kernel [kh, kw, 1, O]
  * GRU:         torch weight_ih_l{k} [3H, in] -> w_ih_l{k} [in, 3H]
  * MHA:         torch packed in_proj_weight [3E, E] -> q/k/v kernels
  * BatchNorm:   weight/bias -> scale/bias; running stats -> batch_stats

All functions take a dict of numpy arrays (use ``state_dict_to_numpy``
on a loaded torch checkpoint) and return nested plain dicts compatible
with flax param trees.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                            else v)
    return out


def _k(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def sub(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Select keys under `prefix.` and strip the prefix."""
    p = prefix + "."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def linear(sd, prefix: str, bias: bool = True) -> Dict:
    params = {"kernel": sd[_k(prefix, "weight")].T}
    if bias and _k(prefix, "bias") in sd:
        params["bias"] = sd[_k(prefix, "bias")]
    return params


def embedding(sd, prefix: str) -> Dict:
    return {"embedding": sd[_k(prefix, "weight")]}


def conv2d(sd, prefix: str, depthwise: bool = False, bias: bool = False) -> Dict:
    w = sd[_k(prefix, "weight")]  # [O, I/groups, kh, kw]
    params = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if bias and _k(prefix, "bias") in sd:
        params["bias"] = sd[_k(prefix, "bias")]
    return params


def batchnorm(sd, prefix: str) -> Tuple[Dict, Dict]:
    """-> (params {scale, bias}, batch_stats {mean, var})."""
    params = {"scale": sd[_k(prefix, "weight")], "bias": sd[_k(prefix, "bias")]}
    stats = {"mean": sd[_k(prefix, "running_mean")],
             "var": sd[_k(prefix, "running_var")]}
    return params, stats


def layernorm(sd, prefix: str) -> Dict:
    return {"scale": sd[_k(prefix, "weight")], "bias": sd[_k(prefix, "bias")]}


def mha(sd, prefix: str) -> Dict:
    """torch nn.MultiheadAttention -> MultiheadAttention params."""
    w = sd[_k(prefix, "in_proj_weight")]      # [3E, E]
    b = sd.get(_k(prefix, "in_proj_bias"))    # [3E]
    E = w.shape[1]
    wq, wk, wv = w[:E], w[E:2 * E], w[2 * E:]
    out = {
        "q_proj": {"kernel": wq.T},
        "k_proj": {"kernel": wk.T},
        "v_proj": {"kernel": wv.T},
        "out_proj": linear(sd, _k(prefix, "out_proj")),
    }
    if b is not None:
        out["q_proj"]["bias"] = b[:E]
        out["k_proj"]["bias"] = b[E:2 * E]
        out["v_proj"]["bias"] = b[2 * E:]
    return out


def transformer_decoder_layer(sd, prefix: str) -> Dict:
    """torch nn.TransformerDecoderLayer -> TransformerDecoderLayer params.

    torch names: self_attn, multihead_attn, linear1/2, norm1/2/3.
    """
    return {
        "self_attn": mha(sd, _k(prefix, "self_attn")),
        "cross_attn": mha(sd, _k(prefix, "multihead_attn")),
        "linear1": linear(sd, _k(prefix, "linear1")),
        "linear2": linear(sd, _k(prefix, "linear2")),
        "norm1": layernorm(sd, _k(prefix, "norm1")),
        "norm2": layernorm(sd, _k(prefix, "norm2")),
        "norm3": layernorm(sd, _k(prefix, "norm3")),
    }


def gru(sd, prefix: str, num_layers: int, bidirectional: bool) -> Dict:
    """torch nn.GRU -> GRU module params (full-sequence encoder form)."""
    params = {}
    for layer in range(num_layers):
        for d in range(2 if bidirectional else 1):
            t_suf = f"l{layer}" + ("_reverse" if d == 1 else "")
            params[f"w_ih_{t_suf}"] = sd[_k(prefix, f"weight_ih_{t_suf}")].T
            params[f"b_ih_{t_suf}"] = sd[_k(prefix, f"bias_ih_{t_suf}")]
            params[f"cell_{t_suf}"] = {
                "w_hh": sd[_k(prefix, f"weight_hh_{t_suf}")].T,
                "b_hh": sd[_k(prefix, f"bias_hh_{t_suf}")],
            }
    return params


def gru_cell_stack(sd, prefix: str, num_layers: int) -> Dict:
    """torch nn.GRU (used step-wise in decoders) -> GRUCellStack params."""
    params = {}
    for layer in range(num_layers):
        params[f"w_ih_l{layer}"] = sd[_k(prefix, f"weight_ih_l{layer}")].T
        params[f"b_ih_l{layer}"] = sd[_k(prefix, f"bias_ih_l{layer}")]
        params[f"cell_l{layer}"] = {
            "w_hh": sd[_k(prefix, f"weight_hh_l{layer}")].T,
            "b_hh": sd[_k(prefix, f"bias_hh_l{layer}")],
        }
    return params


def conv_block(sd, prefix: str) -> Tuple[Dict, Dict]:
    """PANNs ConvBlock -> (params, batch_stats)."""
    bn1_p, bn1_s = batchnorm(sd, _k(prefix, "bn1"))
    bn2_p, bn2_s = batchnorm(sd, _k(prefix, "bn2"))
    params = {
        "conv1": conv2d(sd, _k(prefix, "conv1")),
        "conv2": conv2d(sd, _k(prefix, "conv2")),
        "bn1": bn1_p, "bn2": bn2_p,
    }
    stats = {"bn1": bn1_s, "bn2": bn2_s}
    return params, stats
