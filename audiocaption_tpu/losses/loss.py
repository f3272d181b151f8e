"""Caption training losses (TPU re-design of captioning/losses/loss.py).

All losses are pure functions over the model output dict; the length
mask replicates the reference's semantics (mean = sum / mask.sum,
loss.py:18-74).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from audiocaption_tpu.ops.masking import length_mask

Array = jnp.ndarray


def _reduce(loss: Array, mask: Array, reduction: str) -> Array:
    loss = loss * mask
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.sum(loss) / jnp.sum(mask)
    raise ValueError(reduction)


def cross_entropy_loss(logit: Array, tgt: Array, tgt_len: Array,
                       reduction: str = "mean") -> Array:
    """Token CE with length mask (loss.py:10-37)."""
    lp = jax.nn.log_softmax(logit.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    mask = length_mask(tgt_len, tgt.shape[1]).astype(jnp.float32)
    return _reduce(nll, mask, reduction)


def label_smoothing_loss(logit: Array, tgt: Array, tgt_len: Array,
                         smoothing: float = 0.1,
                         reduction: str = "mean") -> Array:
    """Smoothed CE matching loss.py:40-74: off-target mass is
    smoothing/(V-1); note the true class also receives that base mass in
    the reference via fill_+scatter_ (scatter overwrites, so actually
    confidence replaces it — reproduced here)."""
    V = logit.shape[-1]
    lp = jax.nn.log_softmax(logit.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    base = smoothing / (V - 1)
    # -sum(true_dist * lp) = -(base * sum(lp)) - (confidence - base) * lp[tgt]
    lp_tgt = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    loss = -(base * jnp.sum(lp, axis=-1) + (confidence - base) * lp_tgt)
    mask = length_mask(tgt_len, tgt.shape[1]).astype(jnp.float32)
    return _reduce(loss, mask, reduction)


def masked_token_loss(kind: str = "label_smoothing",
                      smoothing: float = 0.1) -> Callable[[Dict], Array]:
    """Loss over a model output dict with keys logit/tgt/tgt_len
    (the reference's loss_fn(output_dict) protocol)."""
    def fn(output: Dict) -> Array:
        if kind == "cross_entropy":
            return cross_entropy_loss(output["logit"], output["tgt"],
                                      output["tgt_len"])
        return label_smoothing_loss(output["logit"], output["tgt"],
                                    output["tgt_len"], smoothing)
    return fn


def build_loss(config: Dict) -> Callable[[Dict], Array]:
    """Build a loss from a config node {type, args} (YAML parity; accepts
    both our names and the reference dotted paths)."""
    type_name = config.get("type", "LabelSmoothingLoss").split(".")[-1]
    args = config.get("args", {}) or {}
    if type_name == "LabelSmoothingLoss":
        return masked_token_loss("label_smoothing",
                                 args.get("smoothing", 0.0))
    if type_name == "CrossEntropyLoss":
        return masked_token_loss("cross_entropy")
    raise ValueError(f"unknown loss type: {type_name}")
