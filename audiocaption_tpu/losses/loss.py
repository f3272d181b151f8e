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
                      smoothing: float = 0.1,
                      reduction: str = "mean") -> Callable[[Dict], Array]:
    """Loss over a model output dict with keys logit/tgt/tgt_len
    (the reference's loss_fn(output_dict) protocol)."""
    def fn(output: Dict) -> Array:
        if kind == "cross_entropy":
            return cross_entropy_loss(output["logit"], output["tgt"],
                                      output["tgt_len"],
                                      reduction=reduction)
        return label_smoothing_loss(output["logit"], output["tgt"],
                                    output["tgt_len"], smoothing,
                                    reduction=reduction)
    return fn


def build_loss(config: Dict, dscrm_apply: Callable = None
               ) -> Callable[[Dict], Array]:
    """Build a loss from a config node {type, args} (YAML parity; accepts
    both our names and the reference dotted paths).

    Composite wrappers (reference loss.py:77-219) build recursively:
      MultipleLossSum       args: {losses: [node...], weights: [...]}
      AugmentLossWrapper    args: {loss: node}
      ConditionLossWrapper  args: {loss: node, alpha, sample_method,
                                   dscrm: {vocab_size, emb_dim,
                                   hidden_size, checkpoint}}
                            (or pass ``dscrm_apply`` directly)
      SpecificityLossWrapper args: {loss: node, word_specificity: .npy,
                                    sentence_reduce, alpha}
    """
    type_name = config.get("type", "LabelSmoothingLoss").split(".")[-1]
    args = config.get("args", {}) or {}
    if type_name == "LabelSmoothingLoss":
        return masked_token_loss("label_smoothing",
                                 args.get("smoothing", 0.0))
    if type_name == "CrossEntropyLoss":
        return masked_token_loss("cross_entropy")
    if type_name == "MultipleLossSum":
        from audiocaption_tpu.losses.wrappers import multiple_loss_sum
        subs = [build_loss(c, dscrm_apply) for c in args["losses"]]
        return multiple_loss_sum(subs, args["weights"])
    if type_name == "AugmentLossWrapper":
        from audiocaption_tpu.losses.wrappers import augment_loss_wrapper
        inner = config.get("args", {}).get("loss",
                                           {"type": "LabelSmoothingLoss"})
        it = inner.get("type", "LabelSmoothingLoss").split(".")[-1]
        ia = inner.get("args", {}) or {}
        none_fn = masked_token_loss(
            "cross_entropy" if it == "CrossEntropyLoss"
            else "label_smoothing", ia.get("smoothing", 0.0),
            reduction="none")
        return augment_loss_wrapper(none_fn)
    if type_name == "ConditionLossWrapper":
        from audiocaption_tpu.losses.wrappers import condition_loss_wrapper
        inner = build_loss(args.get("loss", {"type": "LabelSmoothingLoss"}))
        if dscrm_apply is None:
            dscrm_apply = _build_dscrm_apply(args["dscrm"])
        return condition_loss_wrapper(
            inner, dscrm_apply, alpha=args.get("alpha", 1.0),
            sample_method=args.get("sample_method", "argmax"))
    if type_name == "SpecificityLossWrapper":
        import numpy as np

        from audiocaption_tpu.losses.wrappers import (
            specificity_loss_wrapper)
        inner = build_loss(args.get("loss", {"type": "LabelSmoothingLoss"}))
        ws = np.load(args["word_specificity"]) \
            if isinstance(args["word_specificity"], str) \
            else args["word_specificity"]
        return specificity_loss_wrapper(
            inner, ws, sentence_reduce=args.get("sentence_reduce", "sum"),
            alpha=args.get("alpha", 1.0))
    raise ValueError(f"unknown loss type: {type_name}")


def _build_dscrm_apply(cfg: Dict) -> Callable:
    """Human/machine discriminator apply fn for ConditionLossWrapper:
    HmClassifier with sigmoid probs, weights from a flax msgpack
    checkpoint when given (reference: a separately trained
    hm_classifier, loss.py:164-171)."""
    import jax as _jax

    from audiocaption_tpu.models.hm_classifier import HmClassifier
    model = HmClassifier(vocab_size=cfg["vocab_size"],
                         emb_dim=cfg.get("emb_dim", 256),
                         hidden_size=cfg.get("hidden_size", 256))
    if cfg.get("checkpoint"):
        import flax.serialization as ser
        with open(cfg["checkpoint"], "rb") as f:
            target = _jax.eval_shape(
                lambda: model.init(_jax.random.PRNGKey(0),
                                   jnp.zeros((1, 4), jnp.int32),
                                   jnp.asarray([4])))
            variables = ser.from_bytes(
                _jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), target),
                f.read())
    else:
        variables = model.init(_jax.random.PRNGKey(cfg.get("seed", 0)),
                               jnp.zeros((1, 4), jnp.int32),
                               jnp.asarray([4]))

    def apply(soft_caps: Array, tgt_len: Array) -> Array:
        return jax.nn.sigmoid(model.apply(variables, soft_caps, tgt_len))
    return apply
