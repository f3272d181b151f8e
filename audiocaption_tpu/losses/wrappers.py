"""Composite loss wrappers (TPU re-design of
captioning/losses/loss.py:77-219): weighted sums, augmentation
discounting, discriminator-based condition loss with straight-through /
gumbel relaxations, and expected-specificity regression.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from audiocaption_tpu.ops.masking import length_mask, mean_with_lens

Array = jnp.ndarray


def multiple_loss_sum(loss_fns: Sequence[Callable[[Dict], Array]],
                      weights: Sequence[float]) -> Callable[[Dict], Array]:
    """Weighted sum of losses; a loss already present in the output dict
    by name is used directly (loss.py:77-103 semantics via the
    ``precomputed`` key convention)."""
    def fn(output: Dict) -> Array:
        total = 0.0
        for loss_fn, w in zip(loss_fns, weights):
            total = total + w * loss_fn(output)
        return total
    return fn


def augment_loss_wrapper(loss_fn_none: Callable[[Dict], Array],
                         eps: float = 1e-12) -> Callable[[Dict], Array]:
    """Discounted augmented-sample loss (loss.py:105-126).

    Expects output["aug_keep"]: float [N] mask — 1 for real samples and
    for augmented samples kept this step (the Bernoulli(use_aug_prob)
    draw happens host-side in the runner, since cap_ids are strings).
    ``loss_fn_none`` must return per-token losses (reduction="none").
    """
    def fn(output: Dict) -> Array:
        loss = loss_fn_none(output)               # [N, T]
        keep = output["aug_keep"].astype(loss.dtype)
        loss = loss * keep[:, None]
        mask = length_mask(output["tgt_len"], loss.shape[1]
                           ).astype(loss.dtype) * keep[:, None]
        return jnp.sum(loss) / (jnp.sum(mask) + eps)
    return fn


def reparameterize_argmax(logit: Array) -> Array:
    """Straight-through hard one-hot (loss.py:129-139): forward =
    one-hot(argmax), gradient = identity wrt logit."""
    idx = jnp.argmax(logit, axis=-1)
    hard = jax.nn.one_hot(idx, logit.shape[-1], dtype=logit.dtype)
    return jax.lax.stop_gradient(hard - logit) + logit


def gumbel_softmax(key: jax.Array, logit: Array,
                   temperature: float = 1.0) -> Array:
    """Straight-through gumbel-softmax one-hot (loss.py:141-161)."""
    u = jax.random.uniform(key, logit.shape)
    g = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
    y = jax.nn.softmax((logit + g) / temperature, axis=-1)
    idx = jnp.argmax(y, axis=-1)
    hard = jax.nn.one_hot(idx, logit.shape[-1], dtype=y.dtype)
    return jax.lax.stop_gradient(hard - y) + y


def condition_loss_wrapper(loss_fn: Callable[[Dict], Array],
                           dscrm_apply: Callable[[Array, Array], Array],
                           alpha: float = 1.0,
                           sample_method: str = "argmax"
                           ) -> Callable[[Dict], Array]:
    """Discriminator BCE condition loss (loss.py:164-195): relax the
    predicted tokens into (soft) one-hots, feed the human/machine
    discriminator, and add BCE against the target condition.

    ``dscrm_apply(soft_caps [N,T,V], tgt_len) -> probs [N]``.
    """
    def fn(output: Dict) -> Array:
        word_loss = loss_fn(output)
        logit = output["logit"]
        if sample_method == "argmax":
            preds = reparameterize_argmax(logit)
        elif sample_method == "gumbel":
            preds = gumbel_softmax(output["rng"], logit)
        elif sample_method == "weighted":
            preds = jax.nn.softmax(logit, axis=-1)
        else:
            raise ValueError(sample_method)
        tgt_len = output["tgt_len"] - 1   # remove <eos>
        probs = jnp.clip(dscrm_apply(preds, tgt_len), 1e-7, 1 - 1e-7)
        cond = output["conditions"].astype(probs.dtype)
        bce = -jnp.mean(cond * jnp.log(probs) +
                        (1 - cond) * jnp.log(1 - probs))
        return word_loss + alpha * bce
    return fn


def specificity_loss_wrapper(loss_fn: Callable[[Dict], Array],
                             word_specificity: Array,
                             sentence_reduce: str = "sum",
                             alpha: float = 1.0
                             ) -> Callable[[Dict], Array]:
    """Expected word-specificity MSE (loss.py:198-219)."""
    ws = jnp.asarray(word_specificity)

    def fn(output: Dict) -> Array:
        word_loss = loss_fn(output)
        probs = jax.nn.softmax(output["logit"], axis=-1)
        cond_pred = probs @ ws                    # [N, T]
        tgt_len = output["tgt_len"] - 1
        if sentence_reduce == "sum":
            mask = length_mask(tgt_len, cond_pred.shape[1]
                               ).astype(cond_pred.dtype)
            cond_pred = jnp.sum(cond_pred * mask, axis=1)
        else:
            cond_pred = mean_with_lens(cond_pred, tgt_len)
        mse = jnp.mean((cond_pred - output["conditions"]) ** 2)
        return word_loss + alpha * mse
    return fn
