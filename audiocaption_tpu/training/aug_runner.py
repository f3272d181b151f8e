"""Augmented-corpus training utilities (TPU re-design of
python_scripts/train_eval/run_aug.py:37-99): a real batch and an
augmented batch are drawn per iteration and combined as
``loss = real + discount * aug`` with a linear or constant discount
schedule.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np


def discount_schedule(mode: str, base: float, total_iters: int
                      ) -> Callable[[int], float]:
    """run_aug.py:37-43: 'constant' keeps base; 'linear' decays base -> 0
    over training."""
    if mode == "constant":
        return lambda it: base
    if mode == "linear":
        return lambda it: base * max(0.0, 1.0 - it / total_iters)
    raise ValueError(mode)


def make_aug_train_step(model, loss_fn, tx, **kwargs):
    """Train step over (real_batch, aug_batch, discount): computes the
    discounted sum of the two batch losses in one backward pass."""
    from audiocaption_tpu.training.trainer import TrainState
    import optax

    def step_fn(state: TrainState, real: Dict, aug: Dict,
                discount: jnp.ndarray, ss_ratio: jnp.ndarray):
        rng, sample_rng, dropout_rng = jax.random.split(
            jax.random.fold_in(state.rng, state.step), 3)

        def compute_loss(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            def one(batch, rngs_salt):
                out, updates = model.apply(
                    variables, batch["wav"], batch["wav_len"],
                    batch["cap"], batch["cap_len"], ss_ratio=ss_ratio,
                    train=True, mutable=["batch_stats"],
                    rngs={"sample": jax.random.fold_in(sample_rng,
                                                       rngs_salt),
                          "dropout": jax.random.fold_in(dropout_rng,
                                                        rngs_salt)})
                out["tgt"] = batch["cap"][:, 1:]
                out["tgt_len"] = batch["cap_len"] - 1
                return loss_fn(out), updates["batch_stats"]
            real_loss, stats = one(real, 0)
            aug_loss, _ = one(aug, 1)
            return real_loss + discount * aug_loss, (real_loss, stats)

        (loss, (real_loss, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt,
                                  rng=rng)
        return new_state, {"loss": loss, "real_loss": real_loss}

    return jax.jit(step_fn)


def interleave_loaders(real_loader, aug_loader) -> Iterator:
    """Yield (real_batch, aug_batch) pairs, cycling the shorter loader
    (run_aug.py draws one batch from each per iteration)."""
    aug_iter = iter(aug_loader)
    for real in real_loader:
        try:
            aug = next(aug_iter)
        except StopIteration:
            aug_iter = iter(aug_loader)
            aug = next(aug_iter)
        yield real, aug
