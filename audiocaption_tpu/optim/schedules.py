"""LR schedules as optax-style callables (count -> lr), matching the
reference's torch schedulers (captioning/utils/lr_scheduler.py:5-128).

torch's _LRScheduler is 1-based (step() runs once at construction), so
every schedule here evaluates at ``count + 1``.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp


def exponential_decay_with_warmup(base_lr: float, final_lr: float,
                                  total_iters: int,
                                  warmup_iters: int = 3000
                                  ) -> Callable:
    """lr_scheduler.py:5-47: linear warmup to base_lr, then exponential
    decay reaching final_lr at total_iters."""
    base = (final_lr / base_lr) ** (1.0 / (total_iters - warmup_iters))

    def schedule(count):
        it = count + 1
        warm = base_lr * it / warmup_iters
        decay = base_lr * base ** (it - warmup_iters)
        return jnp.where(it <= warmup_iters, warm, decay)
    return schedule


def noam_schedule(model_size: int = 512, factor: float = 1.0,
                  warmup_iters: int = 3000) -> Callable:
    """lr_scheduler.py:50-71."""
    def schedule(count):
        it = jnp.maximum(count + 1, 1).astype(jnp.float32)
        return factor * model_size ** (-0.5) * jnp.minimum(
            it ** (-0.5), it * warmup_iters ** (-1.5))
    return schedule


def cosine_with_warmup(base_lr: float, total_iters: int, warmup_iters: int,
                       num_cycles: float = 0.5) -> Callable:
    """lr_scheduler.py:74-98."""
    def schedule(count):
        it = (count + 1).astype(jnp.float32) if hasattr(count, "astype") \
            else float(count + 1)
        warm = it / max(1, warmup_iters)
        progress = (it - warmup_iters) / max(1, total_iters - warmup_iters)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress)))
        return base_lr * jnp.where(it < warmup_iters, warm, cos)
    return schedule


def build_schedule(config: Dict, base_lr: float, total_iters: int,
                   warmup_iters: int) -> Callable:
    """From a YAML node {type, args}; injects total/warmup iters like the
    runner does (run.py:244-254, default warmup = total // 5)."""
    type_name = config.get("type", "ExponentialDecayScheduler").split(".")[-1]
    args = dict(config.get("args", {}) or {})
    args.setdefault("warmup_iters", warmup_iters)
    if type_name == "ExponentialDecayScheduler":
        return exponential_decay_with_warmup(
            base_lr, args.get("final_lrs", args.get("final_lr", 1e-7)),
            total_iters, args["warmup_iters"])
    if type_name == "NoamScheduler":
        return noam_schedule(args.get("model_size", 512),
                             args.get("factor", 1.0), args["warmup_iters"])
    if type_name == "CosineWithWarmup":
        return cosine_with_warmup(base_lr, total_iters, args["warmup_iters"],
                                  args.get("num_cycles", 0.5))
    raise ValueError(f"unknown scheduler: {type_name}")
