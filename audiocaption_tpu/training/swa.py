"""Stochastic weight averaging over params *and* BatchNorm statistics,
matching the reference's custom AveragedModel (train_util.py:233-253)
which averages buffers too so the SWA model needs no BN re-estimation.

Backend-agnostic on purpose: given device (jax) trees the average lives
on device; given host numpy trees (the checkpoint worker's fetched
variables, cli/run.py ``_ckpt_job``) everything stays numpy — the
worker thread must not dispatch device ops concurrently with the main
thread's train step (XLA aborts on some backends).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_host(tree: Any) -> bool:
    leaves = jax.tree_util.tree_leaves(tree)
    return bool(leaves) and isinstance(leaves[0], np.ndarray)


def swa_init(params: Any, batch_stats: Any) -> Tuple[Any, Any, Any]:
    """-> (swa_params, swa_batch_stats, n_averaged)."""
    if _is_host(params):
        arr, zero = np.array, np.zeros((), np.int32)
    else:
        arr, zero = jnp.array, jnp.zeros((), jnp.int32)
    copy = lambda t: jax.tree_util.tree_map(arr, t)
    return copy(params), copy(batch_stats), zero


def swa_update(swa: Tuple[Any, Any, Any], params: Any,
               batch_stats: Any) -> Tuple[Any, Any, Any]:
    """avg <- avg + (new - avg) / (n + 1)  (train_util.py:246-253)."""
    swa_p, swa_s, n = swa
    f32 = np.float32 if _is_host(swa_p) else jnp.float32
    def avg(a, b):
        a32 = a.astype(f32)
        return (a32 + (b.astype(f32) - a32) /
                (n + 1).astype(f32)).astype(a.dtype)
    return (jax.tree_util.tree_map(avg, swa_p, params),
            jax.tree_util.tree_map(avg, swa_s, batch_stats),
            n + 1)
