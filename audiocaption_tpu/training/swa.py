"""Stochastic weight averaging over params *and* BatchNorm statistics,
matching the reference's custom AveragedModel (train_util.py:233-253)
which averages buffers too so the SWA model needs no BN re-estimation.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def swa_init(params: Any, batch_stats: Any) -> Tuple[Any, Any, jnp.ndarray]:
    """-> (swa_params, swa_batch_stats, n_averaged)."""
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    return copy(params), copy(batch_stats), jnp.zeros((), jnp.int32)


def swa_update(swa: Tuple[Any, Any, jnp.ndarray], params: Any,
               batch_stats: Any) -> Tuple[Any, Any, jnp.ndarray]:
    """avg <- avg + (new - avg) / (n + 1)  (train_util.py:246-253)."""
    swa_p, swa_s, n = swa
    def avg(a, b):
        a32 = a.astype(jnp.float32)
        return (a32 + (b.astype(jnp.float32) - a32) /
                (n + 1).astype(jnp.float32)).astype(a.dtype)
    return (jax.tree_util.tree_map(avg, swa_p, params),
            jax.tree_util.tree_map(avg, swa_s, batch_stats),
            n + 1)
