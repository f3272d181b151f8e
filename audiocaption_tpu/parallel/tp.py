"""Tensor-parallel sharding over a 2-D ('data', 'model') mesh.

The reference only ever data-parallelizes (DDP, run_ddp.py:33-108); this
module goes beyond it with GSPMD tensor parallelism for the decoder —
the standard Megatron layout expressed purely as parameter shardings:

  * attention q/k/v projections column-sharded (head sharding) and the
    output projection row-sharded (XLA inserts the all-reduce);
  * MLP linear1 column-sharded, linear2 row-sharded;
  * the vocabulary classifier column-sharded (the vocab axis is by far
    the widest decoder matmul) and the word embedding row-sharded.

Nothing in the model code changes: parameters are placed with
``NamedSharding`` and ``jax.jit`` propagates the layout through the
program, inserting collectives over ICI.  Encoders (conv stacks) stay
replicated — at audio-captioning sizes they are data-parallel-friendly
and TP would only add collective latency.

Usage:
    mesh = make_tp_mesh(jax.devices(), model_parallel=2)
    state = create_sharded_train_state(variables, tx, rng, mesh)
    step = make_train_step(model, loss_fn, tx, mesh=mesh)   # placement-
    batch = shard_batch(batch, mesh)                        # driven
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-regex -> PartitionSpec; first match wins, default replicated
DEFAULT_TP_RULES: List[Tuple[str, P]] = [
    (r".*word_embedding/embedding$", P("model", None)),
    (r".*classifier/kernel$", P(None, "model")),
    (r".*classifier/bias$", P("model")),
    (r".*(self_attn|cross_attn)/(q_proj|k_proj|v_proj)/kernel$",
     P(None, "model")),
    (r".*(self_attn|cross_attn)/(q_proj|k_proj|v_proj)/bias$",
     P("model")),
    (r".*(self_attn|cross_attn)/out_proj/kernel$", P("model", None)),
    (r".*linear1/kernel$", P(None, "model")),
    (r".*linear1/bias$", P("model")),
    (r".*linear2/kernel$", P("model", None)),
]


def make_tp_mesh(devices: Optional[Sequence] = None,
                 model_parallel: int = 2) -> Mesh:
    """2-D mesh [data, model]; model_parallel must divide #devices.

    Note: the GSPMD-safe depthwise kernel-grad (models/layers.py) is
    scoped into the TP train step's trace by make_train_step — this
    function no longer flips the process-global flag (it used to, which
    silently slowed every later single-device step in the process)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def tp_spec_for(path: str,
                rules: Optional[List[Tuple[str, P]]] = None) -> P:
    for pat, spec in (rules if rules is not None else DEFAULT_TP_RULES):
        if re.match(pat, path):
            return spec
    return P()


def shard_params(params: Any, mesh: Mesh,
                 rules: Optional[List[Tuple[str, P]]] = None) -> Any:
    """Place a param pytree on the mesh per the TP rules (paths are
    '/'-joined flax dict keys, e.g. 'decoder/layer0/linear1/kernel')."""
    import flax.traverse_util as trav
    flat = trav.flatten_dict(params, keep_empty_nodes=True)
    out = {}
    for k, v in flat.items():
        if v is trav.empty_node:
            out[k] = v
            continue
        path = "/".join(str(p) for p in k)
        spec = tp_spec_for(path, rules)
        # device_put cannot shard a dimension the axis size does not
        # divide (unlike jit's padded propagation) — replicate instead
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else int(
                np.prod([mesh.shape[a] for a in axis]))
            if v.shape[dim] % size != 0:
                spec = P()
                break
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return trav.unflatten_dict(out)


def create_sharded_train_state(variables: Any, tx, rng: jax.Array,
                               mesh: Mesh,
                               rules: Optional[List[Tuple[str, P]]] = None):
    """TrainState with TP-sharded params.  The optimizer state is built
    AFTER placement so its moment buffers inherit each param's sharding
    (zeros_like preserves sharding); everything else is replicated."""
    import jax.numpy as jnp
    from audiocaption_tpu.training.trainer import TrainState

    params = shard_params(variables["params"], mesh, rules)
    repl = NamedSharding(mesh, P())
    stats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), variables.get("batch_stats", {}))
    return TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), repl),
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
        rng=jax.device_put(rng, repl),
    )
