"""Training step (TPU re-design of Runner._train_epoch, run.py:77-148).

One jitted SPMD program per step: forward (mutable batch_stats), loss,
grads, global-norm clip 1.0, Adam update with a per-iteration LR
schedule, and the reference's NaN-loss skip (run.py:123-142) expressed
as a masked update so the step stays branch-free under jit.

Data parallelism: call ``make_train_step`` with a mesh — the batch is
sharded on axis 0, params replicated; XLA inserts the gradient
all-reduce over ICI (replaces DDP/NCCL, run_ddp.py:103-108).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jnp.ndarray


class TrainState(flax.struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Array


def create_train_state(variables: Dict[str, Any], tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        rng=rng,
    )


def make_optimizer(base_lr: float, schedule: Callable,
                   weight_decay: float = 1e-6,
                   max_grad_norm: float = 1.0,
                   trainable_mask: Optional[Any] = None
                   ) -> optax.GradientTransformation:
    """Adam + weight decay + grad clip matching the reference recipe
    (eg_configs/.../cnn14rnn_trm.yaml:45-56, run.py:126).

    torch Adam(weight_decay=w) is L2-regularized Adam (decay added to the
    gradient before the moment updates), i.e. optax.add_decayed_weights
    *before* scale_by_adam.
    """
    chain = [optax.clip_by_global_norm(max_grad_norm)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain += [optax.scale_by_adam(), optax.scale_by_schedule(schedule),
              optax.scale(-1.0)]
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda m: "train" if m else "freeze", trainable_mask))
    # non-trainable buffers living in params: the transformer decoder's
    # positional table "pe" is a frozen nn.Parameter in the reference
    # (transformer_decoder.py:29, requires_grad=False) — mask it out so
    # neither weight decay nor Adam moments ever move it.
    tx = optax.multi_transform(
        {"train": tx, "buffer": optax.set_to_zero()}, _buffer_labels)
    return tx


def _buffer_labels(params) -> Any:
    """Label tree: 'buffer' for frozen in-params buffers (name 'pe')."""
    import flax.traverse_util as trav
    flat = trav.flatten_dict(params, keep_empty_nodes=True)
    labels = {}
    for k, v in flat.items():
        if v is trav.empty_node:
            labels[k] = v
        else:
            labels[k] = ("buffer" if (isinstance(k[-1], str)
                                      and k[-1] == "pe") else "train")
    return trav.unflatten_dict(labels)


def make_train_step(model,
                    loss_fn: Callable[[Dict], Array],
                    tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    axis_name: str = "data",
                    specaug: bool = False,
                    donate: bool = True,
                    use_ss: bool = True):
    """Build the jitted train step.

    batch keys: wav [B, T], wav_len [B], cap [B, L], cap_len [B]
    (+ optional temporal_tag).  ``ss_ratio`` is a traced scalar so
    scheduled-sampling decay doesn't retrigger compilation.

    ``use_ss`` is STATIC: with scheduled sampling off, the model sees
    the python float 1.0 and transformer decoders take the single-pass
    full-teacher-forcing path (train_forward switch, base.py:131-136)
    instead of the per-token prefix-recompute loop.
    """

    def step_fn(state: TrainState, batch: Dict[str, Array],
                ss_ratio: Array) -> tuple:
        # device-resident corpus (data/device_bank.py): the batch
        # carries bank row indices; gather the wav rows on device so the
        # per-step host->device traffic is just token ids + indices
        if "wav_idx" in batch:
            wav_rows = jnp.take(batch["wav_bank"], batch["wav_idx"],
                                axis=0)
            batch = {k: v for k, v in batch.items()
                     if k not in ("wav_idx", "wav_bank")}
            batch["wav"] = wav_rows
        # compact wire formats (data/collate.py wire_dtype): the wav may
        # arrive as float16 (lossless for int16/f16-packed corpora) to
        # halve the host->device bytes; models compute from float32.
        # dtype is static at trace time, so this is free when f32.
        wav = batch["wav"]
        if wav.dtype in (jnp.float16, jnp.bfloat16):
            batch = dict(batch, wav=wav.astype(jnp.float32))
        elif wav.dtype == jnp.int16:
            batch = dict(batch, wav=wav.astype(jnp.float32) / 32768.0)
        rng, sample_rng, dropout_rng, specaug_rng = jax.random.split(
            jax.random.fold_in(state.rng, state.step), 4)

        def compute_loss(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            kwargs = {}
            if "temporal_tag" in batch:
                kwargs["temporal_tag"] = batch["temporal_tag"]
            # per-sample conditioning for the conditioned decoder
            # variants (condition/style/structure/specificity for
            # BahAttn*, event/keyword probs for the transformer
            # variants) — the reference feeds these through input_dict
            # (attn_model.py:191-289, transformer_model.py:166-264)
            # "condition" also carries the scalar specificity value
            # (the reference's condition datasets emit one "condition"
            # key for both, condition_dataset.py:70-144)
            cond = {k: batch[k] for k in
                    ("condition", "style", "structure", "event")
                    if k in batch}
            if "keyword" in batch:     # keyword probs ride the event slot
                cond["event"] = batch["keyword"]
            if cond:
                kwargs["cond_kwargs"] = cond
            out, updates = model.apply(
                variables, batch["wav"], batch["wav_len"], batch["cap"],
                batch["cap_len"], ss_ratio=ss_ratio if use_ss else 1.0,
                train=True,
                specaug=specaug, mutable=["batch_stats"],
                rngs={"sample": sample_rng, "dropout": dropout_rng,
                      "specaug": specaug_rng}, **kwargs)
            out["tgt"] = batch["cap"][:, 1:]
            out["tgt_len"] = batch["cap_len"] - 1
            loss = loss_fn(out)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)

        # NaN-loss skip (run.py:123-142): the whole update — params, opt
        # state, BN stats — is masked by ``ok``.  Zeroing the grads alone
        # is not enough: Adam's existing momentum would still move the
        # params, which the reference's skipped optimizer.step() doesn't.
        # The guard also covers non-finite GRADS with a finite loss
        # (possible in bf16 backward overflow) — one such step would
        # poison the params permanently.
        raw_grad_norm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(raw_grad_norm)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt, state.opt_state)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, state.params)
        new_stats = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_stats, state.batch_stats)

        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt,
                                  rng=rng)
        metrics = {"loss": loss, "grad_norm": raw_grad_norm,
                   "skipped": ~ok}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    if "model" in mesh.axis_names:
        # tensor-parallel state (parallel/tp.py): the params carry their
        # own NamedShardings, so the step is placement-driven — jit
        # propagates the layout and inserts the TP collectives.  The
        # depthwise convs use the partitioner-safe kernel-grad, scoped
        # to THIS trace (stock grouped-conv grads double on multi-axis
        # meshes; the safe path is slower, so steps traced later on 1-D
        # meshes must not inherit it).  The batch is pinned to the
        # 'data' axis inside the trace — placement alone would silently
        # replicate an uncommitted host batch across the mesh.
        from audiocaption_tpu.models.layers import depthwise_safe_grad

        batch_spec = lambda x: NamedSharding(
            mesh, P(axis_name) if getattr(x, "ndim", 0) else P())

        def tp_step_fn(state, batch, ss_ratio):
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, batch_spec(x)), batch)
            with depthwise_safe_grad(True):
                return step_fn(state, batch, ss_ratio)

        return jax.jit(tp_step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
