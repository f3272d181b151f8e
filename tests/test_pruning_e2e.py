"""Structured EffB2 pruning end-to-end (reference get_pruned_model,
eff_latent_encoder.py:209-349): prune a full EfficientNetB2 param tree
and run the pruned model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocaption_tpu.models.effb2 import (
    EfficientNetB2, build_pruned_effb2)


@pytest.fixture(scope="module")
def full_effb2():
    model = EfficientNetB2()
    lms = jnp.zeros((1, 101, 64))
    variables = model.init(jax.random.PRNGKey(0), lms, jnp.asarray([101]))
    return model, jax.device_get(variables)


def _count(tree):
    return sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.slow
@pytest.mark.parametrize("prune_head", [False, True])
def test_pruned_effb2_runs(full_effb2, prune_head):
    model, variables = full_effb2
    pm, pp, ps = build_pruned_effb2(
        variables["params"], variables["batch_stats"], prune_ratio=0.3,
        prune_head=prune_head)
    full_n = _count(variables["params"])
    pruned_n = _count(pp)
    assert pruned_n < 0.75 * full_n     # ~>=30% of filters removed
    lms = jnp.asarray(np.random.RandomState(0)
                      .randn(2, 101, 64).astype(np.float32))
    out = pm.apply({"params": pp, "batch_stats": ps}, lms,
                   jnp.asarray([101, 64]))
    want_dim = 1408 if not prune_head else pm.head_filters
    assert out["attn_emb"].shape[0] == 2
    assert out["attn_emb"].shape[-1] == want_dim
    assert np.all(np.isfinite(np.asarray(out["attn_emb"])))
    if prune_head:
        assert pm.head_filters == int(round(1408 * 0.7))


def test_pruned_start_layer_keeps_early_blocks(full_effb2):
    model, variables = full_effb2
    pm, pp, ps = build_pruned_effb2(
        variables["params"], variables["batch_stats"], prune_ratio=0.5,
        prune_start_layer=5, prune_head=False)
    # block0's depthwise inherits the (unpruned) stem
    assert pp["conv_stem"]["kernel"].shape[-1] == \
        variables["params"]["conv_stem"]["kernel"].shape[-1]
    lms = jnp.zeros((1, 101, 64))
    out = pm.apply({"params": pp, "batch_stats": ps}, lms,
                   jnp.asarray([101]))
    assert out["attn_emb"].shape[-1] == 1408
