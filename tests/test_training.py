"""Losses, schedules, SWA, and the (data-parallel) train step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch

from audiocaption_tpu.losses import (
    cross_entropy_loss, label_smoothing_loss, masked_token_loss)
from audiocaption_tpu.optim import (
    exponential_decay_with_warmup, noam_schedule, cosine_with_warmup)
from audiocaption_tpu.parallel import make_mesh, shard_batch, replicate
from audiocaption_tpu.training import (
    TrainState, create_train_state, make_train_step, swa_init, swa_update)
from audiocaption_tpu.training.trainer import make_optimizer

from test_captioner import make_model, init_model, SPECIAL, V


# ------------------------------------------------------------- losses ----

def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logit = rng.randn(3, 5, 11).astype(np.float32)
    tgt = rng.randint(0, 11, (3, 5))
    tgt_len = np.array([5, 2, 4])
    got = float(cross_entropy_loss(jnp.asarray(logit), jnp.asarray(tgt),
                                   jnp.asarray(tgt_len)))
    tl = torch.nn.functional.cross_entropy(
        torch.as_tensor(logit).reshape(-1, 11),
        torch.as_tensor(tgt).reshape(-1), reduction="none").reshape(3, 5)
    mask = torch.arange(5)[None] < torch.as_tensor(tgt_len)[:, None]
    want = float((tl * mask).sum() / mask.sum())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_label_smoothing_matches_manual():
    rng = np.random.RandomState(1)
    Vs = 7
    logit = rng.randn(2, 4, Vs).astype(np.float32)
    tgt = rng.randint(0, Vs, (2, 4))
    tgt_len = np.array([4, 3])
    smoothing = 0.1
    got = float(label_smoothing_loss(jnp.asarray(logit), jnp.asarray(tgt),
                                     jnp.asarray(tgt_len), smoothing))
    # manual: fill smoothing/(V-1), scatter confidence at tgt
    lp = torch.as_tensor(logit).log_softmax(-1)
    dist = torch.full_like(lp, smoothing / (Vs - 1))
    dist.scatter_(-1, torch.as_tensor(tgt)[..., None], 1 - smoothing)
    loss = -(dist * lp).sum(-1)
    mask = torch.arange(4)[None] < torch.as_tensor(tgt_len)[:, None]
    want = float((loss * mask).sum() / mask.sum())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_label_smoothing_zero_equals_ce():
    rng = np.random.RandomState(2)
    logit = jnp.asarray(rng.randn(2, 3, 9).astype(np.float32))
    tgt = jnp.asarray(rng.randint(0, 9, (2, 3)))
    tgt_len = jnp.asarray([3, 2])
    np.testing.assert_allclose(
        float(label_smoothing_loss(logit, tgt, tgt_len, 0.0)),
        float(cross_entropy_loss(logit, tgt, tgt_len)), rtol=1e-6)


# ---------------------------------------------------------- schedules ----

def test_exponential_decay_schedule_endpoints():
    sched = exponential_decay_with_warmup(5e-4, 5e-7, 10000, 2000)
    # warmup: iteration 1 -> base/warmup, iteration 2000 -> base
    np.testing.assert_allclose(float(sched(0)), 5e-4 / 2000, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1999)), 5e-4, rtol=1e-6)
    # final iteration -> final_lr
    np.testing.assert_allclose(float(sched(9999)), 5e-7, rtol=1e-5)


def test_noam_schedule_peak():
    sched = noam_schedule(model_size=512, warmup_iters=4000)
    vals = [float(sched(i)) for i in range(0, 20000, 500)]
    peak_i = int(np.argmax(vals))
    assert abs(peak_i * 500 - 4000) <= 500


def test_cosine_schedule():
    sched = cosine_with_warmup(1e-3, 1000, 100)
    assert float(sched(jnp.asarray(50))) < 1e-3
    np.testing.assert_allclose(float(sched(jnp.asarray(999))), 0.0,
                               atol=1e-8)


# ----------------------------------------------------------------- SWA ----

def test_swa_average():
    p0 = {"w": jnp.asarray([1.0, 1.0])}
    s0 = {"m": jnp.asarray([0.0])}
    swa = swa_init(p0, s0)
    swa = swa_update(swa, {"w": jnp.asarray([3.0, 3.0])},
                     {"m": jnp.asarray([2.0])})
    np.testing.assert_allclose(np.asarray(swa[0]["w"]), [3.0, 3.0])
    swa = swa_update(swa, {"w": jnp.asarray([5.0, 5.0])},
                     {"m": jnp.asarray([4.0])})
    np.testing.assert_allclose(np.asarray(swa[0]["w"]), [4.0, 4.0])
    np.testing.assert_allclose(np.asarray(swa[1]["m"]), [3.0])
    assert int(swa[2]) == 2


# ---------------------------------------------------------- train step ----

def _setup_train(family="transformer"):
    model = make_model(family)
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    sched = exponential_decay_with_warmup(1e-3, 1e-5, 100, 5)
    tx = make_optimizer(1e-3, sched)
    state = create_train_state(variables, tx, jax.random.PRNGKey(0))
    batch = {"wav": wav, "wav_len": wav_len, "cap": cap, "cap_len": cap_len}
    return model, state, batch


def test_train_step_reduces_loss():
    model, state, batch = _setup_train()
    loss_fn = masked_token_loss("label_smoothing", 0.1)
    tx = make_optimizer(1e-3, exponential_decay_with_warmup(1e-3, 1e-5, 100, 5))
    step = make_train_step(model, loss_fn, tx, donate=False)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jnp.float32(1.0))
        losses.append(float(metrics["loss"]))
        assert not bool(metrics["skipped"])
    assert losses[-1] < losses[0]


def test_train_step_data_parallel_mesh():
    """8-virtual-device data parallelism: loss ~= single-device loss."""
    model, state, batch = _setup_train()
    # pad the batch to 8 rows so it shards evenly
    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), batch)
    loss_fn = masked_token_loss("label_smoothing", 0.1)
    tx = make_optimizer(1e-3, exponential_decay_with_warmup(1e-3, 1e-5, 100, 5))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    step_mesh = make_train_step(model, loss_fn, tx, mesh=mesh, donate=False)
    step_single = make_train_step(model, loss_fn, tx, donate=False)

    state_m = replicate(state, mesh)
    batch_m = shard_batch(batch8, mesh)
    _, metrics_m = step_mesh(state_m, batch_m, jnp.float32(1.0))
    _, metrics_s = step_single(state, batch8, jnp.float32(1.0))
    np.testing.assert_allclose(float(metrics_m["loss"]),
                               float(metrics_s["loss"]), rtol=1e-4)


def test_train_step_skips_nan():
    """A NaN loss must leave params/opt_state/BN stats untouched — also
    at step N>0 where Adam moments are nonzero (the reference skips
    optimizer.step() entirely, run.py:123-142); zeroed grads alone
    would still apply a momentum step."""
    model, state, batch = _setup_train()
    loss_fn = masked_token_loss("label_smoothing", 0.1)
    tx = make_optimizer(1e-3, exponential_decay_with_warmup(1e-3, 1e-5, 100, 5))
    step = make_train_step(model, loss_fn, tx, donate=False)
    # two good steps first so optimizer moments are nonzero
    for _ in range(2):
        state, metrics = step(state, batch, jnp.float32(1.0))
        assert not bool(metrics["skipped"])
    bad = dict(batch)
    bad["wav"] = batch["wav"].at[0, 0].set(jnp.nan)
    new_state, metrics = step(state, bad, jnp.float32(1.0))
    assert bool(metrics["skipped"])
    for p0, p1 in zip(jax.tree_util.tree_leaves(state.params),
                      jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    for o0, o1 in zip(jax.tree_util.tree_leaves(state.opt_state),
                      jax.tree_util.tree_leaves(new_state.opt_state)):
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    for s0, s1 in zip(jax.tree_util.tree_leaves(state.batch_stats),
                      jax.tree_util.tree_leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_train_step_use_ss_false_takes_seq_path():
    """With use_ss=False the transformer step must take the one-pass
    teacher-forcing path: the traced ss_ratio is ignored and the loss
    matches a fully-teacher-forced step (base.py:131-136)."""
    model, state, batch = _setup_train("transformer")
    loss_fn = masked_token_loss("label_smoothing", 0.1)
    tx = make_optimizer(1e-3, exponential_decay_with_warmup(1e-3, 1e-5, 100, 5))
    step_fast = make_train_step(model, loss_fn, tx, donate=False,
                                use_ss=False)
    step_ss = make_train_step(model, loss_fn, tx, donate=False, use_ss=True)
    _, m_fast = step_fast(state, batch, jnp.float32(0.3))  # ratio ignored
    _, m_tf = step_ss(state, batch, jnp.float32(1.0))
    np.testing.assert_allclose(float(m_fast["loss"]), float(m_tf["loss"]),
                               rtol=1e-5)
    # and the fast path compiles a much smaller program (one decoder
    # pass instead of L unrolled prefix recomputes)
    hlo_fast = step_fast.lower(state, batch, jnp.float32(0.3))
    hlo_ss = step_ss.lower(state, batch, jnp.float32(1.0))
    assert len(hlo_fast.as_text()) < len(hlo_ss.as_text())


def test_train_step_tensor_parallel_mesh():
    """2x4 (data x model) tensor parallelism (parallel/tp.py): Megatron
    param shardings on the decoder, placement-driven jit; loss and the
    updated params match the single-device step."""
    from audiocaption_tpu.parallel import (
        create_sharded_train_state, make_tp_mesh)

    model, state, batch = _setup_train()
    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), batch)
    loss_fn = masked_token_loss("label_smoothing", 0.1)
    tx = make_optimizer(1e-3,
                        exponential_decay_with_warmup(1e-3, 1e-5, 100, 5))

    mesh = make_tp_mesh(jax.devices(), model_parallel=4)
    assert mesh.shape == {"data": 2, "model": 4}
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    state_tp = create_sharded_train_state(variables, tx,
                                          jax.random.PRNGKey(0), mesh)
    # the placement actually sharded the MLP/attention matrices (the
    # V=23 classifier falls back to replicated: 23 % 4 != 0)
    import flax.traverse_util as trav
    flat = trav.flatten_dict(state_tp.params)
    sharded = [k for k, v in flat.items()
               if any(a is not None for a in v.sharding.spec)]
    assert any(k[-2:] == ("linear1", "kernel") for k in sharded)
    assert any(k[-2:] == ("q_proj", "kernel") for k in sharded)

    import audiocaption_tpu.models.layers as _layers
    step_tp = make_train_step(model, loss_fn, tx, mesh=mesh,
                              donate=False)
    step_single = make_train_step(model, loss_fn, tx, donate=False)

    from audiocaption_tpu.parallel import shard_batch as sb
    batch_tp = sb(batch8, mesh)
    state_tp, metrics_tp = step_tp(state_tp, batch_tp,
                                   jnp.float32(1.0))
    # the safe-grad flag is scoped to the TP trace — it must NOT leak
    # into later single-device traces in this process
    assert _layers._DEPTHWISE_SAFE_GRAD is False
    state_s, metrics_s = step_single(state, batch8, jnp.float32(1.0))
    np.testing.assert_allclose(float(metrics_tp["loss"]),
                               float(metrics_s["loss"]), rtol=1e-4)
    # RAW grad norms must also agree — the first-step Adam update is
    # scale-invariant, so params alone cannot catch a grad-scaling bug
    np.testing.assert_allclose(float(metrics_tp["grad_norm"]),
                               float(metrics_s["grad_norm"]), rtol=1e-4)
    # updated (sharded) params equal the single-device update
    p_tp = jax.device_get(state_tp.params)
    p_s = jax.device_get(state_s.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5),
        p_tp, p_s)


def test_depthwise_conv_grad_exact_under_tp_mesh():
    """The stock grouped-conv KERNEL grad is multiplied by the size of
    an unrelated mesh axis under multi-axis GSPMD (measured exactly 2x
    with model=2) — the custom depthwise vjp in models/layers.py must
    keep it exact.  Regression for the dp x tp train step."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from audiocaption_tpu.models.layers import (
        Conv2dSame, set_depthwise_safe_grad)

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    rng = np.random.RandomState(0)
    B, C, Vc = 8, 16, 64
    x = jnp.asarray(rng.randn(B, 16, 16, C), jnp.float32)
    w_cls = jnp.asarray(rng.randn(C, Vc), jnp.float32) * 0.1
    conv = Conv2dSame(C, (3, 3), strides=(2, 2), padding=(0, 1, 0, 1),
                      groups=C)
    cv = conv.init(jax.random.PRNGKey(0), x)

    def loss(params, w, xx):
        y = conv.apply({"params": params}, xx)
        h = jnp.mean(y, axis=(1, 2))
        return jnp.sum(jax.nn.log_softmax(h @ w) ** 2)

    g1 = jax.grad(loss)(cv["params"], w_cls, x)["kernel"]
    p_sh = jax.device_put(cv["params"], NamedSharding(mesh, P()))
    w_sh = jax.device_put(w_cls, NamedSharding(mesh, P(None, "model")))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    set_depthwise_safe_grad(True)
    try:
        g2 = jax.jit(jax.grad(loss))(p_sh, w_sh, x_sh)["kernel"]
    finally:
        set_depthwise_safe_grad(False)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)


# ------------------------------------------------- async checkpointer ----

def test_async_checkpointer_orders_jobs_and_propagates_errors():
    """AsyncCheckpointer (training/checkpoint.py): jobs run in
    submission order on one worker (disk state identical to the
    synchronous loop), submit() joins the previous job, and a failed
    job's exception surfaces at the next submit()/wait()."""
    import time as _time

    from audiocaption_tpu.training.checkpoint import AsyncCheckpointer

    seen = []
    w = AsyncCheckpointer()
    for i in range(4):
        w.submit(lambda i=i: (_time.sleep(0.01), seen.append(i)))
    w.wait()
    assert seen == [0, 1, 2, 3]
    w.wait()                     # idempotent no-op

    def boom():
        raise RuntimeError("ckpt write failed")
    w.submit(boom)
    with pytest.raises(RuntimeError, match="ckpt write failed"):
        w.submit(lambda: None)
    # the failed future was consumed; the replacement job still ran
    w.wait()


def test_async_checkpointer_overlap():
    """submit() returns the seconds blocked on the previous job: ~0
    when the previous write already finished (fully overlapped)."""
    import time as _time

    from audiocaption_tpu.training.checkpoint import AsyncCheckpointer

    w = AsyncCheckpointer()
    assert w.submit(lambda: None) < 0.5       # nothing in flight
    _time.sleep(0.05)                         # job long done
    assert w.submit(lambda: _time.sleep(0.2)) < 0.5
    blocked = w.submit(lambda: None)          # must join the 0.2 s job
    assert blocked > 0.1
    w.wait()


def test_swa_host_numpy_stays_on_host():
    """The checkpoint worker feeds host-numpy variables; SWA must stay
    numpy (no device dispatch from a non-main thread — XLA aborts)."""
    p0 = {"w": np.asarray([1.0, 1.0], np.float32)}
    s0 = {"m": np.asarray([0.0], np.float32)}
    swa = swa_init(p0, s0)
    swa = swa_update(swa, {"w": np.asarray([3.0, 3.0], np.float32)},
                     {"m": np.asarray([2.0], np.float32)})
    swa = swa_update(swa, {"w": np.asarray([5.0, 5.0], np.float32)},
                     {"m": np.asarray([4.0], np.float32)})
    assert all(isinstance(x, np.ndarray) and not hasattr(x, "devices")
               for x in jax.tree_util.tree_leaves(swa[:2]))
    np.testing.assert_allclose(swa[0]["w"], [4.0, 4.0])  # mean(3,5)
    np.testing.assert_allclose(swa[1]["m"], [3.0])       # mean(2,4)
    assert int(swa[2]) == 2
