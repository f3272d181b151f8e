"""KD training step tests."""

import numpy as np
import jax
import jax.numpy as jnp

from audiocaption_tpu.losses.kd import ContraEncoderKdHead
from audiocaption_tpu.optim import exponential_decay_with_warmup
from audiocaption_tpu.training import create_train_state
from audiocaption_tpu.training.distill import (
    generate_pseudo_captions, make_encoder_kd_step, make_token_kd_step)
from audiocaption_tpu.training.trainer import make_optimizer

from test_captioner import make_model, init_model, V


def _tx():
    return make_optimizer(1e-3,
                          exponential_decay_with_warmup(1e-3, 1e-5, 50, 5))


def test_token_kd_step():
    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    tx = _tx()
    state = create_train_state(variables, tx, jax.random.PRNGKey(0))
    step = make_token_kd_step(model, tx, kd_weight=0.5)
    B, Lc = cap.shape
    batch = {"wav": wav, "wav_len": wav_len, "cap": cap,
             "cap_len": cap_len,
             "teacher_logit": jnp.zeros((B, Lc - 1, V))}
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, jnp.float32(1.0))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_encoder_kd_step_sup_and_unsup():
    model = make_model("transformer")
    variables, (wav, wav_len, cap, cap_len) = init_model(model)
    head = ContraEncoderKdHead(shared_dim=8)
    tchr = jnp.asarray(np.random.RandomState(0).randn(2, 12), jnp.float32)
    head_vars = head.init(jax.random.PRNGKey(1),
                          jnp.zeros((2, 16)), tchr)
    tx = _tx()
    combined = {"params": {"model": variables["params"],
                           "kd": head_vars["params"]}}
    state = create_train_state(combined, tx, jax.random.PRNGKey(0))
    state = state.replace(batch_stats=variables.get("batch_stats", {}))
    batch = {"wav": wav, "wav_len": wav_len, "cap": cap,
             "cap_len": cap_len, "tchr_emb": tchr}
    step = make_encoder_kd_step(model, head, tx)
    state, metrics = step(state, batch, jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))

    unsup_step = make_encoder_kd_step(model, head, tx, unsup=True)
    state, metrics = unsup_step(state, {"wav": wav, "wav_len": wav_len,
                                        "tchr_emb": tchr},
                                jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))


def test_generate_pseudo_captions_caching():
    calls = []

    def teacher(wav, wav_len):
        calls.append(len(wav))
        return [f"cap{i}" for i in range(len(wav))]

    loader = [
        {"audio_id": ["a", "b"], "wav": np.zeros((2, 10)),
         "wav_len": np.asarray([10, 10])},
        {"audio_id": ["a", "c"], "wav": np.zeros((2, 10)),
         "wav_len": np.asarray([10, 10])},
    ]
    cache = generate_pseudo_captions(teacher, loader)
    assert set(cache) == {"a", "b", "c"}
    cache2 = generate_pseudo_captions(teacher, loader, cache)
    assert len(calls) == 2  # second pass: everything cached, no calls
    assert cache2 == cache
