"""Knowledge-distillation training steps (TPU re-design of the KD
runners, python_scripts/train_eval/kd/run_kd.py, run_wavcaps_kd.py,
run_enc_kd.py, run_wavcaps_kd_with_unsup.py).

Three KD modes, matching the reference's kd_type switch
(run_wavcaps_kd.py):

  * token KD — student CE + KL against teacher logits on the same
    captions (kd_loss.py TokenLevelKdLoss + SupKdLoss);
  * sequence KD — the teacher generates pseudo captions per audio id
    once, cached, and the student trains on them as extra targets
    (run_wavcaps_kd.py:50-70);
  * encoder KD — contrastive or MSE alignment of the student's pooled
    audio embedding with a teacher embedding (kd_wrapper.py), including
    the unsupervised path (audio-only batches, kd_wrapper.py:135-140).

Teachers are arbitrary callables so HF text-audio models (the WavCaps
BART teacher in the reference) or frozen JAX models both fit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiocaption_tpu.losses import masked_token_loss
from audiocaption_tpu.losses.kd import (
    ContraEncoderKdHead, info_nce_loss, sup_kd_loss, token_kd_loss)
from audiocaption_tpu.models.captioner import Captioner, generate

Array = jnp.ndarray


def make_token_kd_step(model: Captioner, tx,
                       kd_weight: float = 0.5,
                       kd_type: str = "kl",
                       temperature: float = 1.0,
                       smoothing: float = 0.1):
    """Train step taking precomputed teacher logits in the batch
    (key "teacher_logit" [B, L-1, V])."""
    sup_loss_fn = masked_token_loss("label_smoothing", smoothing)

    def step_fn(state, batch, ss_ratio):
        rng, sample_rng, dropout_rng = jax.random.split(
            jax.random.fold_in(state.rng, state.step), 3)

        def compute_loss(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            out, updates = model.apply(
                variables, batch["wav"], batch["wav_len"], batch["cap"],
                batch["cap_len"], ss_ratio=ss_ratio, train=True,
                mutable=["batch_stats"],
                rngs={"sample": sample_rng, "dropout": dropout_rng})
            out["tgt"] = batch["cap"][:, 1:]
            out["tgt_len"] = batch["cap_len"] - 1
            sup = sup_loss_fn(out)
            kd = token_kd_loss(out["logit"], batch["teacher_logit"],
                               out["tgt_len"], kd_type, temperature)
            return sup_kd_loss(sup, kd, kd_weight), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt,
                             rng=rng), {"loss": loss}

    return jax.jit(step_fn)


def make_encoder_kd_step(model: Captioner, kd_head: ContraEncoderKdHead,
                         tx, kd_weight: float = 1.0,
                         smoothing: float = 0.1,
                         unsup: bool = False):
    """Joint caption loss + encoder-KD loss against teacher embeddings
    (batch key "tchr_emb" [B, tchr_dim]).  With ``unsup`` the batch has
    no captions (audio-only contrastive alignment,
    kd_wrapper.py:135-140); params tree must contain {"model", "kd"}.
    """
    sup_loss_fn = masked_token_loss("label_smoothing", smoothing)

    def step_fn(state, batch, ss_ratio):
        rng, sample_rng, dropout_rng = jax.random.split(
            jax.random.fold_in(state.rng, state.step), 3)

        def compute_loss(params):
            variables = {"params": params["model"],
                         "batch_stats": state.batch_stats}
            if unsup:
                enc, updates = model.apply(
                    variables, batch["wav"], batch["wav_len"], train=True,
                    mutable=["batch_stats"], method=Captioner.encode,
                    rngs={"dropout": dropout_rng})
                sup = 0.0
                fc_emb = enc["fc_emb"]
            else:
                out, updates = model.apply(
                    variables, batch["wav"], batch["wav_len"],
                    batch["cap"], batch["cap_len"], ss_ratio=ss_ratio,
                    train=True, mutable=["batch_stats"],
                    rngs={"sample": sample_rng, "dropout": dropout_rng})
                out["tgt"] = batch["cap"][:, 1:]
                out["tgt_len"] = batch["cap_len"] - 1
                sup = sup_loss_fn(out)
                fc_emb = out["fc_emb"]
            kd = kd_head.apply({"params": params["kd"]}, fc_emb,
                               batch["tchr_emb"])
            return sup + kd_weight * kd, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt,
                             rng=rng), {"loss": loss}

    return jax.jit(step_fn)


def generate_pseudo_captions(teacher_generate: Callable[[np.ndarray, np.ndarray], list],
                             loader, cache: Optional[Dict[str, str]] = None
                             ) -> Dict[str, str]:
    """Sequence-level KD: run the teacher once per audio id and cache the
    pseudo captions (run_wavcaps_kd.py:50-70)."""
    cache = dict(cache or {})
    for batch in loader:
        todo = [i for i, aid in enumerate(batch["audio_id"])
                if aid not in cache]
        if not todo:
            continue
        caps = teacher_generate(batch["wav"], batch["wav_len"])
        for i in todo:
            cache[batch["audio_id"][i]] = caps[i]
    return cache
