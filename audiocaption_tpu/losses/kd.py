"""Knowledge-distillation losses and encoder-KD heads
(TPU re-design of captioning/losses/kd_loss.py:7-48 and
captioning/models/kd_wrapper.py:1-226).

Token-level KD: student logits vs teacher logits (KL with temperature,
or L2/L1 on logits), length-masked; SupKdLoss mixes the supervised loss
with the KD term.  Encoder KD: projection heads + contrastive
(CLIP-style InfoNCE, both directions, learnable logit scale,
kd_wrapper.py:150-156) or MSE objectives producing ``enc_kd_loss``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.ops.masking import length_mask

Array = jnp.ndarray


def token_kd_loss(student_logit: Array, teacher_logit: Array,
                  tgt_len: Array, kd_type: str = "kl",
                  temperature: float = 1.0) -> Array:
    """Length-masked token-level KD (kd_loss.py:7-31)."""
    mask = length_mask(tgt_len, student_logit.shape[1]
                       ).astype(jnp.float32)
    if kd_type == "kl":
        t = temperature
        s_lp = jax.nn.log_softmax(student_logit / t, axis=-1)
        t_p = jax.nn.softmax(teacher_logit / t, axis=-1)
        loss = jnp.sum(t_p * (jnp.log(jnp.maximum(t_p, 1e-10)) - s_lp),
                       axis=-1) * (t * t)
    elif kd_type == "l2":
        loss = jnp.mean((student_logit - teacher_logit) ** 2, axis=-1)
    elif kd_type == "l1":
        loss = jnp.mean(jnp.abs(student_logit - teacher_logit), axis=-1)
    else:
        raise ValueError(kd_type)
    return jnp.sum(loss * mask) / jnp.sum(mask)


def sup_kd_loss(sup_loss: Array, kd_loss: Array,
                kd_weight: float = 0.5) -> Array:
    """(1-w) * supervised + w * kd (kd_loss.py SupKdLoss)."""
    return (1.0 - kd_weight) * sup_loss + kd_weight * kd_loss


def info_nce_loss(stdnt_emb: Array, tchr_emb: Array,
                  logit_scale: Array) -> Array:
    """Bidirectional InfoNCE over the batch (kd_wrapper.py:141-162)."""
    s = stdnt_emb / jnp.linalg.norm(stdnt_emb, axis=-1, keepdims=True)
    t = tchr_emb / jnp.linalg.norm(tchr_emb, axis=-1, keepdims=True)
    logits = logit_scale * (s @ t.T)
    labels = jnp.arange(logits.shape[0])
    lp1 = jax.nn.log_softmax(logits, axis=-1)
    lp2 = jax.nn.log_softmax(logits.T, axis=-1)
    loss1 = -jnp.mean(jnp.take_along_axis(lp1, labels[:, None], 1))
    loss2 = -jnp.mean(jnp.take_along_axis(lp2, labels[:, None], 1))
    return (loss1 + loss2) / 2


class ContraEncoderKdHead(nn.Module):
    """Student/teacher projections + logit scale; passthrough at
    inference (hf_wrapper.py:1071-1112, kd_wrapper.py ContraEncoderKd
    Wrapper).  __call__(fc_emb, tchr_emb) -> enc_kd_loss."""
    shared_dim: int = 1024

    @nn.compact
    def __call__(self, stdnt_fc_emb: Array, tchr_emb: Array) -> Array:
        s = nn.Dense(self.shared_dim, name="stdnt_proj")(stdnt_fc_emb)
        t = nn.Dense(self.shared_dim, name="tchr_proj")(tchr_emb)
        logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(np.log(1 / 0.07), jnp.float32))
        return info_nce_loss(s, t, jnp.exp(logit_scale))


class MseEncoderKdHead(nn.Module):
    """MSE encoder distillation head (kd_wrapper.py MseEncoderKdWrapper):
    project student fc_emb to the teacher dim and regress."""
    tchr_dim: int = 768
    use_tchr_proj: bool = False
    shared_dim: int = 1024

    @nn.compact
    def __call__(self, stdnt_fc_emb: Array, tchr_emb: Array) -> Array:
        if self.use_tchr_proj:
            s = nn.Dense(self.shared_dim, name="stdnt_proj")(stdnt_fc_emb)
            t = nn.Dense(self.shared_dim, name="tchr_proj")(tchr_emb)
        else:
            s = nn.Dense(self.tchr_dim, name="stdnt_proj")(stdnt_fc_emb)
            t = tchr_emb
        return jnp.mean((s - t) ** 2)


class WmlEncoderKdHead(nn.Module):
    """Weighted multi-layer MSE distillation (kd_wrapper.py
    WmlEncoderKdWrapper): learnable softmax weights over layer-wise
    distances."""
    n_layers: int = 4

    @nn.compact
    def __call__(self, layer_dists: Array) -> Array:
        """layer_dists: [n_layers] per-layer mean distances."""
        w = self.param("layer_weights", nn.initializers.zeros,
                       (self.n_layers,))
        return jnp.sum(jax.nn.softmax(w) * layer_dists)
