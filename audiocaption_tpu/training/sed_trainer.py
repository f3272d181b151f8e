"""Framewise sound-event-detection training for Cnn8RnnSedModel.

The reference ships its SED net pretrained inside the temporal HF
checkpoint (hf_wrapper.py:1791-1859) and has no trainer for it; this
module closes that loop so the temporal-tag pipeline (SED framewise
probs -> double_threshold -> segments -> tag, hf_wrapper.py:100-216)
can be certified end-to-end on trained weights for a new corpus.

TPU design: the whole corpus's log-mels are precomputed on device once
(one jitted frontend program per chunk), stored as a compact f16 bank
in HBM together with the int8 framewise targets; every train step then
sends only bank indices.  BCE over [B, T', C] segmentwise outputs at
the model's native 4-frame resolution (interpolation back to 10 ms is
inference-only, exactly like the reference's pad_framewise_output).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiocaption_tpu.models.sed import (
    Cnn8RnnSedModel, framewise_to_temporal_tags)
from audiocaption_tpu.ops.frontend import CNN14_MEL_32K, LogMelFrontend

Array = jnp.ndarray


def load_sed_annotations(path: str) -> List[Dict]:
    """{split}_sed.json -> [{audio_id, tag, segments: [[cls,on,off]]}]."""
    with open(path) as f:
        return json.load(f)["audios"]


def framewise_targets(segments: List[List[float]], n_frames: int,
                      n_classes: int,
                      time_resolution: float = 0.01) -> np.ndarray:
    """[(class, onset s, offset s)] -> [n_frames, n_classes] {0,1}."""
    y = np.zeros((n_frames, n_classes), np.int8)
    for cls, on, off in segments:
        s = int(round(on / time_resolution))
        e = int(round(off / time_resolution))
        y[s:min(e, n_frames), int(cls)] = 1
    return y


def build_lms_bank(h5_path: str, audio_ids: List[str],
                   frontend: LogMelFrontend, chunk: int = 64
                   ) -> jnp.ndarray:
    """Precompute the corpus's log-mels on device as an f16 bank."""
    import h5py
    fe = jax.jit(lambda w: frontend(w).astype(jnp.float16))
    out = []
    with h5py.File(h5_path, "r") as f:
        for i in range(0, len(audio_ids), chunk):
            ids = audio_ids[i:i + chunk]
            wav = np.stack([np.asarray(f[a], np.float32) for a in ids])
            if len(ids) < chunk:   # keep one compiled shape
                wav = np.pad(wav, ((0, chunk - len(ids)), (0, 0)))
            out.append(fe(jnp.asarray(wav))[:len(ids)])
    return jnp.concatenate(out, axis=0)


def make_sed_train_step(model: Cnn8RnnSedModel, tx):
    """Jitted (opt_state, variables, bank, targets, idx, key) step.
    BCE at segmentwise (T/4) resolution; targets are max-pooled 4->1 so
    a frame-level event inside the window marks the segment positive."""

    def loss_fn(params, batch_stats, lms, y, key):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          lms, train=True, rngs={"dropout": key},
                          mutable=["batch_stats"])
        (res, updates) = out
        seg = res["segmentwise_output"]                  # [B, T', C]
        t4 = seg.shape[1] * model.interpolate_ratio
        yw = y[:, :t4]
        yseg = jnp.max(yw.reshape(y.shape[0], seg.shape[1],
                                  model.interpolate_ratio, y.shape[2]),
                       axis=2).astype(jnp.float32)
        # the model clips to [1e-7, 1.0]; a saturated sigmoid (== 1.0)
        # would make log1p(-seg) = -inf, so clip the top side here too
        seg = jnp.clip(seg, 1e-7, 1.0 - 1e-7)
        bce = -(yseg * jnp.log(seg) + (1 - yseg) * jnp.log1p(-seg))
        return bce.mean(), updates["batch_stats"]

    def step(opt_state, variables, bank, targets, idx, key):
        lms = jnp.take(bank, idx, axis=0).astype(jnp.float32)
        y = jnp.take(targets, idx, axis=0)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"],
                                   variables["batch_stats"], lms, y, key)
        updates, opt_state = tx.update(grads, opt_state,
                                       variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return (opt_state,
                {"params": params, "batch_stats": new_stats}, loss)

    return jax.jit(step, donate_argnums=(0, 1))


def evaluate_tags(model: Cnn8RnnSedModel, variables: Dict,
                  bank: jnp.ndarray, gt_tags: np.ndarray,
                  batch: int = 32,
                  time_resolution: float = 0.01
                  ) -> Tuple[float, np.ndarray]:
    """Tag accuracy of the full host-side pipeline (double_threshold ->
    segments -> temporal tag) against ground truth."""
    fn = jax.jit(lambda v, x: model.apply(v, x.astype(jnp.float32),
                                          train=False)["framewise_output"])
    n = bank.shape[0]
    pred = []
    for i in range(0, n, batch):
        idx = jnp.arange(i, min(i + batch, n))
        fw = np.asarray(fn(variables, jnp.take(bank, idx, axis=0)))
        pred.append(framewise_to_temporal_tags(
            fw, time_resolution=time_resolution))
    pred = np.concatenate(pred)
    return float((pred == gt_tags[:n]).mean()), pred
