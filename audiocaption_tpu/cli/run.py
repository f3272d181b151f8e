"""Training / evaluation CLI (TPU re-design of
python_scripts/train_eval/{base,run}.py).

Usage (mirrors run.py:381 and base.py:310):

    python -m audiocaption_tpu.cli.run train    --config cfg.yaml [k=v ...]
    python -m audiocaption_tpu.cli.run evaluate --experiment_path EXP \
        --eval_config test.yaml
    python -m audiocaption_tpu.cli.run predict  --experiment_path EXP \
        --eval_config test.yaml
    python -m audiocaption_tpu.cli.run debug    --config cfg.yaml

YAML configs use the reference layout (model/encoder/decoder nodes with
the reference's dotted type names, data/collate/tokenizer nodes,
optimizer / lr_scheduler / scheduled_sampling / swa blocks) — see
utils/config.py.  Data parallelism engages automatically when more than
one accelerator device is visible.
"""

from __future__ import annotations

import argparse
import json
import random
import shutil
import sys
import time
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

# Persistent XLA compilation cache: without it every CLI run pays the
# full remote-compile cost (~16 min for a cold training step on the
# axon tunnel; measured round-5: a cached second seed starts epochs in
# ~2 min).  The env-var alone is not bound to the config on this jax
# version (round-4 finding for the test suite — same fix as
# tests/conftest.py / bench.py).
import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parents[2] / ".cache" / "jax"))
jax.config.update("jax_compilation_cache_dir",
                  _os.environ["JAX_COMPILATION_CACHE_DIR"])

# Hang diagnosability: remote-TPU (tunnel) RPCs can wedge a run
# mid-epoch with every thread futex-parked and nothing in the log.
# `kill -USR1 <pid>` dumps all Python stacks to stderr on demand;
# AUDIOCAPTION_WATCHDOG_SECS=N additionally dumps them every N seconds
# so an unattended run leaves evidence of where it stalled.
import faulthandler as _faulthandler
import signal as _signal

if hasattr(_signal, "SIGUSR1"):       # not on every platform
    _faulthandler.register(_signal.SIGUSR1)
if _os.environ.get("AUDIOCAPTION_WATCHDOG_SECS"):
    _faulthandler.dump_traceback_later(
        int(_os.environ["AUDIOCAPTION_WATCHDOG_SECS"]), repeat=True)

from audiocaption_tpu.data import (
    CaptionDataset, DictTokenizer, HuggingfaceTokenizer, InferenceDataset,
    TextCollate, VarLenPadCollate, load_caption_json)
from audiocaption_tpu.data.prefetch import prefetch_to_device
from audiocaption_tpu.losses import build_loss
from audiocaption_tpu.metrics import evaluate_captions
from audiocaption_tpu.metrics.cider import CiderD
from audiocaption_tpu.metrics.tokenize import ptb_tokenize
from audiocaption_tpu.models.captioner import Captioner, generate
from audiocaption_tpu.optim import build_schedule
from audiocaption_tpu.parallel import make_mesh, replicate, shard_batch
from audiocaption_tpu.training import (
    create_train_state, make_train_step, swa_init, swa_update)
from audiocaption_tpu.training.checkpoint import (
    AsyncCheckpointer, MetricImprover, load_checkpoint, merge_variables,
    save_checkpoint)
from audiocaption_tpu.training.trainer import make_optimizer
from audiocaption_tpu.utils.config import (
    build_model_from_config, load_config, load_pretrained_into,
    parse_overrides)
from audiocaption_tpu.utils.profiling import host_rss_gb


def _short(type_name: str) -> str:
    return type_name.split(".")[-1]


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def build_tokenizer(cfg: Dict):
    t = _short(cfg.get("type", "DictTokenizer"))
    args = cfg.get("args", {}) or {}
    if t == "DictTokenizer":
        return DictTokenizer(args.get("tokenizer_path"),
                             args.get("max_length", 20))
    if t == "HuggingfaceTokenizer":
        return HuggingfaceTokenizer(args["model_name_or_path"],
                                    args.get("max_length", 20))
    raise ValueError(t)


def build_dataset(cfg: Dict):
    t = _short(cfg["type"])
    args = dict(cfg.get("args", {}) or {})
    # per-item transform chains from the augment registry (reference
    # caption_dataset.py:38-49): either a flat list
    # [{type: gaussian_noise, args: {...}}] or the reference's
    # per-feat-type dict {wav: [specs...]} (Null chains allowed)
    tf_specs = args.pop("transforms", None)
    if isinstance(tf_specs, dict):
        merged = []
        for chain in tf_specs.values():
            if chain:
                merged.extend(chain)
        tf_specs = merged
    if tf_specs:
        from audiocaption_tpu.data.augment import build_transforms
        args["transforms"] = build_transforms(tf_specs)
    if t == "CaptionDataset":
        return CaptionDataset(**args)
    if t == "InferenceDataset":
        return InferenceDataset(**args)
    if t in ("WavCaptionDataset", "CaptionWavReadDataset"):
        from audiocaption_tpu.data.dataset import WavCaptionDataset
        return WavCaptionDataset(**args)
    if t in ("CaptionKdDataset", "InferKdDataset"):
        from audiocaption_tpu.data import kd_dataset as kdd
        return getattr(kdd, t)(**args)
    if t in ("ConditionCaptionDataset", "RandomConditionDataset",
             "KeywordProbCaptionDataset", "KeywordProbInferenceDataset",
             "TemporalTagCaptionDataset", "TemporalTagInferenceDataset"):
        from audiocaption_tpu.data import condition_dataset as cd
        return getattr(cd, t)(**args)
    raise ValueError(t)


def build_collate(cfg: Dict, tokenizer=None, wav_bucket: int = 16000):
    t = _short(cfg["type"])
    args = dict(cfg.get("args", {}) or {})
    buckets = {"wav": wav_bucket}
    feature_bucket = args.get("feature_bucket", 16)
    if t == "TextCollate":
        return TextCollate(tokenizer, text_key=args.get("text_key", "cap"),
                           pad_keys=args.get("pad_keys", []),
                           sort_key=args.get("sort_key"), buckets=buckets,
                           wire_dtype=args.get("wire_dtype"),
                           feature_bucket=feature_bucket)
    if t == "VarLenPadCollate":
        return VarLenPadCollate(pad_keys=args.get("pad_keys", []),
                                sort_key=args.get("sort_key"),
                                buckets=buckets,
                                wire_dtype=args.get("wire_dtype"),
                                feature_bucket=feature_bucket)
    raise ValueError(t)


def build_dataloader(data_cfg: Dict, tokenizer=None, train: bool = True):
    from torch.utils.data import DataLoader
    dataset = build_dataset(data_cfg["dataset"])
    collate = build_collate(data_cfg["collate_fn"], tokenizer)
    dl_args = dict(data_cfg.get("dataloader_args", {}) or {})
    num_samples = dl_args.pop("num_samples", None)
    dl_args.setdefault("batch_size", 32)
    if train and num_samples:
        # fixed-#samples-per-epoch with wraparound shuffle (reference
        # IterationBatchSampler, caption_dataset.py:390-436)
        from audiocaption_tpu.data.kd_dataset import IterationBatchSampler
        sampler = IterationBatchSampler(
            dataset, dl_args.pop("batch_size"), num_samples,
            shuffle=dl_args.pop("shuffle", True))
        return DataLoader(dataset, collate_fn=collate,
                          batch_sampler=sampler, **dl_args)
    if not train:
        dl_args["shuffle"] = False
    return DataLoader(dataset, collate_fn=collate,
                      drop_last=train, **dl_args)


class Runner:

    # ------------------------------------------------------------ train --

    def train(self, config: str, *overrides) -> str:
        cfg = load_config(config, parse_overrides(overrides))
        seed = cfg.get("seed", 1)
        set_seed(seed)
        exp_dir = Path(cfg["experiment_path"]) / f"seed_{seed}"
        exp_dir.mkdir(parents=True, exist_ok=True)
        with open(exp_dir / "config.yaml", "w") as f:
            yaml.safe_dump(cfg, f)

        # SCST (RL) training engages when the config wraps the model in
        # ScstWrapper, exactly like the reference's rl_train detection
        # (run.py:67-75; rl_model.py:11-85).  The wrapped node supplies
        # the actual encoder/decoder config.
        model_cfg = cfg["model"]
        rl_train = _short(model_cfg.get("type", "")) == "ScstWrapper"
        if rl_train:
            model_cfg = model_cfg["model"]

        # data
        tok_cfg = cfg["data"]["train"]["collate_fn"]["tokenizer"]
        tokenizer = build_tokenizer(tok_cfg)
        train_loader = build_dataloader(cfg["data"]["train"], tokenizer,
                                        train=True)
        val_cfg = cfg["data"]["val"]
        val_loader = build_dataloader(val_cfg, train=False)
        val_key2refs = load_caption_json(val_cfg["caption"],
                                         zh=cfg.get("zh", False))
        if not tokenizer.loaded:
            raise ValueError("tokenizer has no vocabulary; run "
                             "build_vocab or point tokenizer_path at a "
                             "vocab.pkl")

        # model
        model, pretrained = build_model_from_config(
            model_cfg, vocab_size=len(tokenizer))
        with jax.default_device(jax.devices("cpu")[0]):
            variables = self._init_variables(model, cfg, seed)
        for spec in pretrained:
            variables = load_pretrained_into(variables, spec)
        # host numpy (uncommitted) so the train step places them freely
        variables = jax.device_get(variables)

        # structured filter pruning of the EffB2 encoder, applied after
        # pretrained loading like the reference's get_pruned_model
        # (eff_latent_encoder.py:209-349)
        enc_args = (model_cfg.get("encoder", {}) or {}).get(
            "args", {}) or {}
        if enc_args.get("prune_ratio"):
            from audiocaption_tpu.models.effb2 import (
                EfficientNetB2, build_pruned_effb2)
            assert isinstance(model.encoder, EfficientNetB2), \
                "prune_ratio is only supported for EfficientNetB2"
            pm, pp, ps = build_pruned_effb2(
                variables["params"]["encoder"],
                variables["batch_stats"]["encoder"],
                enc_args["prune_ratio"],
                prune_start_layer=enc_args.get("prune_start_layer", 0),
                prune_se=enc_args.get("prune_se", True),
                method=enc_args.get("prune_method", "operator_norm"),
                prune_head=enc_args.get("prune_head", False))
            model = model.clone(encoder=pm)
            variables["params"] = dict(variables["params"])
            variables["batch_stats"] = dict(variables["batch_stats"])
            variables["params"]["encoder"] = pp
            variables["batch_stats"]["encoder"] = ps

        # optimization
        trainer_cfg = cfg.get("trainer", {})
        epochs = trainer_cfg.get("epochs", 25)
        iters_per_epoch = len(train_loader)
        total_iters = epochs * iters_per_epoch
        opt_args = cfg.get("optimizer", {}).get("args", {})
        base_lr = opt_args.get("lr", 5e-4)
        sched = build_schedule(cfg.get("lr_scheduler", {}), base_lr,
                               total_iters, total_iters // 5)
        tx = make_optimizer(base_lr, sched,
                            weight_decay=opt_args.get("weight_decay", 0.0),
                            max_grad_norm=trainer_cfg.get(
                                "max_grad_norm", 1.0))
        state = create_train_state(variables, tx, jax.random.PRNGKey(seed))
        loss_fn = build_loss(cfg.get("loss", {}))

        devices = jax.devices()
        mesh = make_mesh(devices) if len(devices) > 1 else None
        if mesh is not None and not rl_train:
            state = replicate(state, mesh)
        # scheduled sampling (run.py:55-65); use_ss is static so the
        # jitted step takes the one-pass teacher-forcing path when off
        ss_cfg = cfg.get("scheduled_sampling", {"use": False})
        train_step = None
        if not rl_train:
            train_step = make_train_step(
                model, loss_fn, tx, mesh=mesh,
                specaug=cfg.get("specaug", False), donate=True,
                use_ss=bool(ss_cfg.get("use")))
        else:
            # SCST pieces (training/scst.py; reference rl_model.py:24-85):
            # jitted greedy+sample pass, host CIDEr rewards from the
            # train references, jitted REINFORCE grads, optax update.
            from audiocaption_tpu.native import FastCiderD
            from audiocaption_tpu.training.scst import (
                make_scst_fns, scst_step)
            import optax
            rl_cfg = cfg.get("rl", {}) or {}
            train_key2refs = load_caption_json(
                cfg["data"]["train"]["dataset"]["args"]["caption"],
                zh=cfg.get("zh", False))
            scst_fns = make_scst_fns(
                model, max_length=rl_cfg.get("max_length", 20),
                sample_temp=rl_cfg.get("sample_temp", 1.0))
            rl_scorer = FastCiderD()
            rl_key = jax.random.PRNGKey(seed + 17)
            _rl_gather = jax.jit(
                lambda bank, idx: jnp.take(bank, idx, axis=0)
                .astype(jnp.float32))

            @jax.jit
            def apply_grads(state, grads):
                updates, new_opt = tx.update(grads, state.opt_state,
                                             state.params)
                new_params = optax.apply_updates(state.params, updates)
                return state.replace(step=state.step + 1,
                                     params=new_params, opt_state=new_opt)
        ss_ratio = 1.0
        ss_per_iter = 0.0
        if ss_cfg.get("use"):
            if ss_cfg.get("mode", "linear") == "linear":
                ss_per_iter = (1.0 - ss_cfg.get("final_ratio", 0.7)) \
                    / total_iters
            else:
                ss_per_iter = None  # exponential handled multiplicatively

        swa_cfg = cfg.get("swa", {"use": False})
        swa_state = None
        ckpt_writer = AsyncCheckpointer()
        # one program, one dispatch: jnp.copy leaves are fresh buffers
        # (jit without input-output aliasing never aliases inputs), so
        # the checkpoint worker reads them safely after state donation
        _snapshot_vars = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t))
        monitor = MetricImprover(
            trainer_cfg.get("monitor_metric", {}).get("mode", "max"))
        not_improve = 0
        early_stop = trainer_cfg.get("early_stop", 10)
        log = _make_logger(exp_dir / "train.log")
        tb = _make_tb_writer(exp_dir, cfg)

        # resume (base.py:246-264): "finetune" restores weights only,
        # full resume also restores epoch/monitor/early-stop counters
        start_epoch = 1
        if cfg.get("resume"):
            ckpt = load_checkpoint(cfg["resume"])
            restored = merge_variables(
                {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)},
                ckpt["variables"])
            state = state.replace(params=restored["params"],
                                  batch_stats=restored["batch_stats"])
            if not trainer_cfg.get("finetune", True):
                start_epoch = ckpt.get("epoch", 0) + 1
                if ckpt.get("monitor_state"):
                    monitor.load_state_dict(ckpt["monitor_state"])
                not_improve = ckpt.get("not_improve_cnt", 0)
                state = state.replace(
                    step=jnp.asarray(ckpt.get("lr_count", 0), jnp.int32))
            log(f"resumed from {cfg['resume']} (epoch {start_epoch})")

        # device-resident corpora (data/device_bank.py): ship all wavs
        # to HBM once; steps/val batches then carry only row indices.
        # Worth it on the remote-TPU link where the per-step wav
        # transfer (~20 MB) otherwise dominates the ~120 ms compute.
        train_bank = val_bank = None
        if cfg["data"]["train"].get("device_resident") and mesh is None:
            from audiocaption_tpu.data.device_bank import build_wav_bank
            t_bank = time.time()
            train_bank, bank_lens = build_wav_bank(train_loader.dataset)
            train_loader.dataset.enable_wav_index(bank_lens)
            log(f"train wav bank on device: {train_bank.shape} "
                f"{train_bank.dtype} ({time.time() - t_bank:.0f}s)")
        if val_cfg.get("device_resident") and mesh is None:
            from audiocaption_tpu.data.device_bank import build_wav_bank
            val_bank, vlens = build_wav_bank(val_loader.dataset)
            val_loader.dataset.enable_wav_index(vlens)

        val_score = self._make_val_scorer(model, tokenizer, val_loader,
                                          val_key2refs, wav_bank=val_bank)

        # input pipeline: a worker thread preps batch N+1 and dispatches
        # its host->device transfer while the device runs batch N
        # (data/prefetch.py) — the load+transfer tax otherwise
        # serializes with every step on a remote-TPU link
        step_keys = ("wav", "wav_idx", "wav_len", "cap", "cap_len",
                     "temporal_tag", "condition", "style", "structure",
                     "event", "keyword")

        def _host_prep(batch):
            if rl_train:
                return batch           # SCST consumes the raw batch
            b = {k: batch[k] for k in step_keys if k in batch}
            b["cap"] = np.asarray(b["cap"], np.int32)
            return b

        if rl_train:
            _transfer = lambda b: b    # noqa: E731 — scst_step feeds host arrays
        elif mesh is not None:
            _transfer = lambda b: shard_batch(  # noqa: E731
                _pad_to_devices(b, len(devices)), mesh)
        elif train_bank is not None:
            from audiocaption_tpu.data.prefetch import _default_transfer

            def _transfer(b):
                # attach the committed bank AFTER the device_put of the
                # small leaves (it is already on device; never re-sent)
                b = _default_transfer(b)
                b["wav_bank"] = train_bank
                return b
        else:
            _transfer = None           # prefetch default: plain device_put

        # Remote-TPU (tunnel) robustness: an unbounded async dispatch
        # queue (hundreds of step RPCs in flight, interleaved with
        # remote compiles) has been observed to wedge the link
        # permanently — the epoch-end fetch then blocks forever with
        # every thread futex-parked (see the SIGUSR1 dumps this guards
        # against).  Synchronizing on the newest loss every K steps
        # bounds the in-flight queue at K dispatches for one extra
        # round-trip per K steps (~0.5 s/epoch at K=64).
        sync_every = int(_os.environ.get("AUDIOCAPTION_SYNC_STEPS", 64))

        for epoch in range(start_epoch, epochs + 1):
            t0 = time.time()
            losses = []
            step_i = 0
            pf_kw = {"transform": _host_prep}
            if _transfer is not None:
                pf_kw["transfer"] = _transfer
            for batch in prefetch_to_device(train_loader, **pf_kw):
                if ss_cfg.get("use"):
                    if ss_per_iter is None:
                        ss_ratio *= 0.01 ** (1.0 / total_iters)
                    else:
                        ss_ratio -= ss_per_iter
                if rl_train:
                    keys = list(batch["audio_id"])
                    if train_bank is not None:
                        # device-resident corpus: gather the wav rows on
                        # device (few-KB index upload instead of the
                        # ~40 MB/step waveform batch over the link)
                        batch = dict(batch, wav=_rl_gather(
                            train_bank,
                            jnp.asarray(np.asarray(batch["wav_idx"]))))
                    rl_key, sub = jax.random.split(rl_key)
                    _, grads, rl_metrics = scst_step(
                        model,
                        {"params": state.params,
                         "batch_stats": state.batch_stats},
                        batch, train_key2refs, keys, tokenizer.idx2word,
                        scst_fns, sub, scorer=rl_scorer)
                    state = apply_grads(state, grads)
                    losses.append(-rl_metrics["reward_sample"])
                    continue
                state, metrics = train_step(state, batch,
                                            jnp.float32(ss_ratio))
                # keep the device scalar: a float() here would block on
                # the step and stall the dispatch pipeline every step
                losses.append(metrics["loss"])
                step_i += 1
                if sync_every and step_i % sync_every == 0:
                    jax.block_until_ready(metrics["loss"])
            # ONE device program + ONE fetch for the epoch mean — a
            # device_get of the per-step list is hundreds of tunnel
            # round-trips
            train_loss = (float(jnp.mean(jnp.stack(losses)))
                          if losses else float("nan"))
            t_steps = time.time() - t0

            # validation CIDEr (run.py:150-155), from the device state
            score = val_score(state.params, state.batch_stats)
            t_val = time.time() - t0 - t_steps
            improved = monitor(score)
            not_improve = 0 if improved else not_improve + 1
            if tb is not None:
                tb.add_scalar("train/loss", train_loss, epoch)
                tb.add_scalar("train/ss_ratio", ss_ratio, epoch)
                tb.add_scalar("val/score", score, epoch)

            ckpt_kw = dict(
                epoch=epoch, monitor_state=monitor.state_dict(),
                not_improve_cnt=not_improve,
                tokenizer_state=tokenizer.state_dict(),
                lr_count=int(jax.device_get(state.step)))
            swa_due = (swa_cfg.get("use")
                       and epoch >= swa_cfg.get("start", 21))

            # fetch + serialize off the critical path: the single
            # full-parameter device->host fetch (tens of seconds for
            # Cnn14-size models over a remote-TPU link) and the pickle
            # write run on the checkpoint worker, overlapped with the
            # next epoch's steps; submit() first joins the PREVIOUS
            # epoch's write, so disk state trails by at most one epoch
            # and ckpt_writer.wait() below makes it current.
            # The train step DONATES state (trainer.py donate_argnums),
            # so a late fetch of state.params would hit deleted
            # buffers; snapshot to fresh (undonated) device buffers in
            # one async jitted copy, and let the worker fetch that.
            snap = _snapshot_vars({"params": state.params,
                                   "batch_stats": state.batch_stats})

            def _ckpt_job(snap=snap, improved=improved,
                          ckpt_kw=ckpt_kw, swa_due=swa_due):
                nonlocal variables, swa_state
                variables = jax.device_get(snap)
                save_checkpoint(str(exp_dir / "last.pth"), variables,
                                **ckpt_kw)
                if improved:  # identical payload: copy, don't re-pickle
                    shutil.copyfile(exp_dir / "last.pth",
                                    exp_dir / "best.pth")
                if swa_due:
                    if swa_state is None:
                        swa_state = swa_init(variables["params"],
                                             variables["batch_stats"])
                    swa_state = swa_update(swa_state, variables["params"],
                                           variables["batch_stats"])

            t_blocked = ckpt_writer.submit(_ckpt_job)
            t_ckpt = time.time() - t0 - t_steps - t_val
            log(f"epoch {epoch}: loss {train_loss:.4f} "
                f"val_cider {score:.4f} ss {ss_ratio:.3f} "
                f"({time.time() - t0:.0f}s: steps {t_steps:.0f} "
                f"val {t_val:.0f} ckpt {t_ckpt:.0f} "
                f"ckpt_wait {t_blocked:.0f}) rss {host_rss_gb():.1f}G")

            if not_improve >= early_stop:
                log(f"early stop at epoch {epoch}")
                break

        ckpt_writer.wait()
        final_vars = variables
        if swa_state is not None:
            final_vars = {"params": jax.device_get(swa_state[0]),
                          "batch_stats": jax.device_get(swa_state[1])}
        save_checkpoint(str(exp_dir / "swa.pth"), final_vars,
                        epoch=epochs, monitor_state=monitor.state_dict(),
                        tokenizer_state=tokenizer.state_dict())
        log(f"done; best val score {monitor.best:.4f}")
        return str(exp_dir)

    # ----------------------------------------------------------- KD/aug --

    def train_kd(self, config: str, *overrides) -> str:
        """Knowledge-distillation training (reference KD runners,
        train_eval/kd/run_kd.py, run_wavcaps_kd.py kd_type switch).

        Config adds a ``kd`` block:
            kd:
              type: token | seq | enc
              weight: 0.5          # KD loss mix
              kd_loss: kl          # token KD divergence (kl/l2/l1)
              temperature: 1.0
              teacher:
                experiment_path: EXP   # trained experiment dir
                resume: swa.pth
              teacher_emb: embs.npz    # enc KD: audio_id -> embedding
                                       # (optional when kd.teacher is a
                                       # JAX experiment: its frozen
                                       # encoder then embeds each batch
                                       # on the fly, run_enc_kd.py:76-84)
        """
        cfg = load_config(config, parse_overrides(overrides))
        kd_cfg = cfg["kd"]
        kd_type = kd_cfg.get("type", "token")
        seed = cfg.get("seed", 1)
        set_seed(seed)
        exp_dir = Path(cfg["experiment_path"]) / f"seed_{seed}"
        exp_dir.mkdir(parents=True, exist_ok=True)
        with open(exp_dir / "config.yaml", "w") as f:
            yaml.safe_dump(cfg, f)

        tok_cfg = cfg["data"]["train"]["collate_fn"]["tokenizer"]
        tokenizer = build_tokenizer(tok_cfg)
        train_loader = build_dataloader(cfg["data"]["train"], tokenizer,
                                        train=True)
        val_cfg = cfg["data"]["val"]
        val_loader = build_dataloader(val_cfg, train=False)
        val_key2refs = load_caption_json(val_cfg["caption"],
                                         zh=cfg.get("zh", False))

        model, pretrained = build_model_from_config(
            cfg["model"], vocab_size=len(tokenizer))
        with jax.default_device(jax.devices("cpu")[0]):
            variables = self._init_variables(model, cfg, seed)
        for spec in pretrained:
            variables = load_pretrained_into(variables, spec)
        variables = jax.device_get(variables)

        trainer_cfg = cfg.get("trainer", {})
        epochs = trainer_cfg.get("epochs", 25)
        total_iters = epochs * len(train_loader)
        opt_args = cfg.get("optimizer", {}).get("args", {})
        base_lr = opt_args.get("lr", 5e-4)
        sched = build_schedule(cfg.get("lr_scheduler", {}), base_lr,
                               total_iters, total_iters // 5)
        tx = make_optimizer(base_lr, sched,
                            weight_decay=opt_args.get("weight_decay", 0.0),
                            max_grad_norm=trainer_cfg.get(
                                "max_grad_norm", 1.0))
        log = _make_logger(exp_dir / "train.log")

        # teacher (a trained experiment of THIS framework; the reference
        # builds its teacher from an experiment config the same way,
        # kd/run_kd.py teacher loading)
        teacher_fwd = None
        teacher_generate = None
        teacher_emb_fwd = None
        if kd_cfg.get("teacher"):
            t_cfg, t_model, t_vars, t_tok = self._load_experiment(
                kd_cfg["teacher"]["experiment_path"],
                kd_cfg["teacher"].get("resume", "swa.pth"))

            # teacher params travel as TRACED jit arguments, not baked
            # constants: big teachers (cnn14rnn ~350 MB) exceed the
            # axon remote-compile request cap (HTTP 413) when folded
            # into the program.  device_put once so the slow h2d link
            # pays the transfer once, not per batch.
            t_vars_dev = jax.device_put(t_vars)

            if kd_type == "token":
                @jax.jit
                def _teacher_fwd(tv, wav, wav_len, cap, cap_len):
                    out = t_model.apply(
                        tv, wav, wav_len, cap, cap_len,
                        ss_ratio=1.0, train=False,
                        rngs={"sample": jax.random.PRNGKey(0)})
                    return out["logit"]

                def teacher_fwd(wav, wav_len, cap, cap_len):
                    return _teacher_fwd(t_vars_dev, wav, wav_len,
                                        cap, cap_len)
            elif kd_type == "seq":
                # hoisted jit: a fresh wrapper per call would recompile
                # every batch on the tunnel
                _teacher_gen = jax.jit(
                    lambda tv, w, wl: generate(t_model, tv, w, wl,
                                               sample_method="greedy")
                    ["seq"])

                def teacher_generate(wav, wav_len):
                    seq = _teacher_gen(t_vars_dev, jnp.asarray(wav),
                                       jnp.asarray(wav_len))
                    return t_tok.decode(np.asarray(seq))
            elif kd_type == "enc":
                # on-the-fly teacher embeddings from a frozen JAX
                # encoder (the reference's run_enc_kd.py computes the
                # BART-teacher embedding per batch the same way,
                # run_enc_kd.py:76-84); no npz cache required
                from audiocaption_tpu.models.captioner import Captioner

                @jax.jit
                def _teacher_emb_fwd(tv, wav, wav_len):
                    enc = t_model.apply(tv, wav, wav_len,
                                        train=False,
                                        method=Captioner.encode)
                    return enc["fc_emb"]

                def teacher_emb_fwd(wav, wav_len):
                    return _teacher_emb_fwd(t_vars_dev, wav, wav_len)

        from audiocaption_tpu.training import create_train_state
        state = create_train_state(variables, tx, jax.random.PRNGKey(seed))

        # device-resident corpus (data/device_bank.py), same lever as
        # the XE trainer: ship all train wavs to HBM once; epochs then
        # move only row indices.  The bank is built AFTER the seq-KD
        # pseudo-caption pass below (which needs raw wavs from the
        # loader), so run_steps resolve wav lazily through _wav_of.
        train_bank = None

        def _wav_of(batch):
            if train_bank is not None:
                from audiocaption_tpu.data.device_bank import bank_rows
                return bank_rows(train_bank,
                                 jnp.asarray(batch["wav_idx"]))
            return jnp.asarray(batch["wav"])

        if kd_type == "seq":
            # teacher-generated pseudo captions, cached per audio id
            # (run_wavcaps_kd.py:50-70); student then trains on them
            from audiocaption_tpu.training.distill import (
                generate_pseudo_captions)
            cache_path = exp_dir / "pseudo_captions.json"
            cache = (json.loads(cache_path.read_text())
                     if cache_path.exists() else {})
            cache = generate_pseudo_captions(teacher_generate,
                                             train_loader, cache)
            cache_path.write_text(json.dumps(cache, indent=1))
            step = make_train_step(
                model, build_loss(cfg.get("loss", {})), tx, use_ss=False)

            def run_step(state, batch):
                enc = tokenizer([cache[a] for a in batch["audio_id"]])
                b = {"wav": _wav_of(batch), "wav_len": batch["wav_len"],
                     "cap": np.asarray(enc["cap"], np.int32),
                     "cap_len": np.asarray(enc["cap_len"])}
                return step(state, b, jnp.float32(1.0))
        elif kd_type == "enc":
            from audiocaption_tpu.losses.kd import ContraEncoderKdHead
            from audiocaption_tpu.training.distill import (
                make_encoder_kd_step)
            embs = None
            if kd_cfg.get("teacher_emb"):
                embs = dict(np.load(kd_cfg["teacher_emb"]))
                tchr_dim = next(iter(embs.values())).shape[-1]
            elif teacher_emb_fwd is not None:
                # abstract trace only — deriving the teacher embedding
                # width must not trigger a compile (or depend on the
                # val loader being non-empty)
                tchr_dim = int(jax.eval_shape(
                    teacher_emb_fwd,
                    jax.ShapeDtypeStruct((1, 32000), jnp.float32),
                    jax.ShapeDtypeStruct((1,), jnp.int32)).shape[-1])
            else:
                raise ValueError(
                    "enc KD needs kd.teacher_emb (npz) or kd.teacher "
                    "(a trained experiment whose encoder provides "
                    "embeddings on the fly)")
            kd_head = ContraEncoderKdHead(
                shared_dim=kd_cfg.get("shared_dim", 1024))
            fc_dim = model.decoder.fc_emb_dim or 512
            head_vars = kd_head.init(jax.random.PRNGKey(seed),
                                     jnp.zeros((2, fc_dim)),
                                     jnp.zeros((2, tchr_dim)))
            state = create_train_state(
                {"params": {"model": variables["params"],
                            "kd": head_vars["params"]},
                 "batch_stats": variables.get("batch_stats", {})},
                tx, jax.random.PRNGKey(seed))
            kd_step = make_encoder_kd_step(
                model, kd_head, tx, kd_weight=kd_cfg.get("weight", 1.0),
                unsup=kd_cfg.get("unsup", False))

            def run_step(state, batch):
                wav = _wav_of(batch)
                wav_len = jnp.asarray(batch["wav_len"])
                if embs is not None:
                    tchr = jnp.asarray(np.stack(
                        [embs[a] for a in batch["audio_id"]]))
                else:
                    tchr = teacher_emb_fwd(wav, wav_len)
                b = {"wav": wav, "wav_len": wav_len, "tchr_emb": tchr}
                if not kd_cfg.get("unsup", False):
                    b["cap"] = jnp.asarray(batch["cap"], jnp.int32)
                    b["cap_len"] = jnp.asarray(batch["cap_len"])
                return kd_step(state, b, jnp.float32(1.0))
        else:  # token
            from audiocaption_tpu.training.distill import make_token_kd_step
            kd_step = make_token_kd_step(
                model, tx, kd_weight=kd_cfg.get("weight", 0.5),
                kd_type=kd_cfg.get("kd_loss", "kl"),
                temperature=kd_cfg.get("temperature", 1.0),
                smoothing=cfg.get("loss", {}).get(
                    "args", {}).get("smoothing", 0.1))

            def run_step(state, batch):
                wav = _wav_of(batch)
                wav_len = jnp.asarray(batch["wav_len"])
                cap = jnp.asarray(batch["cap"], jnp.int32)
                cap_len = jnp.asarray(batch["cap_len"])
                t_logit = teacher_fwd(wav, wav_len, cap, cap_len)
                b = {"wav": wav, "wav_len": wav_len, "cap": cap,
                     "cap_len": cap_len, "teacher_logit": t_logit}
                return kd_step(state, b, jnp.float32(1.0))

        if cfg["data"]["train"].get("device_resident"):
            from audiocaption_tpu.data.device_bank import build_wav_bank
            t_bank = time.time()
            train_bank, bank_lens = build_wav_bank(train_loader.dataset)
            train_loader.dataset.enable_wav_index(bank_lens)
            log(f"train wav bank on device: {train_bank.shape} "
                f"{train_bank.dtype} ({time.time() - t_bank:.0f}s)")
        val_bank = None
        if val_cfg.get("device_resident"):
            from audiocaption_tpu.data.device_bank import build_wav_bank
            val_bank, vlens = build_wav_bank(val_loader.dataset)
            val_loader.dataset.enable_wav_index(vlens)

        monitor = MetricImprover("max")
        ckpt_writer = AsyncCheckpointer()
        val_score = self._make_val_scorer(model, tokenizer, val_loader,
                                          val_key2refs, wav_bank=val_bank)
        for epoch in range(1, epochs + 1):
            t0 = time.time()
            losses = []
            for batch in prefetch_to_device(train_loader):
                state, metrics = run_step(state, batch)
                losses.append(metrics["loss"])  # device scalar, no sync
            params = state.params["model"] if kd_type == "enc" \
                else state.params
            score = val_score(params, state.batch_stats)
            improved = monitor(score)
            log(f"kd[{kd_type}] epoch {epoch}: "
                f"loss {float(np.mean(jax.device_get(losses))):.4f} "
                f"val_cider {score:.4f} ({time.time() - t0:.0f}s) "
                f"rss {host_rss_gb():.1f}G")

            def _ckpt_job(params=params, state=state, epoch=epoch,
                          improved=improved):
                nonlocal variables
                variables = {
                    "params": jax.device_get(params),
                    "batch_stats": jax.device_get(state.batch_stats)}
                save_checkpoint(str(exp_dir / "last.pth"), variables,
                                epoch=epoch,
                                tokenizer_state=tokenizer.state_dict())
                if improved:  # identical payload: copy, don't re-pickle
                    shutil.copyfile(exp_dir / "last.pth",
                                    exp_dir / "best.pth")

            ckpt_writer.submit(_ckpt_job)
        ckpt_writer.wait()
        save_checkpoint(str(exp_dir / "swa.pth"), variables,
                        epoch=epochs,
                        tokenizer_state=tokenizer.state_dict())
        return str(exp_dir)

    def train_aug(self, config: str, *overrides) -> str:
        """Dual-loader augmented training (run_aug.py:37-99):
        loss = real + discount * aug, with a ``data.train_aug`` loader
        and an ``aug: {discount, mode}`` block."""
        from audiocaption_tpu.training.aug_runner import (
            discount_schedule, interleave_loaders, make_aug_train_step)
        from audiocaption_tpu.training import create_train_state

        cfg = load_config(config, parse_overrides(overrides))
        seed = cfg.get("seed", 1)
        set_seed(seed)
        exp_dir = Path(cfg["experiment_path"]) / f"seed_{seed}"
        exp_dir.mkdir(parents=True, exist_ok=True)
        with open(exp_dir / "config.yaml", "w") as f:
            yaml.safe_dump(cfg, f)

        tok_cfg = cfg["data"]["train"]["collate_fn"]["tokenizer"]
        tokenizer = build_tokenizer(tok_cfg)
        train_loader = build_dataloader(cfg["data"]["train"], tokenizer,
                                        train=True)
        aug_loader = build_dataloader(cfg["data"]["train_aug"], tokenizer,
                                      train=True)
        val_cfg = cfg["data"]["val"]
        val_loader = build_dataloader(val_cfg, train=False)
        val_key2refs = load_caption_json(val_cfg["caption"],
                                         zh=cfg.get("zh", False))

        model, pretrained = build_model_from_config(
            cfg["model"], vocab_size=len(tokenizer))
        with jax.default_device(jax.devices("cpu")[0]):
            variables = self._init_variables(model, cfg, seed)
        for spec in pretrained:
            variables = load_pretrained_into(variables, spec)
        variables = jax.device_get(variables)

        trainer_cfg = cfg.get("trainer", {})
        epochs = trainer_cfg.get("epochs", 25)
        total_iters = epochs * len(train_loader)
        opt_args = cfg.get("optimizer", {}).get("args", {})
        base_lr = opt_args.get("lr", 5e-4)
        sched = build_schedule(cfg.get("lr_scheduler", {}), base_lr,
                               total_iters, total_iters // 5)
        tx = make_optimizer(base_lr, sched,
                            weight_decay=opt_args.get("weight_decay", 0.0),
                            max_grad_norm=trainer_cfg.get(
                                "max_grad_norm", 1.0))
        state = create_train_state(variables, tx, jax.random.PRNGKey(seed))
        aug_cfg = cfg.get("aug", {}) or {}
        disc_fn = discount_schedule(aug_cfg.get("mode", "linear"),
                                    aug_cfg.get("discount", 0.5),
                                    total_iters)
        step = make_aug_train_step(model, build_loss(cfg.get("loss", {})),
                                   tx)
        log = _make_logger(exp_dir / "train.log")

        # device-resident corpora: one bank per loader (the real and
        # augmented splits are distinct corpora); batches then carry
        # only row indices, gathered on device in prep()
        from audiocaption_tpu.data.device_bank import (bank_rows,
                                                       build_wav_bank)
        banks = {}
        for name, loader in (("train", train_loader),
                             ("train_aug", aug_loader),
                             ("val", val_loader)):
            if cfg["data"][name].get("device_resident"):
                t_bank = time.time()
                bank, lens = build_wav_bank(loader.dataset)
                loader.dataset.enable_wav_index(lens)
                banks[name] = bank
                log(f"{name} wav bank on device: {bank.shape} "
                    f"{bank.dtype} ({time.time() - t_bank:.0f}s)")

        monitor = MetricImprover("max")
        ckpt_writer = AsyncCheckpointer()
        val_score = self._make_val_scorer(model, tokenizer, val_loader,
                                          val_key2refs,
                                          wav_bank=banks.get("val"))
        it = 0
        for epoch in range(1, epochs + 1):
            t0 = time.time()
            losses = []
            for real, aug in prefetch_to_device(
                    interleave_loaders(train_loader, aug_loader)):
                def prep(b, bank):
                    wav = (bank_rows(bank, jnp.asarray(b["wav_idx"]))
                           if bank is not None else jnp.asarray(b["wav"]))
                    return {"wav": wav,
                            "wav_len": jnp.asarray(b["wav_len"]),
                            "cap": jnp.asarray(b["cap"], jnp.int32),
                            "cap_len": jnp.asarray(b["cap_len"])}
                state, metrics = step(state,
                                      prep(real, banks.get("train")),
                                      prep(aug, banks.get("train_aug")),
                                      jnp.float32(disc_fn(it)),
                                      jnp.float32(1.0))
                losses.append(metrics["loss"])  # device scalar, no sync
                it += 1
            score = val_score(state.params, state.batch_stats)
            improved = monitor(score)
            log(f"aug epoch {epoch}: "
                f"loss {float(np.mean(jax.device_get(losses))):.4f} "
                f"val_cider {score:.4f} discount {disc_fn(it):.3f} "
                f"({time.time() - t0:.0f}s) rss {host_rss_gb():.1f}G")

            def _ckpt_job(state=state, epoch=epoch, improved=improved):
                nonlocal variables
                variables = {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats)}
                save_checkpoint(str(exp_dir / "last.pth"), variables,
                                epoch=epoch,
                                tokenizer_state=tokenizer.state_dict())
                if improved:  # identical payload: copy, don't re-pickle
                    shutil.copyfile(exp_dir / "last.pth",
                                    exp_dir / "best.pth")

            ckpt_writer.submit(_ckpt_job)
        ckpt_writer.wait()
        save_checkpoint(str(exp_dir / "swa.pth"), variables, epoch=epochs,
                        tokenizer_state=tokenizer.state_dict())
        return str(exp_dir)

    def _init_variables(self, model: Captioner, cfg: Dict, seed: int):
        if model.input_mode == "features":
            # precomputed-feature models need the feature dim to shape
            # the init input (encoder.args.input_dim in the config)
            dim = cfg["model"]["encoder"].get("args", {}).get(
                "input_dim", 512)
            wav = jnp.zeros((1, 8, dim))
            wav_len = jnp.asarray([8])
        else:
            sr = model.mel.sample_rate
            wav = jnp.zeros((1, sr))
            wav_len = jnp.asarray([sr])
        cap = jnp.ones((1, 4), jnp.int32)
        kwargs = {}
        if "Temporal" in type(model.decoder).__name__:
            kwargs["temporal_tag"] = jnp.zeros((1,), jnp.int32)
        return model.init(
            {"params": jax.random.PRNGKey(seed),
             "sample": jax.random.PRNGKey(seed + 1),
             "dropout": jax.random.PRNGKey(seed + 2)},
            wav, wav_len, cap, jnp.asarray([4]), train=False,
            **kwargs)

    # ------------------------------------------------------ decode/eval --

    def _decode_loader(self, model, variables, tokenizer, loader,
                       **inference_args) -> Dict[str, List[str]]:
        decode_jit = {}

        def run(wav, wav_len, tag):
            key = (wav.shape, tag is not None)
            if key not in decode_jit:
                if tag is None:
                    decode_jit[key] = jax.jit(
                        lambda v, w, wl: generate(
                            model, v, w, wl, **inference_args)["seq"])
                else:
                    decode_jit[key] = jax.jit(
                        lambda v, w, wl, t: generate(
                            model, v, w, wl, temporal_tag=t,
                            **inference_args)["seq"])
            if tag is None:
                return decode_jit[key](variables, wav, wav_len)
            return decode_jit[key](variables, wav, wav_len, tag)

        key2pred: Dict[str, List[str]] = {}
        for batch in loader:
            tag = (jnp.asarray(batch["temporal_tag"])
                   if "temporal_tag" in batch else None)
            seq = run(jnp.asarray(batch["wav"]),
                      jnp.asarray(batch["wav_len"]), tag)
            caps = tokenizer.decode(np.asarray(seq))
            for aid, cap in zip(batch["audio_id"], caps):
                key2pred.setdefault(aid, [cap])
        return key2pred

    def _make_val_scorer(self, model, tokenizer, val_loader, key2refs,
                         wav_bank=None):
        """Per-epoch greedy val CIDEr over the DEVICE-resident train
        state (run.py:150-155 semantics).

        One persistent jitted decode is reused across every epoch.  The
        round-2 code built a fresh ``jax.jit`` closure per epoch, which
        on the remote-TPU tunnel recompiled the whole val decode every
        epoch (minutes each) and retained each epoch's executable plus a
        full host copy of the parameters — an unbounded host-memory leak
        (~1 GB/min at flagship size).  Decoding straight from the device
        state also removes the 2x full-parameter host<->device round
        trip per epoch.
        """
        from audiocaption_tpu.native import FastCiderD
        scorer = FastCiderD()

        def _expand(wav):
            if wav.dtype in (jnp.float16, jnp.bfloat16):
                return wav.astype(jnp.float32)
            if wav.dtype == jnp.int16:
                return wav.astype(jnp.float32) / 32768.0
            return wav

        @partial(jax.jit, static_argnames=("with_tag",))
        def decode(params, batch_stats, wav, wav_len, tag=None,
                   with_tag=False):
            return generate(model,
                            {"params": params, "batch_stats": batch_stats},
                            _expand(wav), wav_len,
                            temporal_tag=tag if with_tag else None,
                            sample_method="greedy")["seq"]

        @partial(jax.jit, static_argnames=("with_tag",))
        def decode_idx(params, batch_stats, bank, idx, wav_len, tag=None,
                       with_tag=False):
            # device-resident val corpus: gather wav rows on device
            return generate(model,
                            {"params": params, "batch_stats": batch_stats},
                            _expand(jnp.take(bank, idx, axis=0)), wav_len,
                            temporal_tag=tag if with_tag else None,
                            sample_method="greedy")["seq"]

        def score(params, batch_stats) -> float:
            from audiocaption_tpu.data.prefetch import prefetch_to_device
            key2pred: Dict[str, List[str]] = {}
            for batch in prefetch_to_device(val_loader):
                tag = {}
                if "temporal_tag" in batch:
                    tag = {"tag": jnp.asarray(batch["temporal_tag"]),
                           "with_tag": True}
                if "wav_idx" in batch:
                    seq = decode_idx(params, batch_stats, wav_bank,
                                     jnp.asarray(batch["wav_idx"]),
                                     jnp.asarray(batch["wav_len"]), **tag)
                else:
                    seq = decode(params, batch_stats,
                                 jnp.asarray(batch["wav"]),
                                 jnp.asarray(batch["wav_len"]), **tag)
                caps = tokenizer.decode(np.asarray(seq))
                for aid, cap in zip(batch["audio_id"], caps):
                    key2pred.setdefault(aid, [cap])
            refs = {k: v for k, v in key2refs.items() if k in key2pred}
            preds = {k: v for k, v in key2pred.items() if k in refs}
            s, _ = scorer.compute_score(ptb_tokenize(refs),
                                        ptb_tokenize(preds))
            return s

        return score

    # ---------------------------------------------------------- predict --

    def _load_experiment(self, experiment_path: str, resume: str):
        exp_dir = Path(experiment_path)
        cfg = load_config(str(exp_dir / "config.yaml"))
        ckpt = load_checkpoint(str(exp_dir / resume))
        tokenizer = DictTokenizer()
        if ckpt.get("tokenizer"):
            tokenizer.load_state_dict(ckpt["tokenizer"])
            tokenizer.loaded = True
        # SCST experiments store the wrapped config; at inference the
        # ScstWrapper is a passthrough (reference rl_model.py:19-22), so
        # unwrap to the inner encoder/decoder node (same as train,
        # reference run.py:67-75)
        model_cfg = cfg["model"]
        if _short(model_cfg.get("type", "")) == "ScstWrapper":
            model_cfg = model_cfg["model"]
        model, _ = build_model_from_config(model_cfg,
                                           vocab_size=len(tokenizer))
        return cfg, model, ckpt["variables"], tokenizer

    def predict(self, experiment_path: str, eval_config: str,
                *overrides) -> Dict[str, List[str]]:
        eval_cfg = load_config(eval_config, parse_overrides(overrides))
        resume = eval_cfg.get("resume", "swa.pth")
        cfg, model, variables, tokenizer = self._load_experiment(
            experiment_path, resume)
        test_cfg = eval_cfg["data"]["test"]
        loader = build_dataloader(test_cfg, train=False)
        inference_args = dict(eval_cfg.get("inference_args",
                                           {"sample_method": "beam",
                                            "beam_size": 3}))
        key2pred = self._decode_loader(model, variables, tokenizer, loader,
                                       **inference_args)
        out_path = Path(experiment_path) / eval_cfg.get(
            "caption_output", "predictions/predictions.json")
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({"predictions": [
                {"filename": k, "caption": v[0]}
                for k, v in key2pred.items()]}, f, indent=2)
        return key2pred

    def evaluate(self, experiment_path: str, eval_config: str,
                 *overrides) -> Dict:
        eval_cfg = load_config(eval_config, parse_overrides(overrides))
        key2pred = self.predict(experiment_path, eval_config, *overrides)
        key2refs = load_caption_json(eval_cfg["data"]["test"]["caption"])
        key2refs = {k: v for k, v in key2refs.items() if k in key2pred}
        result = evaluate_captions(key2pred, key2refs)
        score_path = Path(experiment_path) / eval_cfg.get(
            "score_output", "results/scores.txt")
        score_path.parent.mkdir(parents=True, exist_ok=True)
        with open(score_path, "w") as f:
            for k, v in result.items():
                if isinstance(v, float):
                    f.write(f"{k}: {v:.4f}\n")
        return result

    def export_hf(self, experiment_path: str, output: str,
                  resume: str = "swa.pth") -> str:
        """Export a trained EffB2+Trm experiment into the reference's
        HF checkpoint format (hf_wrapper.py:1144-1160 key naming), so
        the weights load in the reference's own
        ``Effb2TrmCaptioningModel`` / this repo's hf_api.  Inverse of
        the ingestion converters (models/export.py); the roundtrip is
        token-parity-tested (tests/test_hf_checkpoint_io.py)."""
        import torch

        from audiocaption_tpu.models.effb2 import EfficientNetB2
        from audiocaption_tpu.models.export import effb2_trm_hf_state_dict
        from audiocaption_tpu.models.transformer_decoder import (
            TransformerDecoder)
        cfg, model, variables, tokenizer = self._load_experiment(
            experiment_path, resume)
        if not (isinstance(model.encoder, EfficientNetB2)
                and type(model.decoder) is TransformerDecoder):
            raise ValueError(
                "export_hf supports the EffB2+TransformerDecoder family "
                "(the HF zoo format, hf_wrapper.py:1115-1181); got "
                f"{type(model.encoder).__name__}+"
                f"{type(model.decoder).__name__}")
        sd = effb2_trm_hf_state_dict(
            variables, nlayers=model.decoder.nlayers,
            tie_weights=model.decoder.tie_weights)
        out_path = Path(output)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        torch.save({k: torch.as_tensor(v) for k, v in sd.items()},
                   out_path)
        print(f"exported {len(sd)} tensors to {out_path}")
        return str(out_path)

    # ----------------------------------------------------- SED/temporal --

    def train_sed(self, config: str, *overrides) -> str:
        """Train the Cnn8Rnn SED net framewise on a corpus with event
        segment annotations ({split}_sed.json from
        synthetic_corpus.generate_temporal), selecting by val
        temporal-tag accuracy of the full host-side tag pipeline.  The
        reference ships this net pretrained only (hf_wrapper.py:
        1791-1859) — this closes the training loop for new corpora."""
        import optax
        from audiocaption_tpu.models.sed import Cnn8RnnSedModel
        from audiocaption_tpu.ops.frontend import (
            CNN14_MEL_32K, LogMelFrontend)
        from audiocaption_tpu.training.sed_trainer import (
            build_lms_bank, evaluate_tags, framewise_targets,
            load_sed_annotations, make_sed_train_step)

        cfg = load_config(config, parse_overrides(overrides))
        seed = cfg.get("seed", 1)
        set_seed(seed)
        exp_dir = Path(cfg["experiment_path"]) / f"seed_{seed}"
        exp_dir.mkdir(parents=True, exist_ok=True)
        with open(exp_dir / "config.yaml", "w") as f:
            yaml.safe_dump(cfg, f)
        log = _make_logger(exp_dir / "train.log")

        classes_num = cfg["model"]["args"].get("classes_num", 447)
        model = Cnn8RnnSedModel(classes_num=classes_num)
        frontend = LogMelFrontend(CNN14_MEL_32K)

        t0 = time.time()
        banks, targets, tags = {}, {}, {}
        for split in ("train", "val"):
            ann = load_sed_annotations(cfg["data"][split]["sed"])
            ids = [a["audio_id"] for a in ann]
            banks[split] = build_lms_bank(cfg["data"][split]["h5"], ids,
                                          frontend)
            n_frames = banks[split].shape[1]
            targets[split] = jnp.asarray(np.stack(
                [framewise_targets(a["segments"], n_frames, classes_num)
                 for a in ann]))
            tags[split] = np.asarray([a["tag"] for a in ann], np.int32)
        log(f"lms banks on device: train {banks['train'].shape} "
            f"val {banks['val'].shape} f16 ({time.time() - t0:.0f}s)")

        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1,) + banks["train"].shape[1:],
                                         jnp.float32))
        variables = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}
        lr = float(cfg.get("optimizer", {}).get("args", {})
                   .get("lr", 1e-3))
        tx = optax.adam(lr)
        opt_state = tx.init(variables["params"])
        step_fn = make_sed_train_step(model, tx)

        epochs = int(cfg.get("trainer", {}).get("epochs", 15))
        bs = int(cfg.get("trainer", {}).get("batch_size", 32))
        rng = np.random.RandomState(seed)
        n = banks["train"].shape[0]
        best_acc, best_epoch = -1.0, 0
        key = jax.random.PRNGKey(seed + 1)
        for epoch in range(1, epochs + 1):
            te = time.time()
            perm = rng.permutation(n)
            losses = []
            for i in range(0, n - bs + 1, bs):
                key, sub = jax.random.split(key)
                idx = jnp.asarray(perm[i:i + bs])
                opt_state, variables, loss = step_fn(
                    opt_state, variables, banks["train"],
                    targets["train"], idx, sub)
                losses.append(loss)
            acc, _ = evaluate_tags(model, variables, banks["val"],
                                   tags["val"])
            mean_loss = float(np.mean([np.asarray(l) for l in losses]))
            log(f"epoch {epoch}: bce {mean_loss:.4f} "
                f"val_tag_acc {acc:.4f} ({time.time() - te:.0f}s)")
            if acc > best_acc:
                best_acc, best_epoch = acc, epoch
                save_checkpoint(str(exp_dir / "best.pth"), variables,
                                epoch=epoch,
                                extra={"classes_num": classes_num,
                                       "val_tag_acc": acc})
        save_checkpoint(str(exp_dir / "last.pth"), variables,
                        epoch=epochs,
                        extra={"classes_num": classes_num})
        log(f"done; best val tag accuracy {best_acc:.4f} "
            f"(epoch {best_epoch})")
        return str(exp_dir)

    def _load_sed(self, sed_experiment_path: str, resume: str = "best.pth"):
        from audiocaption_tpu.models.sed import Cnn8RnnSedModel
        from audiocaption_tpu.ops.frontend import (
            CNN14_MEL_32K, LogMelFrontend)
        ckpt = load_checkpoint(str(Path(sed_experiment_path) / resume))
        model = Cnn8RnnSedModel(
            classes_num=ckpt.get("classes_num", 447))
        return model, ckpt["variables"], LogMelFrontend(CNN14_MEL_32K)

    def predict_temporal(self, experiment_path: str,
                         sed_experiment_path: str, eval_config: str,
                         *overrides) -> Dict[str, List[str]]:
        """Decode with SED-PREDICTED temporal tags — the full serving
        pipeline of the temporal model (hf_wrapper.py:1942-1973: shared
        log-mel -> SED framewise -> double_threshold -> tag ->
        tag-conditioned beam decode), but from experiment directories
        trained in this framework.  If the eval dataset carries
        ground-truth ``temporal_tag``, SED tag accuracy is reported to
        ``tag_output``."""
        from audiocaption_tpu.models.sed import framewise_to_temporal_tags

        eval_cfg = load_config(eval_config, parse_overrides(overrides))
        resume = eval_cfg.get("resume", "swa.pth")
        cfg, model, variables, tokenizer = self._load_experiment(
            experiment_path, resume)
        sed_model, sed_vars, sed_frontend = self._load_sed(
            sed_experiment_path, eval_cfg.get("sed_resume", "best.pth"))
        loader = build_dataloader(eval_cfg["data"]["test"], train=False)
        inference_args = dict(eval_cfg.get("inference_args",
                                           {"sample_method": "beam",
                                            "beam_size": 3}))
        inference_args.pop("temporal_tag", None)

        sed_fn = jax.jit(lambda v, w: sed_model.apply(
            v, sed_frontend(w), train=False)["framewise_output"])
        decode_jit = {}

        def decode(wav, wav_len, tag):
            key = wav.shape
            if key not in decode_jit:
                decode_jit[key] = jax.jit(
                    lambda v, w, wl, t: generate(
                        model, v, w, wl, temporal_tag=t,
                        **inference_args)["seq"])
            return decode_jit[key](variables, wav, wav_len, tag)

        key2pred: Dict[str, List[str]] = {}
        n_match = n_tag = 0
        for batch in loader:
            wav = jnp.asarray(batch["wav"])
            framewise = np.asarray(sed_fn(sed_vars, wav))
            sed_tag = framewise_to_temporal_tags(framewise)
            if "temporal_tag" in batch:
                gt = np.asarray(batch["temporal_tag"], np.int32)
                n_match += int((sed_tag == gt).sum())
                n_tag += len(gt)
            seq = decode(wav, jnp.asarray(batch["wav_len"]),
                         jnp.asarray(sed_tag))
            caps = tokenizer.decode(np.asarray(seq))
            for aid, cap in zip(batch["audio_id"], caps):
                key2pred.setdefault(aid, [cap])

        out_path = Path(experiment_path) / eval_cfg.get(
            "caption_output", "predictions/predictions_sedtag.json")
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({"predictions": [
                {"filename": k, "caption": v[0]}
                for k, v in key2pred.items()]}, f, indent=2)
        if n_tag:
            tag_path = Path(experiment_path) / eval_cfg.get(
                "tag_output", "results/sed_tag_accuracy.txt")
            tag_path.parent.mkdir(parents=True, exist_ok=True)
            with open(tag_path, "w") as f:
                f.write(f"sed_tag_accuracy: {n_match / n_tag:.4f} "
                        f"({n_match}/{n_tag})\n")
        return key2pred

    def evaluate_temporal(self, experiment_path: str,
                          sed_experiment_path: str, eval_config: str,
                          *overrides) -> Dict:
        """predict_temporal + caption metrics (base.py:72-127)."""
        eval_cfg = load_config(eval_config, parse_overrides(overrides))
        key2pred = self.predict_temporal(
            experiment_path, sed_experiment_path, eval_config, *overrides)
        key2refs = load_caption_json(eval_cfg["data"]["test"]["caption"])
        key2refs = {k: v for k, v in key2refs.items() if k in key2pred}
        result = evaluate_captions(key2pred, key2refs)
        score_path = Path(experiment_path) / eval_cfg.get(
            "score_output", "results/scores_sedtag.txt")
        score_path.parent.mkdir(parents=True, exist_ok=True)
        with open(score_path, "w") as f:
            for k, v in result.items():
                if isinstance(v, float):
                    f.write(f"{k}: {v:.4f}\n")
        return result

    # --------------------------------------------------------- ensemble --

    def _load_ensemble(self, eval_cfg: Dict):
        """Load N trained experiments (ensemble.py:290-300); all must
        share the tokenizer/vocab.  Members are either plain experiment
        paths (the global ``resume`` applies) or ``{path, resume}``
        mappings for mixed ensembles whose members checkpoint under
        different names (e.g. XE swa.pth + SCST best.pth)."""
        default_resume = eval_cfg.get("resume", "swa.pth")
        models, variables_list, tokenizer = [], [], None
        for member in eval_cfg["experiment_path"]:
            if isinstance(member, dict):
                exp_path = member["path"]
                resume = member.get("resume", default_resume)
            else:
                exp_path, resume = member, default_resume
            cfg, model, variables, tok = self._load_experiment(
                exp_path, resume)
            models.append(model)
            variables_list.append(variables)
            tokenizer = tokenizer or tok
        return models, variables_list, tokenizer

    def ensemble_predict(self, eval_config: str, *overrides,
                         dump_output: bool = True) -> Dict[str, List[str]]:
        """Ensembled decode by mean per-step log-softmax
        (ensemble.py:133-276; decoding/ensemble.py here): predictions
        json in the reference's format."""
        from audiocaption_tpu.decoding.ensemble import ensemble_generate
        eval_cfg = load_config(eval_config, parse_overrides(overrides))
        models, variables_list, tokenizer = self._load_ensemble(eval_cfg)
        loader = build_dataloader(eval_cfg["data"]["test"], train=False)
        inference_args = dict(eval_cfg.get("inference_args",
                                           {"sample_method": "beam",
                                            "beam_size": 3}))
        decode_jit = {}

        def run(wav, wav_len):
            key = wav.shape
            if key not in decode_jit:
                # variables_list is a traced ARGUMENT, not a closure:
                # N closed-over member models (2x ~350 MB Cnn14Rnn)
                # baked as HLO constants exceed the axon remote-compile
                # request limit (HTTP 413)
                decode_jit[key] = jax.jit(
                    lambda vs, w, wl: ensemble_generate(
                        models, vs, w, wl,
                        **inference_args)["seq"])
            return decode_jit[key](variables_list, wav, wav_len)

        key2pred: Dict[str, List[str]] = {}
        for batch in loader:
            seq = run(jnp.asarray(batch["wav"]),
                      jnp.asarray(batch["wav_len"]))
            seq = np.asarray(seq)
            if seq.ndim == 3:       # n-best layouts: take the top beam
                seq = seq[:, 0]
            caps = tokenizer.decode(seq)
            for aid, cap in zip(batch["audio_id"], caps):
                key2pred.setdefault(aid, [cap])
        if dump_output:
            out_path = Path(eval_cfg["output_path"]) / eval_cfg.get(
                "caption_output", "predictions.json")
            out_path.parent.mkdir(parents=True, exist_ok=True)
            with open(out_path, "w") as f:
                json.dump({"predictions": [
                    {"filename": k, "tokens": v[0]}
                    for k, v in key2pred.items()]}, f, indent=2)
        return key2pred

    def ensemble_evaluate(self, eval_config: str, *overrides) -> Dict:
        """Ensemble predict + caption metrics (ensemble.py:347-392)."""
        eval_cfg = load_config(eval_config, parse_overrides(overrides))
        key2pred = self.ensemble_predict(eval_config, *overrides)
        key2refs = load_caption_json(eval_cfg["data"]["test"]["caption"],
                                     zh=eval_cfg.get("zh", False))
        key2refs = {k: v for k, v in key2refs.items() if k in key2pred}
        result = evaluate_captions(key2pred, key2refs)
        out = Path(eval_cfg["output_path"]) / eval_cfg.get(
            "score_output", "scores.txt")
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w") as f:
            for k, v in result.items():
                if isinstance(v, float):
                    f.write(f"{k}: {v:.4f}\n")
        return result

    def dcase_predict(self, eval_config: str, *overrides) -> str:
        """DCASE submission csv: file_name,caption_predicted
        (ensemble.py:394-409)."""
        import csv
        eval_cfg = load_config(eval_config, parse_overrides(overrides))
        key2pred = self.ensemble_predict(eval_config, *overrides,
                                         dump_output=False)
        out = Path(eval_cfg["output_path"]) / eval_cfg.get(
            "dcase_output", "dcase_predictions.csv")
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["file_name",
                                              "caption_predicted"])
            w.writeheader()
            for key, pred in key2pred.items():
                w.writerow({"file_name": key, "caption_predicted": pred[0]})
        return str(out)

    def debug(self, config: str, *overrides):
        """One-batch forward+backward (run.py:363-378)."""
        cfg = load_config(config, parse_overrides(overrides))
        set_seed(cfg.get("seed", 1))
        tokenizer = build_tokenizer(
            cfg["data"]["train"]["collate_fn"]["tokenizer"])
        loader = build_dataloader(cfg["data"]["train"], tokenizer,
                                  train=True)
        model, _ = build_model_from_config(cfg["model"],
                                           vocab_size=len(tokenizer))
        variables = self._init_variables(model, cfg, cfg.get("seed", 1))
        sched = build_schedule(cfg.get("lr_scheduler", {}), 5e-4, 100, 20)
        tx = make_optimizer(5e-4, sched)
        state = create_train_state(variables, tx, jax.random.PRNGKey(0))
        step = make_train_step(model, build_loss(cfg.get("loss", {})), tx,
                               donate=False)
        batch = next(iter(loader))
        batch = {k: v for k, v in batch.items()
                 if k in ("wav", "wav_len", "cap", "cap_len")}
        batch["cap"] = np.asarray(batch["cap"], np.int32)
        state, metrics = step(state, batch, jnp.float32(1.0))
        print(f"debug: loss={float(metrics['loss']):.4f} "
              f"grad_norm={float(metrics['grad_norm']):.4f}")
        return float(metrics["loss"])


def _pad_to_devices(batch: Dict, n: int) -> Dict:
    """Pad the batch so its size divides the device count by REPEATING
    leading rows — the same semantics as DistributedSampler's wraparound
    padding (real samples double-counted, no garbage rows in the loss)."""
    B = len(batch["wav"])
    rem = (-B) % n
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        reps = v[np.arange(rem) % B]
        out[k] = np.concatenate([v, reps], axis=0)
    return out


class _WandbWriter:
    """add_scalar-compatible shim over wandb (run.py:232-239)."""

    def __init__(self, run):
        self.run = run

    def add_scalar(self, tag: str, value, step: int):
        self.run.log({tag: value}, step=step)


def _make_tb_writer(exp_dir: Path, cfg: Optional[Dict] = None):
    """Config-switched logging (run.py:232-239): a ``wandb`` config
    block selects wandb when the package is importable; TensorBoard
    otherwise."""
    wandb_cfg = (cfg or {}).get("wandb")
    if wandb_cfg:
        try:
            import wandb
            run = wandb.init(
                project=wandb_cfg.get("project", "audiocaption_tpu"),
                name=wandb_cfg.get("name"), dir=str(exp_dir),
                config=cfg, mode=wandb_cfg.get("mode", "offline"))
            return _WandbWriter(run)
        except Exception as e:
            print(f"wandb unavailable ({type(e).__name__}); "
                  f"falling back to TensorBoard", flush=True)
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(str(exp_dir / "tb"))
    except ImportError:
        return None


def _make_logger(path: Path):
    def log(msg: str):
        line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
        print(line, flush=True)
        with open(path, "a") as f:
            f.write(line + "\n")
    return log


def main(argv=None):
    parser = argparse.ArgumentParser(prog="audiocaption_tpu.cli.run")
    sub = parser.add_subparsers(dest="command", required=True)
    for name in ("train", "train_kd", "train_aug", "train_sed", "debug"):
        p = sub.add_parser(name)
        p.add_argument("--config", required=True)
        p.add_argument("overrides", nargs="*")
    for name in ("evaluate", "predict"):
        p = sub.add_parser(name)
        p.add_argument("--experiment_path", required=True)
        p.add_argument("--eval_config", required=True)
        p.add_argument("overrides", nargs="*")
    for name in ("predict_temporal", "evaluate_temporal"):
        p = sub.add_parser(name)
        p.add_argument("--experiment_path", required=True)
        p.add_argument("--sed_experiment_path", required=True)
        p.add_argument("--eval_config", required=True)
        p.add_argument("overrides", nargs="*")
    for name in ("ensemble_predict", "ensemble_evaluate", "dcase_predict"):
        p = sub.add_parser(name)
        p.add_argument("--eval_config", required=True)
        p.add_argument("overrides", nargs="*")
    p = sub.add_parser("export_hf")
    p.add_argument("--experiment_path", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--resume", default="swa.pth")

    args = parser.parse_args(argv)
    runner = Runner()
    if args.command == "train":
        runner.train(args.config, *args.overrides)
    elif args.command == "train_kd":
        runner.train_kd(args.config, *args.overrides)
    elif args.command == "train_aug":
        runner.train_aug(args.config, *args.overrides)
    elif args.command == "train_sed":
        runner.train_sed(args.config, *args.overrides)
    elif args.command == "debug":
        runner.debug(args.config, *args.overrides)
    elif args.command == "predict_temporal":
        runner.predict_temporal(args.experiment_path,
                                args.sed_experiment_path,
                                args.eval_config, *args.overrides)
    elif args.command == "evaluate_temporal":
        print(runner.evaluate_temporal(args.experiment_path,
                                       args.sed_experiment_path,
                                       args.eval_config, *args.overrides))
    elif args.command == "evaluate":
        print(runner.evaluate(args.experiment_path, args.eval_config,
                              *args.overrides))
    elif args.command == "predict":
        runner.predict(args.experiment_path, args.eval_config,
                       *args.overrides)
    elif args.command == "ensemble_predict":
        runner.ensemble_predict(args.eval_config, *args.overrides)
    elif args.command == "ensemble_evaluate":
        print(runner.ensemble_evaluate(args.eval_config, *args.overrides))
    elif args.command == "dcase_predict":
        runner.dcase_predict(args.eval_config, *args.overrides)
    elif args.command == "export_hf":
        runner.export_hf(args.experiment_path, args.output,
                         resume=args.resume)


if __name__ == "__main__":
    main()
