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
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from audiocaption_tpu.data import (
    CaptionDataset, DictTokenizer, HuggingfaceTokenizer, InferenceDataset,
    TextCollate, VarLenPadCollate, load_caption_json)
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
    MetricImprover, load_checkpoint, merge_variables, save_checkpoint)
from audiocaption_tpu.training.trainer import make_optimizer
from audiocaption_tpu.utils.config import (
    build_model_from_config, load_config, load_pretrained_into,
    parse_overrides)


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
    args.pop("transforms", None)   # transform registry hooked separately
    if t == "CaptionDataset":
        return CaptionDataset(**args)
    if t == "InferenceDataset":
        return InferenceDataset(**args)
    raise ValueError(t)


def build_collate(cfg: Dict, tokenizer=None, wav_bucket: int = 16000):
    t = _short(cfg["type"])
    args = dict(cfg.get("args", {}) or {})
    buckets = {"wav": wav_bucket}
    if t == "TextCollate":
        return TextCollate(tokenizer, text_key=args.get("text_key", "cap"),
                           pad_keys=args.get("pad_keys", []),
                           sort_key=args.get("sort_key"), buckets=buckets)
    if t == "VarLenPadCollate":
        return VarLenPadCollate(pad_keys=args.get("pad_keys", []),
                                sort_key=args.get("sort_key"),
                                buckets=buckets)
    raise ValueError(t)


def build_dataloader(data_cfg: Dict, tokenizer=None, train: bool = True):
    from torch.utils.data import DataLoader
    dataset = build_dataset(data_cfg["dataset"])
    collate = build_collate(data_cfg["collate_fn"], tokenizer)
    dl_args = dict(data_cfg.get("dataloader_args", {}) or {})
    dl_args.setdefault("batch_size", 32)
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
            cfg["model"], vocab_size=len(tokenizer))
        with jax.default_device(jax.devices("cpu")[0]):
            variables = self._init_variables(model, cfg, seed)
        for spec in pretrained:
            variables = load_pretrained_into(variables, spec)
        # host numpy (uncommitted) so the train step places them freely
        variables = jax.device_get(variables)

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
        if mesh is not None:
            state = replicate(state, mesh)
        train_step = make_train_step(
            model, loss_fn, tx, mesh=mesh,
            specaug=cfg.get("specaug", False), donate=True)

        # scheduled sampling (run.py:55-65)
        ss_cfg = cfg.get("scheduled_sampling", {"use": False})
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
        monitor = MetricImprover(
            trainer_cfg.get("monitor_metric", {}).get("mode", "max"))
        not_improve = 0
        early_stop = trainer_cfg.get("early_stop", 10)
        log = _make_logger(exp_dir / "train.log")
        tb = _make_tb_writer(exp_dir)

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

        for epoch in range(start_epoch, epochs + 1):
            t0 = time.time()
            losses = []
            for batch in train_loader:
                if ss_cfg.get("use"):
                    if ss_per_iter is None:
                        ss_ratio *= 0.01 ** (1.0 / total_iters)
                    else:
                        ss_ratio -= ss_per_iter
                batch = {k: v for k, v in batch.items()
                         if k in ("wav", "wav_len", "cap", "cap_len")}
                batch["cap"] = np.asarray(batch["cap"], np.int32)
                if mesh is not None:
                    batch = shard_batch(_pad_to_devices(batch,
                                                        len(devices)), mesh)
                state, metrics = train_step(state, batch,
                                            jnp.float32(ss_ratio))
                losses.append(float(metrics["loss"]))
            train_loss = float(np.mean(losses))

            # validation CIDEr (run.py:150-155)
            variables = {"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)}
            score = self._val_score(model, variables, tokenizer,
                                    val_loader, val_key2refs)
            improved = monitor(score)
            not_improve = 0 if improved else not_improve + 1
            log(f"epoch {epoch}: loss {train_loss:.4f} "
                f"val_cider {score:.4f} ss {ss_ratio:.3f} "
                f"({time.time() - t0:.0f}s)")
            if tb is not None:
                tb.add_scalar("train/loss", train_loss, epoch)
                tb.add_scalar("train/ss_ratio", ss_ratio, epoch)
                tb.add_scalar("val/score", score, epoch)

            ckpt_kw = dict(
                epoch=epoch, monitor_state=monitor.state_dict(),
                not_improve_cnt=not_improve,
                tokenizer_state=tokenizer.state_dict(),
                lr_count=int(jax.device_get(state.step)))
            if improved:
                save_checkpoint(str(exp_dir / "best.pth"), variables,
                                **ckpt_kw)
            save_checkpoint(str(exp_dir / "last.pth"), variables, **ckpt_kw)

            if swa_cfg.get("use") and epoch >= swa_cfg.get("start", 21):
                if swa_state is None:
                    swa_state = swa_init(variables["params"],
                                         variables["batch_stats"])
                swa_state = swa_update(swa_state, variables["params"],
                                       variables["batch_stats"])

            if not_improve >= early_stop:
                log(f"early stop at epoch {epoch}")
                break

        final_vars = variables
        if swa_state is not None:
            final_vars = {"params": jax.device_get(swa_state[0]),
                          "batch_stats": jax.device_get(swa_state[1])}
        save_checkpoint(str(exp_dir / "swa.pth"), final_vars,
                        epoch=epochs, monitor_state=monitor.state_dict(),
                        tokenizer_state=tokenizer.state_dict())
        log(f"done; best val score {monitor.best:.4f}")
        return str(exp_dir)

    def _init_variables(self, model: Captioner, cfg: Dict, seed: int):
        sr = model.mel.sample_rate
        wav = jnp.zeros((1, sr))
        cap = jnp.ones((1, 4), jnp.int32)
        kwargs = {}
        if "Temporal" in type(model.decoder).__name__:
            kwargs["temporal_tag"] = jnp.zeros((1,), jnp.int32)
        return model.init(
            {"params": jax.random.PRNGKey(seed),
             "sample": jax.random.PRNGKey(seed + 1),
             "dropout": jax.random.PRNGKey(seed + 2)},
            wav, jnp.asarray([sr]), cap, jnp.asarray([4]), train=False,
            **kwargs)

    # ------------------------------------------------------ decode/eval --

    def _decode_loader(self, model, variables, tokenizer, loader,
                       **inference_args) -> Dict[str, List[str]]:
        decode_jit = {}

        def run(wav, wav_len):
            key = wav.shape
            if key not in decode_jit:
                decode_jit[key] = jax.jit(
                    lambda v, w, wl: generate(model, v, w, wl,
                                              **inference_args)["seq"])
            return decode_jit[key](variables, wav, wav_len)

        key2pred: Dict[str, List[str]] = {}
        for batch in loader:
            seq = run(jnp.asarray(batch["wav"]),
                      jnp.asarray(batch["wav_len"]))
            caps = tokenizer.decode(np.asarray(seq))
            for aid, cap in zip(batch["audio_id"], caps):
                key2pred.setdefault(aid, [cap])
        return key2pred

    def _val_score(self, model, variables, tokenizer, val_loader,
                   key2refs) -> float:
        key2pred = self._decode_loader(model, variables, tokenizer,
                                       val_loader, sample_method="greedy")
        key2refs = {k: v for k, v in key2refs.items() if k in key2pred}
        key2pred = {k: v for k, v in key2pred.items() if k in key2refs}
        from audiocaption_tpu.native import FastCiderD
        scorer = FastCiderD()
        score, _ = scorer.compute_score(ptb_tokenize(key2refs),
                                        ptb_tokenize(key2pred))
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
        model, _ = build_model_from_config(cfg["model"],
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
    """Pad the batch so its size divides the device count (the GSPMD
    equivalent of DistributedSampler's padding)."""
    B = len(batch["wav"])
    rem = (-B) % n
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        pad_width = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad_width)
    # padded rows get cap_len >= 1 to avoid 0-length masks
    if "cap_len" in out:
        out["cap_len"][B:] = np.maximum(out["cap_len"][B:], 2)
    return out


def _make_tb_writer(exp_dir: Path):
    """TensorBoard writer (run.py:232-239 config-switched logging);
    wandb is used instead when a 'wandb' config block asks for it and
    the package is importable."""
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
    p_train = sub.add_parser("train")
    p_train.add_argument("--config", required=True)
    p_train.add_argument("overrides", nargs="*")
    p_debug = sub.add_parser("debug")
    p_debug.add_argument("--config", required=True)
    p_debug.add_argument("overrides", nargs="*")
    for name in ("evaluate", "predict"):
        p = sub.add_parser(name)
        p.add_argument("--experiment_path", required=True)
        p.add_argument("--eval_config", required=True)
        p.add_argument("overrides", nargs="*")

    args = parser.parse_args(argv)
    runner = Runner()
    if args.command == "train":
        runner.train(args.config, *args.overrides)
    elif args.command == "debug":
        runner.debug(args.config, *args.overrides)
    elif args.command == "evaluate":
        print(runner.evaluate(args.experiment_path, args.eval_config,
                              *args.overrides))
    elif args.command == "predict":
        runner.predict(args.experiment_path, args.eval_config,
                       *args.overrides)


if __name__ == "__main__":
    main()
