"""Training-step throughput benchmark (flagship EffB2+Trm).

Not part of the driver contract (that is bench.py); run manually:
    python bench_train.py

Measures the XE train step (forward+backward+Adam) with scheduled
sampling OFF (the teacher-forcing fast path) and ON, at several batch
sizes, 10 s 16 kHz clips, 20-token captions.
"""
import sys
import time

import os as _os
_os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax
import jax.numpy as jnp
import numpy as np

from pathlib import Path as _Path
jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                    str(_Path(__file__).resolve().parent / ".cache" / "jax")))

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.abspath(__file__)))


def main():
    from audiocaption_tpu.losses import masked_token_loss
    from audiocaption_tpu.models.zoo import effb2_trm
    from audiocaption_tpu.optim import exponential_decay_with_warmup
    from audiocaption_tpu.training import create_train_state, make_train_step
    from audiocaption_tpu.training.trainer import make_optimizer

    sr, vocab, Lc = 16000, 4981, 22
    model = effb2_trm(vocab_size=vocab, compute_dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, sr)), jnp.asarray([sr]),
            jnp.ones((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    variables = jax.device_get(variables)

    sched = exponential_decay_with_warmup(5e-4, 5e-7, 10000, 2000)
    tx = make_optimizer(5e-4, sched, weight_decay=1e-6, max_grad_norm=1.0)

    rng = np.random.RandomState(0)

    # train-step useful-work FLOPs per clip: XLA cost analysis of the
    # teacher-forcing fwd+bwd on the CPU backend at small B (scales
    # linearly in batch; no while loop in this program)
    flops_per_clip = None
    try:
        from audiocaption_tpu.utils.profiling import (
            device_peak_flops, flops_estimate)
        Bf = 8
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            vc = jax.device_put(variables, cpu)

            def fwd_bwd(w, l, c, n):
                def loss_of(params):
                    out = model.apply(
                        {"params": params,
                         "batch_stats": vc["batch_stats"]},
                        w, l, c, n, ss_ratio=1.0, train=True,
                        mutable=["batch_stats"],
                        rngs={"sample": jax.random.PRNGKey(0),
                              "dropout": jax.random.PRNGKey(1)})[0]
                    return masked_token_loss("label_smoothing", 0.1)(
                        dict(out, tgt=c[:, 1:], tgt_len=n - 1))
                return jax.grad(loss_of)(vc["params"])

            f = flops_estimate(
                fwd_bwd, jnp.zeros((Bf, 10 * sr), jnp.float32),
                jnp.full((Bf,), 10 * sr, jnp.int32),
                jnp.ones((Bf, Lc), jnp.int32),
                jnp.full((Bf,), Lc, jnp.int32))
        flops_per_clip = f["flops"] / Bf
        print(f"train fwd+bwd flops/clip (teacher forcing): "
              f"{flops_per_clip/1e9:.2f}G", flush=True)
    except Exception as e:
        print(f"flops estimate failed: {type(e).__name__}: {e}",
              flush=True)
    peak = None
    try:
        peak = device_peak_flops()
    except Exception:
        pass

    for use_ss in (False, True):
        step = make_train_step(model,
                               masked_token_loss("label_smoothing", 0.1),
                               tx, use_ss=use_ss, donate=True)
        for B in (64, 64, 128, 256):  # first config twice: the tunnel's first train program measures pathologically slow
            state = create_train_state(
                jax.device_put(variables, jax.devices()[0]), tx,
                jax.random.PRNGKey(0))
            wav = jnp.asarray(rng.randn(B, 10 * sr).astype(np.float32))
            wl = jnp.asarray(rng.randint(96000, 160000, B)
                             .astype(np.int32))
            cap = jnp.asarray(rng.randint(3, vocab, (B, Lc))
                              .astype(np.int32))
            cap = cap.at[:, 0].set(1)
            cl = jnp.asarray(rng.randint(5, Lc, B).astype(np.int32))
            batch = {"wav": wav, "wav_len": wl, "cap": cap, "cap_len": cl}
            ssr = jnp.float32(0.7 if use_ss else 1.0)
            try:
                for _ in range(3):
                    state, metrics = step(state, batch, ssr)
                jax.block_until_ready(metrics["loss"])
                n = 15
                t0 = time.perf_counter()
                for _ in range(n):
                    state, metrics = step(state, batch, ssr)
                _ = float(metrics["loss"])
            except Exception as e:
                print(f"train ss={'on' if use_ss else 'off'} B={B}: "
                      f"failed ({type(e).__name__}: {str(e)[:120]})",
                      flush=True)
                continue
            dt = (time.perf_counter() - t0) / n
            mfu_s = ""
            if flops_per_clip and peak:
                mfu = B * flops_per_clip / dt / peak
                mfu_s = (f" {B*flops_per_clip/dt/1e12:.2f} TFLOP/s"
                         f" mfu={mfu:.3f}")
            print(f"train ss={'on' if use_ss else 'off'} B={B}: "
                  f"{dt*1e3:.1f} ms/step, {B/dt:.1f} clips/s "
                  f"loss={float(metrics['loss']):.3f}{mfu_s}", flush=True)


if __name__ == "__main__":
    main()
