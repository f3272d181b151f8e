"""Worker for the multi-host (multi-process) data-parallel tests.

Run as:  python tests/_multihost_worker.py RANK NPROC PORT [MODE]

Each process owns 4 virtual CPU devices; jax.distributed.initialize
rendezvous via parallel.mesh.init_distributed (replaces the reference's
SLURM env parsing + torch file:// rendezvous, run_ddp.py:33-42).  Each
process feeds its own half of the global batch through
host_local_batch_to_global (replaces DistributedSampler sharding,
run_ddp.py:60-76).

MODE "train" (default) runs ONE jitted DP train step over the global
mesh and prints "RESULT loss=... grad_norm=..." for the parent test to
compare against a single-process step on the same global batch.

MODE "decode" runs a jitted batched beam-3 decode over the same global
mesh with REPLICATED output sharding, so every process holds the full
token matrix (the reference instead gathers predictions to rank 0 and
evaluates there, run_ddp.py:201-209 — replicated output is the GSPMD
equivalent of that gather); prints "TOKENS rank=R <flat ints>".
"""

import os
import sys
from functools import partial


def build_model():
    import flax.linen as nn
    import jax.numpy as jnp

    from audiocaption_tpu.decoding import SpecialTokens
    from audiocaption_tpu.models.captioner import Captioner
    from audiocaption_tpu.models.transformer_decoder import (
        TransformerDecoder)

    class ConvBnEncoder(nn.Module):
        """Tiny conv+BN encoder: BN batch statistics are computed on the
        GLOBAL sharded batch inside the jitted program, i.e. SyncBN by
        construction (run_ddp.py:103-104 semantics) — the multi-host
        loss must therefore match the single-process loss exactly."""
        dim: int = 16

        @nn.compact
        def __call__(self, lms, feat_len, train: bool = False):
            x = lms[..., None]
            x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            x = nn.BatchNorm(use_running_average=not train, axis_name=None)(x)
            x = nn.relu(x)
            B, T, F, C = x.shape
            x = x.reshape(B, T, F * C)
            attn = nn.Dense(self.dim)(x)
            return {"attn_emb": attn, "fc_emb": jnp.mean(attn, 1),
                    "attn_emb_len": feat_len // 4}

    from audiocaption_tpu.ops.frontend import CNN14_MEL_32K
    dec = TransformerDecoder(emb_dim=32, vocab_size=23, attn_emb_dim=16,
                             dropout=0.0, nlayers=1, nhead=2)
    return Captioner(encoder=ConvBnEncoder(), decoder=dec,
                     mel=CNN14_MEL_32K, special=SpecialTokens(max_length=8))


def make_global_batch():
    import numpy as np
    rng = np.random.RandomState(0)
    B, T, Lc, V = 8, 3200, 7, 23
    wav = rng.randn(B, T).astype(np.float32)
    wav_len = rng.randint(T // 2, T + 1, B).astype(np.int32)
    cap = rng.randint(4, V, (B, Lc)).astype(np.int32)
    cap[:, 0] = 1
    cap[:, -1] = 2
    cap_len = rng.randint(5, Lc + 1, B).astype(np.int32)
    return {"wav": wav, "wav_len": wav_len, "cap": cap,
            "cap_len": cap_len}


def init_variables(model, batch):
    import jax
    import jax.numpy as jnp
    return model.init(
        {"params": jax.random.PRNGKey(2), "sample": jax.random.PRNGKey(3),
         "dropout": jax.random.PRNGKey(4)},
        jnp.asarray(batch["wav"][:1]), jnp.asarray(batch["wav_len"][:1]),
        jnp.asarray(batch["cap"][:1]), jnp.asarray(batch["cap_len"][:1]),
        ss_ratio=1.0, train=False)


def make_step_inputs(model, batch):
    import jax
    from audiocaption_tpu.losses import masked_token_loss
    from audiocaption_tpu.optim import exponential_decay_with_warmup
    from audiocaption_tpu.training import create_train_state
    from audiocaption_tpu.training.trainer import make_optimizer

    variables = init_variables(model, batch)
    sched = exponential_decay_with_warmup(1e-3, 1e-5, 100, 10)
    tx = make_optimizer(1e-3, sched, weight_decay=1e-6, max_grad_norm=1.0)
    loss_fn = masked_token_loss("label_smoothing", 0.1)
    state = create_train_state(variables, tx, jax.random.PRNGKey(0))
    return state, tx, loss_fn


def run_decode(rank, mesh):
    """Beam-3 decode over the global mesh, batch sharded per process,
    output replicated so each process can print the full token matrix."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from audiocaption_tpu.models.captioner import generate
    from audiocaption_tpu.parallel.mesh import host_local_batch_to_global

    model = build_model()
    batch = make_global_batch()
    variables = init_variables(model, batch)
    spec = P()
    variables = multihost_utils.host_local_array_to_global_array(
        variables, mesh,
        jax.tree_util.tree_map(lambda _: spec, variables))

    B = batch["wav"].shape[0]
    nproc = jax.process_count()
    lo, hi = rank * B // nproc, (rank + 1) * B // nproc
    local = {"wav": batch["wav"][lo:hi], "wav_len": batch["wav_len"][lo:hi]}
    gbatch = host_local_batch_to_global(local, mesh)
    assert gbatch["wav"].shape[0] == B

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def decode(w, l):
        return generate(model, variables, w, l, sample_method="beam",
                        beam_size=3, max_length=8)["seq"]

    seq = np.asarray(decode(gbatch["wav"], gbatch["wav_len"]))
    flat = " ".join(str(int(t)) for t in seq.ravel())
    print(f"TOKENS rank={rank} shape={seq.shape[0]}x{seq.shape[1]} {flat}",
          flush=True)


def main():
    rank, nproc, port = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "train"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import re
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from audiocaption_tpu.parallel.mesh import (
        host_local_batch_to_global, init_distributed, make_mesh)
    init_distributed(f"localhost:{port}", nproc, rank)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc

    if mode == "decode":
        run_decode(rank, make_mesh())
        return

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from audiocaption_tpu.training import make_train_step

    model = build_model()
    batch = make_global_batch()
    state, tx, loss_fn = make_step_inputs(model, batch)

    mesh = make_mesh()  # 1-D mesh over ALL global devices
    spec = __import__("jax").sharding.PartitionSpec()
    state = multihost_utils.host_local_array_to_global_array(
        state, mesh, jax.tree_util.tree_map(lambda _: spec, state))

    # per-process shard: this process loads only its half of the batch
    B = batch["wav"].shape[0]
    lo, hi = rank * B // nproc, (rank + 1) * B // nproc
    local = {k: v[lo:hi] for k, v in batch.items()}
    gbatch = host_local_batch_to_global(local, mesh)
    assert gbatch["wav"].shape[0] == B  # global shape reassembled

    step = make_train_step(model, loss_fn, tx, mesh=mesh, donate=False)
    new_state, metrics = step(state, gbatch, jnp.float32(1.0))
    loss = float(metrics["loss"])
    gnorm = float(metrics["grad_norm"])
    print(f"RESULT rank={rank} loss={loss:.8f} grad_norm={gnorm:.8f}",
          flush=True)


if __name__ == "__main__":
    main()
