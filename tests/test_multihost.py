"""Multi-host (multi-process) data parallelism: 2 subprocesses
rendezvous via jax.distributed.initialize on CPU, shard one global
batch through host_local_batch_to_global, and run the SAME jitted DP
train step — loss and raw grad norm must equal a single-process step
on the full batch (reference semantics: run_ddp.py:33-76 rendezvous +
DistributedSampler sharding + DDP all-reduce)."""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

TESTS = Path(__file__).resolve().parent
WORKER = TESTS / "_multihost_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_beam_decode_matches_single_process():
    """Multi-host DECODE: 2 processes shard a val batch through
    host_local_batch_to_global and run one jitted beam-3 decode over the
    global mesh with replicated output — both processes' token matrices
    must be identical to each other AND to a single-process decode of
    the full batch (the GSPMD equivalent of the reference's gather-to-
    rank-0 eval, run_ddp.py:201-209)."""
    import jax
    import jax.numpy as jnp

    from _multihost_worker import build_model, make_global_batch
    import _multihost_worker as w
    from audiocaption_tpu.models.captioner import generate

    # single-process reference decode on the full batch (no mesh)
    model = build_model()
    batch = make_global_batch()
    variables = w.init_variables(model, batch)
    ref = np.asarray(jax.jit(
        lambda wav, l: generate(model, variables, wav, l,
                                sample_method="beam", beam_size=3,
                                max_length=8)["seq"])(
        jnp.asarray(batch["wav"]), jnp.asarray(batch["wav_len"])))

    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = str(TESTS.parent) + os.pathsep + env.get(
        "PYTHONPATH", "")
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(rank), "2", str(port), "decode"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(TESTS.parent), env=env) for rank in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"

    toks = {}
    for out in outs:
        m = re.search(r"TOKENS rank=(\d+) shape=(\d+)x(\d+) ([\d ]+)", out)
        assert m, out[-3000:]
        arr = np.asarray([int(t) for t in m.group(4).split()]).reshape(
            int(m.group(2)), int(m.group(3)))
        toks[int(m.group(1))] = arr
    assert set(toks) == {0, 1}
    np.testing.assert_array_equal(toks[0], toks[1])
    np.testing.assert_array_equal(toks[0], ref)


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    import jax
    import jax.numpy as jnp

    from _multihost_worker import (build_model, make_global_batch,
                                   make_step_inputs)
    from audiocaption_tpu.training import make_train_step

    # ---- single-process reference on the full batch (no mesh) ----
    model = build_model()
    batch = make_global_batch()
    state, tx, loss_fn = make_step_inputs(model, batch)
    step = make_train_step(model, loss_fn, tx, donate=False)
    _, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                      jnp.float32(1.0))
    ref_loss = float(metrics["loss"])
    ref_gnorm = float(metrics["grad_norm"])

    # ---- 2-process run, each feeding half the batch ----
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = str(TESTS.parent) + os.pathsep + env.get(
        "PYTHONPATH", "")
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(rank), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(TESTS.parent), env=env) for rank in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT rank=(\d+) loss=([\d.eE+-]+) "
                      r"grad_norm=([\d.eE+-]+)", out)
        assert m, out[-3000:]
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    # both processes see the same replicated metrics
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    # and they equal the single-process full-batch step
    np.testing.assert_allclose(results[0][0], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(results[0][1], ref_gnorm, rtol=1e-4)
