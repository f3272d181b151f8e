"""Test configuration: run everything on CPU with 8 virtual devices.

Tests must be deterministic and runnable without TPU hardware; the
multi-chip sharding tests use the virtual CPU mesh. These env vars must
be set before jax initializes its backends, hence module scope here.
"""

import os
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
# float32 matmuls on CPU for parity tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
# Persistent compilation cache: the suite is XLA-compile dominated on
# this shared CPU (a tiny-model grad step costs >60 s to compile, <1 s
# to run), and the graphs are identical run to run.  Warm runs cut the
# heavy tests 3-4x.  The AOT loader logs a scary per-entry E-level
# "machine features mismatch" about prefer-no-scatter/gather pseudo-
# features; compile and execution host are the same machine here, so
# silence the spam.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".cache" / "jax"))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# The axon site hook re-exports JAX_PLATFORMS=axon; the config update wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# The JAX_COMPILATION_CACHE_DIR env var is NOT bound to the config on
# this jax version — without the explicit update the cache silently
# never engages (measured: zero cache writes over a full suite run) and
# every run pays full cold-compile cost.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
