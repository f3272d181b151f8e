"""Test configuration: run everything on CPU with 8 virtual devices.

Tests must be deterministic and runnable without TPU hardware; the
multi-chip sharding tests use the virtual CPU mesh. These env vars must
be set before jax initializes its backends, hence module scope here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
# float32 matmuls on CPU for parity tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# The axon site hook re-exports JAX_PLATFORMS=axon; the config update wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
