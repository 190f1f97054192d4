"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the reference's CI similarly builds CUDA but
runs GPU tests off-CI — ``.github/workflows/continuous.yml:118``).  x64 is
enabled so float64 reference oracles are available.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax is pre-imported by the environment with a TPU plugin registered, so the
# platform must be forced through the config (env vars are read too early).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
