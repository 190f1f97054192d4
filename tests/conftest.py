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
# No persistent compilation cache under pytest: the cache only helps across
# processes, CPU compiles here are cheap, and a cache entry truncated by a
# killed run (or compiled on another host) has segfaulted the XLA:CPU AOT
# loader mid-suite.  Must be set before the package import enables the cache.
os.environ.setdefault("SCCD_NO_COMPILE_CACHE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax is pre-imported by the environment with a TPU plugin registered, so the
# platform must be forced through the config (env vars are read too early).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402

#: Modules cheap enough for the quick iteration loop (`pytest -m fast`,
#: ~90 s total): no interpret-mode Pallas kernels, no 8-shard fused
#: pipelines.  The full suite (~30 min) stays the merge bar.
_FAST_MODULES = {
    "test_aabb",
    "test_auto_axis",
    "test_broad_phase",
    "test_golden_data",
    "test_host_native",
    "test_mesh_io",
    "test_ops",
    "test_pca",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    A full-suite process accumulates hundreds of XLA:CPU executables
    (including very large interpret-mode Pallas traces); past ~130 tests
    the next compile has segfaulted inside XLA:CPU
    (``backend_compile_and_load``) even with 100+ GB free — every file
    passes in isolation.  Per-module cache clearing keeps the process
    footprint bounded; cross-module recompiles cost a few minutes total.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()


def pytest_addoption(parser):
    """Mirror the reference test binary's custom CLI (``tests/main.cpp:37-71``):
    ``--log <level>`` (verbosity) and ``--nthreads <n>`` (host threads)."""
    parser.addoption("--log", action="store", default=None,
                     help="logging level name or number (e.g. DEBUG, 10)")
    parser.addoption("--nthreads", action="store", type=int, default=0,
                     help="native host sweep thread count (0 = hardware)")


def pytest_configure(config):
    level = config.getoption("--log")
    if level is not None:
        import logging

        from scalable_ccd_tpu.utils.logging import logger

        logger().setLevel(int(level) if level.isdigit() else level.upper())
        logging.basicConfig()
    nthreads = config.getoption("--nthreads")
    if nthreads:
        os.environ["SCCD_HOST_THREADS"] = str(nthreads)
