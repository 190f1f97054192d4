"""scalable_ccd_tpu — TPU-native continuous collision detection.

A from-scratch JAX/XLA re-design of the capabilities of
Continuous-Collision-Detection/Scalable-CCD (C++/CUDA): conservative
earliest-time-of-impact queries over a linearly moving triangle mesh, split
into a sorted-sweep broad phase and a tight-inclusion narrow phase
(reference entry points ``src/scalable_ccd/cuda/ccd.cuh:26-38`` and
``cuda/ipc_ccd_strategy.hpp:17-24``).

Public API::

    from scalable_ccd_tpu import ccd, ipc_ccd_strategy      # chunked pipeline
    from scalable_ccd_tpu import fused_ccd                   # one-dispatch fast path
    from scalable_ccd_tpu.parallel import sharded_ccd        # multi-chip
"""

from __future__ import annotations

import os


def _enable_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache by default.

    The TPU compile service this package targets has highly variable
    latency (the same small program has been observed to take 0.7 s or
    300+ s to compile); the on-disk cache makes every graph compile once
    per machine.  Opt out with ``SCCD_NO_COMPILE_CACHE=1``; relocate with
    ``SCCD_COMPILE_CACHE_DIR``.
    """
    if os.environ.get("SCCD_NO_COMPILE_CACHE"):
        return
    try:
        import hashlib
        import platform

        import jax

        # The cache stores XLA:CPU executables AOT-compiled for THIS host's
        # CPU features; loading one on a host with different features has
        # segfaulted (the loader itself warns about SIGILL).  Keying the
        # directory by a host fingerprint makes a moved checkout recompile
        # instead of loading foreign binaries.  /proc/cpuinfo flags alone
        # proved insufficient (a same-flags container migration still
        # loaded an entry whose LLVM target features mismatched the host),
        # so the machine identity is part of the key: a new container gets
        # a fresh cache.
        parts = [platform.machine()]
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        parts.append(line.strip())
                        break
        except OSError:
            parts.append(platform.processor())
        for mid in ("/etc/machine-id", "/proc/sys/kernel/random/boot_id"):
            try:
                with open(mid) as f:
                    parts.append(f.read().strip())
                break
            except OSError:
                continue
        tag = hashlib.sha1(" ".join(parts).encode()).hexdigest()[:10]

        cache_root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        cache_dir = os.environ.get("SCCD_COMPILE_CACHE_DIR") or os.path.join(
            cache_root, f"host-{tag}"
        )
        os.makedirs(cache_dir, exist_ok=True)
        # prune cache dirs for other hosts, but only ones idle > 24 h:
        # a checkout genuinely shared between live hosts keeps both
        # caches (and no racing writer gets its directory deleted), while
        # dead containers' dirs stop accumulating
        try:
            import shutil
            import time

            cutoff = time.time() - 24 * 3600
            for d in os.listdir(cache_root):
                p = os.path.join(cache_root, d)
                if (
                    d.startswith("host-")
                    and p != cache_dir
                    and os.path.getmtime(p) < cutoff
                ):
                    shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from scalable_ccd_tpu.config import CCDConfig, MemoryConfig, DEFAULT_CONFIG  # noqa: E402
from scalable_ccd_tpu.pipeline.ccd import CCDStats, ccd, ipc_ccd_strategy  # noqa: E402
from scalable_ccd_tpu.pipeline.fused import FusedCCDResult, fused_ccd  # noqa: E402

__all__ = [
    "CCDConfig",
    "MemoryConfig",
    "DEFAULT_CONFIG",
    "CCDStats",
    "ccd",
    "ipc_ccd_strategy",
    "FusedCCDResult",
    "fused_ccd",
]

__version__ = "0.1.0"
