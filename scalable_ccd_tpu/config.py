"""Configuration for the TPU-native Scalable-CCD engine.

The reference library (Continuous-Collision-Detection/Scalable-CCD) has a
two-tier config system: compile-time CMake options baked into macros
(``src/scalable_ccd/config.hpp.in:11-14``: WITH_CUDA / USE_DOUBLE /
TOI_PER_QUERY / WITH_PROFILER) plus plain runtime function parameters
(``src/scalable_ccd/cuda/ccd.cuh:26-38``).  Here both tiers collapse into one
frozen dataclass whose fields are trace-time constants: changing a field
recompiles the affected jitted functions, exactly as the reference's macros
recompile the library, but without a build system.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

__all__ = ["CCDConfig", "MemoryConfig", "DEFAULT_CONFIG"]


@dataclasses.dataclass(frozen=True)
class MemoryConfig:
    """Static HBM budgeting.

    Replaces the reference's ``MemoryHandler`` (``cuda/memory_handler.hpp:7-39``),
    which sizes chunks dynamically from ``cudaMemGetInfo``.  On TPU everything
    under ``jit`` must have static shapes, so instead of live VRAM
    introspection we pick chunk sizes up front from the known HBM size and
    retrace-free *bucket* sizes; the dynamic grow/shrink dance of
    ``handleBroadPhaseOverflow`` / ``handleOverflow`` becomes host-driven
    box-chunk halving and query-bucket selection over this fixed menu.
    """

    #: Boxes swept per broad-phase chunk (the reference's MAX_OVERLAP_CUTOFF,
    #: ``cuda/memory_handler.hpp:9``). Halved on per-chunk pair-count overflow.
    box_chunk_size: int = 1 << 15

    #: Major-axis candidate pair slots enumerated per device dispatch
    #: (analogue of MAX_OVERLAP_SIZE, ``cuda/memory_handler.hpp:11``).
    pair_chunk_size: int = 1 << 20

    #: Narrow-phase query batch buckets (analogue of MAX_QUERIES,
    #: ``cuda/memory_handler.hpp:15``).  A batch of N queries is padded to the
    #: smallest bucket >= N so the number of distinct compiled shapes is
    #: bounded by len(query_buckets).
    query_buckets: Tuple[int, ...] = (1 << 12, 1 << 14, 1 << 16, 1 << 17)

    #: Per-chunk pair-count ceiling before the box chunk is halved
    #: (keeps int32 offsets safe and bounds the pair-chunk loop count).
    max_pairs_per_box_chunk: int = 1 << 30

    #: Optional memory cap in GB (the reference's ``memory_limit_GB`` knob,
    #: ``cuda/memory_handler.hpp:22``). 0 means "use the defaults above";
    #: a positive value scales the chunk sizes down proportionally.
    memory_limit_GB: float = 0.0

    def scaled(self) -> "MemoryConfig":
        """Apply ``memory_limit_GB`` by shrinking chunk sizes.

        The defaults are tuned for a ~16 GB HBM chip; a user cap of G GB
        scales the chunk sizes by G/16 (floored to powers of two).
        """
        if self.memory_limit_GB <= 0:
            return self
        frac = min(1.0, self.memory_limit_GB / 16.0)
        shift = 0
        while (1.0 / (1 << (shift + 1))) >= frac and shift < 8:
            shift += 1
        return dataclasses.replace(
            self,
            box_chunk_size=max(1024, self.box_chunk_size >> shift),
            pair_chunk_size=max(4096, self.pair_chunk_size >> shift),
            query_buckets=tuple(max(1024, q >> shift) for q in self.query_buckets),
        )


@dataclasses.dataclass(frozen=True)
class CCDConfig:
    """All knobs of the CCD pipeline as trace-time constants.

    Mirrors the parameters of ``scalable_ccd::cuda::ccd``
    (``cuda/ccd.cuh:26-38``) plus the reference's compile-time options.
    """

    #: Scalar dtype as a string ("float32" or "float64").  The reference's
    #: SCALABLE_CCD_USE_DOUBLE (``config.hpp.in:12``) defaults to double; on
    #: TPU f64 is software-emulated and slow, so the default here is f32 with
    #: f32-derived conservative error filters (see narrow_phase/tolerance.py).
    dtype: str = "float32"

    #: Narrow-phase inclusion-function precision: "f32" (plain working
    #: dtype) or "compensated" — double-word f32 (~48-bit mantissa,
    #: :mod:`scalable_ccd_tpu.ops.twofloat`) with the matching error
    #: filter.  The TPU-runnable answer to the reference's default
    #: ``Scalar=double`` build (``CMakeLists.txt:69``): scenes whose true
    #: separations sit below the plain f32 filter (which conservatively
    #: collapses their TOI toward 0) resolve to the f64-oracle value.
    #: Runs on the XLA solvers (``solver`` auto-resolves away from the
    #: Mosaic kernel, which computes in plain f32).
    precision: str = "f32"

    #: Co-domain tolerance for the narrow-phase root finder
    #: (``CCDConfig::co_domain_tolerance``, ``cuda/narrow_phase/ccd_config.cuh``).
    tolerance: float = 1e-6

    #: Maximum number of domain checks per query; -1 means unbounded
    #: (``CCDConfig::max_iter``).  NOTE: matching the reference kernel
    #: (``root_finder.cu:303``), exceeding max_iter *drops* remaining domains
    #: without a conservative accept.
    max_iterations: int = -1

    #: Allow reporting a time of impact of exactly zero
    #: (``CCDConfig::allow_zero_toi``).
    allow_zero_toi: bool = True

    #: If True, prune each query only against its own best TOI so that the
    #: returned per-query TOIs are individually exact — the reference's
    #: SCALABLE_CCD_TOI_PER_QUERY compile flag (``config.hpp.in:13``,
    #: ``root_finder.cu:297``).  If False (default, like the reference's
    #: default build) queries are additionally pruned against the global
    #: running TOI, which is much faster but leaves per-query TOIs
    #: valid only as lower-bound certificates.
    toi_per_query: bool = False

    #: TOI warm-start pre-batch (``fused_ccd_core`` docstring): before
    #: each broad chunk's sequential narrow batches, solve ONE batch of
    #: candidates sampled uniformly across the chunk, so the running TOI
    #: starts near its final value and later batches root-prune
    #: regardless of where contacts sit in sweep order.  Exact (pruning
    #: uses valid upper bounds); always off in collisions mode and for
    #: chunks under 4 batches.  ``"auto"`` (default) enables it below
    #: the congestion box-count threshold only — measured on hardware it
    #: wins ~30% at bench scale and is pure overhead on congested
    #: million-box scenes whose cold loop reaches the final TOI in its
    #: first batches (``fused._resolve_auto_presample`` docstring).
    presample: object = "auto"

    #: Chunked-pipeline broad phase: "auto" (the Mosaic all-pairs sweep
    #: kernel on TPU, "fast" elsewhere), "pallas" (force the kernel; the
    #: a-side tile range is the chunk cursor, with a one-shot exact-total
    #: budget retry per chunk), "fast" (gather-free shift-block sweep,
    #: falls back to "exact" per chunk on budget overflow) or "exact"
    #: (the slot-decode path with budget-free exact totals).  All produce
    #: the identical pair set (tests/test_sweep_decoders.py,
    #: tests/test_pipeline.py).
    broad_impl: str = "auto"

    #: Narrow-phase solver: "auto" (the Mosaic hardware kernel on TPU for
    #: the global fast path — measured 40x over the XLA queue on the
    #: host-driven pipeline — and "bfs" elsewhere and for exact modes),
    #: "pallas" (force the kernel, interpret mode off-TPU), "bfs" (XLA
    #: queue), or "dfs" (per-query bounded-stack, the exact-exploration-
    #: order oracle twin).  All satisfy the same conservative contract.
    solver: str = "auto"

    #: Staged-escalation round limit for the Pallas solver (global mode
    #: only; -2 = auto, -1 = off).  A solver block runs as long as its
    #: WORST lane's DFS; with a limit, every block stops after that many
    #: rounds and the straggler lanes are pooled into a compacted second
    #: unbounded pass that prunes against the first pass's TOI —
    #: bitwise-identical result absent overflow conservative-accepts.
    #: Auto escalates at 128 rounds on the Pallas global path (~2-4x the
    #: measured median lane depth; 99.2% of bench-scale lanes finish
    #: within it), which keeps the solver round-cap's stale-pending-min
    #: conservative accept unreachable by policy.  The second stage is
    #: count-proportional (``lax.cond`` skips it when no lane escalates;
    #: a four-block straggler pool covers thousands before the full
    #: sorted fallback): with it, the bounded two-pass *matches* the
    #: unbounded single pass on hardware (25.9 vs 26.2 ms on the bench
    #: solve, PERF.md round-4) — the guarantee is ~free; force ``-1``
    #: only where that last margin matters.  A strictly-ascending tuple
    #: (e.g. ``(32, 128)``) is a multi-stage ladder: each stage pools
    #: the previous stage's stragglers at the next limit, final stage
    #: unbounded — a lane-occupancy knob for congested scenes where
    #: per-block worst-lane idle time dominates (PERF.md candidate 2).
    escalate_rounds: int = -2

    #: DFS stack capacity per query in the narrow phase.  The reference uses
    #: a global ring buffer grown on overflow (``ccd_buffer.cuh:7-83``);
    #: our per-query stack instead *conservatively accepts* (reports the
    #: domain's t_min as a hit) if it ever fills — this can only make the
    #: reported TOI earlier, never later, preserving conservativeness.
    stack_capacity: int = 96

    #: Memory/chunking policy.
    memory: MemoryConfig = dataclasses.field(default_factory=MemoryConfig)

    # ------------------------------------------------------------------
    @property
    def np_dtype(self):
        import numpy as np

        return np.dtype(self.dtype)

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def eps(self) -> float:
        """Machine epsilon of the working dtype."""
        import numpy as np

        return float(np.finfo(self.np_dtype).eps)

    def replace(self, **kw) -> "CCDConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = CCDConfig()
