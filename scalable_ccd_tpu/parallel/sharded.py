"""Multi-chip CCD over a 1-D device mesh.

TPU-native replacement for the reference's experimental multi-GPU broad
phase (``src/scalable_ccd/cuda/broad_phase/_multigpu/`` — dead code that
range-shards the sorted box array across GPUs with full replication and
peer-to-peer copies, SURVEY.md §2.2).  Here:

- The mesh inputs (two vertex frames + connectivity) are small and
  replicated; every chip builds and sorts boxes identically (cheaper than
  communicating a distributed sort for any realistic mesh size).
- The sorted box range — and with it the sweep's pair-test work — is
  range-sharded: shard s of S sweeps boxes [s*ceil(n/S), (s+1)*ceil(n/S))
  against the replicated sorted array (partner reads naturally cross the
  boundary, the "halo" the reference's dead code also exploits,
  ``_multigpu/broad_phase.cu:72-115``).
- The narrow phase is load-balanced: the compacted candidate buffers are
  all-gathered (one ICI collective per phase) and each shard solves the
  s-th stripe of every source shard's survivors, so solve work is even to
  within S rows no matter where contacts concentrate — unlike the
  reference's per-device buffers (``_multigpu/broad_phase.cu:135-175``).
- The running TOI is ``pmin``'d across chips after every narrow batch,
  giving shards the same mid-search pruning visibility as the reference's
  ``atomicMin`` (``root_finder.cu:295,323``).

Works on any ``jax.sharding.Mesh``, including the CPU-backed virtual meshes
used in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from scalable_ccd_tpu.pipeline.fused import (
    FusedCCDResult,
    FusedCollisionsResult,
    fused_ccd_core,
)

try:  # jax >= 0.6
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

__all__ = ["make_sharded_ccd", "sharded_ccd", "default_mesh"]

AXIS = "ccd"


def _resolve_auto_solver(solver, max_iterations, dtype, interpret,
                         precision="f32"):
    """Resolve ``solver="auto"`` exactly like single-chip ``fused_ccd``:
    the Mosaic kernel only for f32 + unbounded iterations + real hardware;
    the XLA BFS solver otherwise.  Precision is a contract — an f64 or
    compensated request must never silently compute in plain f32
    (reference ``SCALABLE_CCD_USE_DOUBLE``, ``config.hpp.in:12``)."""
    if solver != "auto":
        return solver
    exact = max_iterations >= 0
    f32 = jnp.dtype(dtype) == jnp.float32
    comp = precision == "compensated"
    return "bfs" if (exact or not f32 or interpret or comp) else "pallas"


def default_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    import numpy as np

    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (AXIS,))


def make_sharded_ccd(
    mesh: Mesh,
    vf_budget_per_shard: int = 1 << 14,
    ee_budget_per_shard: int = 1 << 14,
    max_iterations: int = -1,
    allow_zero_toi: bool = True,
    dtype=jnp.float32,
    stack_capacity: int = 96,
    narrow_batch: int = 1 << 14,
    sweep_batch: int = 1 << 17,
    sweep_window: int = 32,
    shift_cap: int = 1 << 13,
    sweep_impl: str = "auto",
    solver: str = "auto",
    ipc_refine: bool = False,
    bucket_minor="auto",
    collect: bool = False,
    escalate_rounds: Optional[int] = None,
    presample="auto",
    narrow_order: str = "auto",
    precision: str = "f32",
    partition: str = "replicated",
    halo_boxes: int = 1 << 14,
):
    """Build a jitted multi-chip CCD step over ``mesh``.

    Returns ``fn(v0, v1, edges, faces, min_distance, tolerance) ->``
    :class:`FusedCCDResult` with all inputs/outputs replicated.

    ``collect=True`` returns :class:`FusedCollisionsResult` instead — the
    reference's ``TOI_PER_QUERY`` per-pair hit list
    (``narrow_phase.cu:197-202``), assembled on-device: each shard solves
    its load-balanced candidate stripe in exact per-query mode, compacts
    its hits, and one ``all_gather`` per phase builds the replicated
    global list (identical on every shard, no host in the loop).

    ``sweep_impl``/``solver`` default to the Mosaic hardware kernels on
    TPU (the same flagship path as single-chip :func:`fused_ccd`: the
    range-sharded all-pairs sweep + the in-VMEM DFS solver with per-batch
    ``pmin`` TOI exchange) and to the XLA twins elsewhere; pass
    ``"pallas_ap"``/``"pallas"`` explicitly to force the kernels (e.g.
    interpret-mode tests).  ``bucket_minor="auto"`` mirrors
    :func:`fused_ccd`: congestion ordering switches on at the same
    VF-box-count threshold on the kernel sweeps (the sort is replicated,
    so every shard sweeps the same order; the a-side range shard is
    ordering-agnostic).

    ``narrow_order`` defaults to sweep order: the sharded kernel paths
    already one-shot-decode their records before pooling, and the depth
    ordering's measured oracle bound is ~110 ms/frame at 2M triangles
    (``hw_depth_order.log``).  ``"key"`` (per-shard depth sort of the
    balanced stripe — local sort, collectively uniform loop bound) stays
    available and parity-tested; exact in every mode.

    ``partition`` selects the pod-scale memory mode: ``"replicated"``
    (every shard holds the whole sorted box array — the reference's dead
    multi-GPU layout, ``_multigpu/broad_phase.cu:113-115``) or ``"box"``
    — each shard's live box planes are its owned tile-aligned slice of
    the sorted order plus a right halo of ``halo_boxes`` covering every
    partner its boxes can reach (``fused._partition_slice``): O(n/S +
    halo) per chip, the BASELINE.json pod north star ("shard the sort
    axis across ICI").  An insufficient halo sets ``overflowed`` — the
    :func:`sharded_ccd` wrapper retries with a doubled halo; pairs are
    never dropped silently.  Requires the kernel sweeps.
    """
    if partition not in ("replicated", "box"):
        raise ValueError(
            f"unknown partition {partition!r}: 'replicated' or 'box'"
        )
    from scalable_ccd_tpu.pipeline.fused import (
        _AUTO_BUCKET_MIN_BOXES,
        _pallas_interpret,
    )

    if sweep_impl == "auto":
        # same hardware winner as single-chip fused_ccd (round-4d
        # measurements): 16-partner MXU bit-record emission + per-shard
        # one-shot decode; XLA twin off-TPU
        sweep_impl = "xla" if _pallas_interpret() else "pallas_mxu16"
    solver = _resolve_auto_solver(
        solver, max_iterations, dtype, _pallas_interpret(), precision)
    from scalable_ccd_tpu.pipeline.fused import _resolve_auto_escalation

    escalate_rounds = _resolve_auto_escalation(
        escalate_rounds, solver, max_iterations)

    def step(v0, v1, edges, faces, min_distance, tolerance):
        from scalable_ccd_tpu.pipeline.fused import _resolve_auto_presample

        n_vf_boxes = v0.shape[0] + faces.shape[0]
        bm = bucket_minor
        if bm == "auto":
            # shapes are static at trace time, so auto resolves here
            bm = bool(
                n_vf_boxes >= _AUTO_BUCKET_MIN_BOXES
                and sweep_impl != "xla"
            )
        # same measured policy as single-chip fused_ccd: the sharded
        # pooled loop's pre-batch samples the balanced buffer, but the
        # pay-off regime is identical; resolved per phase from that
        # phase's own box count (_resolve_auto_presample docstring)
        ps_vf = _resolve_auto_presample(presample, n_vf_boxes)
        ps_ee = _resolve_auto_presample(presample, edges.shape[0])
        ps = ps_vf if ps_vf == ps_ee else (ps_vf, ps_ee)
        no = narrow_order
        if no == "auto":
            # the sharded kernel paths already one-shot-decode their
            # records before pooling (the mechanism behind single-chip
            # "stream"), and depth ordering's oracle bound is ~110 ms at
            # grid-1000 with a poorly-tracking static key
            # (hw_depth_order) — so auto is plain sweep order here;
            # "key" stays available and parity-tested
            no = "sweep"
        return fused_ccd_core(
            v0,
            v1,
            edges,
            faces,
            vf_budget=vf_budget_per_shard,
            ee_budget=ee_budget_per_shard,
            min_distance=min_distance,
            tolerance=tolerance,
            max_iterations=max_iterations,
            allow_zero_toi=allow_zero_toi,
            dtype=dtype,
            stack_capacity=stack_capacity,
            narrow_batch=narrow_batch,
            sweep_batch=sweep_batch,
            sweep_window=sweep_window,
            shift_cap=shift_cap,
            sweep_impl=sweep_impl,
            solver=solver,
            ipc_refine=ipc_refine,
            bucket_minor=bm,
            collect=collect,
            escalate_rounds=escalate_rounds,
            presample=ps,
            narrow_order=no,
            precision=precision,
            box_partition=halo_boxes if partition == "box" else 0,
            axis_name=AXIS,
        )

    if collect:
        out_specs = FusedCollisionsResult(
            toi=P(), overflowed=P(), vf_total=P(), ee_total=P(),
            total_checks=P(), solver_capped=P(),
            vf_hits=P(), vf_hit_toi=P(), vf_hit_count=P(),
            ee_hits=P(), ee_hit_toi=P(), ee_hit_count=P(),
        )
    else:
        out_specs = FusedCCDResult(toi=P(), overflowed=P(), vf_total=P(),
                                   ee_total=P(), total_checks=P(),
                                   solver_capped=P())
    sharded = _shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_ccd(
    vertices_t0,
    vertices_t1,
    edges,
    faces,
    mesh: Optional[Mesh] = None,
    min_distance=0.0,
    tolerance=1e-6,
    validate: bool = True,
    collisions: Optional[list] = None,
    **kwargs,
) -> FusedCCDResult:
    """One-shot multi-chip CCD (convenience wrapper over
    :func:`make_sharded_ccd`).

    Pass a ``collisions`` list to also collect per-pair ``(id_a, id_b,
    toi)`` hits — the same ``TOI_PER_QUERY`` convention as single-chip
    :func:`scalable_ccd_tpu.pipeline.fused.fused_ccd`; the replicated
    global hit list is assembled on-device (see :func:`make_sharded_ccd`).
    """
    if validate:
        from scalable_ccd_tpu.geometry.mesh import validate_mesh_inputs

        validate_mesh_inputs(vertices_t0, vertices_t1, edges, faces)
    mesh = default_mesh() if mesh is None else mesh
    fn = make_sharded_ccd(mesh, collect=collisions is not None, **kwargs)
    dtype = kwargs.get("dtype", jnp.float32)
    args = (
        jnp.asarray(vertices_t0),
        jnp.asarray(vertices_t1),
        jnp.asarray(edges, jnp.int32),
        jnp.asarray(faces, jnp.int32),
        jnp.asarray(min_distance, dtype),
        jnp.asarray(tolerance, dtype),
    )
    res = fn(*args)
    if kwargs.get("partition") == "box":
        # halo retry: an insufficient halo (or pair budget) surfaces as
        # overflowed — grow the halo geometrically, like fused_ccd's
        # auto pair budgets (memory_handler.hpp:11's retry protocol)
        from scalable_ccd_tpu.ops.pallas_sweep_ap import _TILE

        halo = kwargs.get("halo_boxes", 1 << 14)
        for _ in range(3):
            if not bool(res.overflowed):
                break
            # grow from the tile-aligned EFFECTIVE halo (the slice helper
            # rounds up to whole tiles — quadrupling a sub-tile knob
            # would change nothing)
            halo = max(halo, _TILE) * 4
            fn = make_sharded_ccd(
                mesh, collect=collisions is not None,
                **{**kwargs, "halo_boxes": halo},
            )
            res = fn(*args)
    if collisions is None:
        return res

    import numpy as np

    for hits, tois, count in (
        (res.vf_hits, res.vf_hit_toi, res.vf_hit_count),
        (res.ee_hits, res.ee_hit_toi, res.ee_hit_count),
    ):
        n = int(count)
        if n:
            h = np.asarray(hits[:n])
            t = np.asarray(tois[:n])
            collisions.extend(
                (int(a), int(b), float(ti)) for (a, b), ti in zip(h, t)
            )
    return FusedCCDResult(
        toi=res.toi, overflowed=res.overflowed,
        vf_total=res.vf_total, ee_total=res.ee_total,
        total_checks=res.total_checks, solver_capped=res.solver_capped,
    )
