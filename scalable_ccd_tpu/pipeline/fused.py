"""Single-dispatch fused CCD step: the whole pipeline in one XLA program.

The reference interleaves host-driven chunks with device kernels and syncs
after every stage (``cuda/ccd.cu:55-76``; ``cudaDeviceSynchronize`` after each
launch).  On TPU the same pipeline fuses into ONE jitted program with static
work budgets: box build -> sort -> run-length count -> pair decode -> gather
-> batched root finding, for VF then EE, threading the running TOI through —
zero host round-trips.  This is the fast path for scenes whose candidate
counts fit the budgets; a budget overflow is reported as a scalar flag and
the caller falls back to the chunked :func:`scalable_ccd_tpu.pipeline.ccd`
(the same contract as the reference's overflow-and-retry protocol,
``memory_handler.cpp:55-79``, moved to a single boundary).

The same core runs under ``shard_map`` for multi-chip execution: every shard
takes a contiguous range of the major-axis pair-slot space (perfect static
load balance), solves its queries locally, and the only communication is one
``lax.pmin`` per phase for the running TOI — the TPU-native replacement for
the reference's ``atomicMin`` (``atomic_min_float.cuh``) and for the dead
multi-GPU peer-copy design (``_multigpu/broad_phase.cu:72-115``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from scalable_ccd_tpu.broad_phase.sweep import (
    count_major_runs,
    decode_pair_slots,
    merge_two_lists,
    sort_boxes,
)
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.narrow_phase import (
    find_roots,
    find_roots_bfs,
    gather_ee_queries,
    gather_vf_queries,
)

__all__ = ["FusedCCDResult", "fused_ccd", "fused_ccd_core"]


class FusedCCDResult(NamedTuple):
    #: () earliest TOI in [0, 1]; 1.0 = no contact (valid only if not overflowed)
    toi: jax.Array
    #: () bool — a pair budget was exceeded; fall back to the chunked pipeline
    overflowed: jax.Array
    #: () int32 — total VF major-axis pair slots (pre-filter)
    vf_total: jax.Array
    #: () int32 — total EE major-axis pair slots (pre-filter)
    ee_total: jax.Array


def _phase(
    sorted_boxes,
    is_vf: bool,
    budget: int,
    batch: int,
    v0,
    v1,
    edges,
    faces,
    toi_in,
    ms,
    tolerance,
    max_iterations: int,
    allow_zero_toi: bool,
    stack_capacity: int,
    dtype,
    axis_name: Optional[str],
    solver: str = "bfs",
):
    """One simplex pairing (VF two-list or EE one-list) at fixed budget.

    The budget's pair slots are consumed by a ``lax.scan`` over sub-batches
    of ``batch`` queries, carrying the running TOI — the device-side twin of
    the reference's sequential chunk loop (``ccd.cu:55-76``): later batches
    are pruned by earlier hits, and narrow-phase memory stays at
    O(batch * stack_capacity) regardless of budget.  Batches whose slots lie
    past the true pair total decode to an all-False mask and their root
    finder exits after one iteration.
    """
    n = sorted_boxes.n
    k = count_major_runs(sorted_boxes, jnp.int32(0), n)
    offsets = jnp.cumsum(k, dtype=jnp.int32)
    total = offsets[-1]

    if axis_name is None:
        base = jnp.int32(0)
        capacity = jnp.int32(budget)
    else:
        idx = jax.lax.axis_index(axis_name)
        base = (idx * budget).astype(jnp.int32)
        capacity = jnp.int32(budget * jax.lax.axis_size(axis_name))

    n_steps = max(1, -(-budget // batch))
    lane = jnp.arange(batch, dtype=jnp.int32)

    def body(toi, step):
        slots = base + step * batch + lane
        first, second, keep = decode_pair_slots(
            sorted_boxes, jnp.int32(0), offsets, slots, total, is_two_lists=is_vf
        )
        overlaps = jnp.stack([first, second], axis=1)
        if is_vf:
            q = gather_vf_queries(v0, v1, faces, overlaps, dtype=dtype)
        else:
            q = gather_ee_queries(v0, v1, edges, overlaps, dtype=dtype)
        if solver == "bfs":
            res = find_roots_bfs(
                q,
                keep,
                is_vf,
                toi_init=toi,
                ms=ms,
                tolerance=tolerance,
                max_iterations=max_iterations,
                allow_zero_toi=allow_zero_toi,
                frontier_capacity=4 * batch,
            )
        else:
            res = find_roots(
                q,
                keep,
                is_vf,
                toi_init=toi,
                ms=ms,
                tolerance=tolerance,
                max_iterations=max_iterations,
                allow_zero_toi=allow_zero_toi,
                stack_capacity=stack_capacity,
            )
        return jnp.minimum(toi, res.toi), None

    toi, _ = jax.lax.scan(body, toi_in, jnp.arange(n_steps, dtype=jnp.int32))
    if axis_name is not None:
        toi = jax.lax.pmin(toi, axis_name)
    return toi, total, total > capacity


def fused_ccd_core(
    vertices_t0,
    vertices_t1,
    edges,
    faces,
    vf_budget: int,
    ee_budget: int,
    min_distance=0.0,
    tolerance=1e-6,
    max_iterations: int = -1,
    allow_zero_toi: bool = True,
    dtype=jnp.float32,
    stack_capacity: int = 96,
    narrow_batch: int = 1 << 16,
    axis_name: Optional[str] = None,
    solver: str = "bfs",
) -> FusedCCDResult:
    """Trace-through core; see :func:`fused_ccd` for the jitted entry."""
    vb = build_vertex_boxes(
        vertices_t0, vertices_t1, inflation_radius=min_distance, dtype=dtype
    )
    eb = build_edge_boxes(vb, edges)
    fb = build_face_boxes(vb, faces)
    vf_sorted = sort_boxes(merge_two_lists(vb, fb))
    ee_sorted = sort_boxes(eb)

    common = dict(
        v0=vertices_t0,
        v1=vertices_t1,
        edges=edges,
        faces=faces,
        ms=min_distance,
        tolerance=tolerance,
        max_iterations=max_iterations,
        allow_zero_toi=allow_zero_toi,
        stack_capacity=stack_capacity,
        dtype=dtype,
        axis_name=axis_name,
        solver=solver,
    )
    batch = min(narrow_batch, max(vf_budget, ee_budget))
    toi0 = jnp.asarray(1.0, dtype)
    toi1, vf_total, vf_over = _phase(
        vf_sorted, True, vf_budget, batch, toi_in=toi0, **common
    )
    toi2, ee_total, ee_over = _phase(
        ee_sorted, False, ee_budget, batch, toi_in=toi1, **common
    )
    return FusedCCDResult(
        toi=toi2, overflowed=vf_over | ee_over, vf_total=vf_total, ee_total=ee_total
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "vf_budget",
        "ee_budget",
        "max_iterations",
        "allow_zero_toi",
        "dtype",
        "stack_capacity",
        "narrow_batch",
        "solver",
    ),
)
def fused_ccd(
    vertices_t0,
    vertices_t1,
    edges,
    faces,
    vf_budget: int = 1 << 16,
    ee_budget: int = 1 << 16,
    min_distance=0.0,
    tolerance=1e-6,
    max_iterations: int = -1,
    allow_zero_toi: bool = True,
    dtype=jnp.float32,
    stack_capacity: int = 96,
    narrow_batch: int = 1 << 16,
    solver: str = "bfs",
) -> FusedCCDResult:
    """Single-chip fused CCD: one dispatch for the whole two-frame query.

    API mirror of ``cuda::ccd`` (``ccd.cuh:26-38``) under static budgets.
    Check ``result.overflowed`` — if True, re-run with larger budgets or use
    the chunked :func:`scalable_ccd_tpu.pipeline.ccd`.
    """
    return fused_ccd_core(
        vertices_t0,
        vertices_t1,
        edges,
        faces,
        vf_budget=vf_budget,
        ee_budget=ee_budget,
        min_distance=min_distance,
        tolerance=tolerance,
        max_iterations=max_iterations,
        allow_zero_toi=allow_zero_toi,
        dtype=dtype,
        stack_capacity=stack_capacity,
        narrow_batch=narrow_batch,
        axis_name=None,
        solver=solver,
    )
