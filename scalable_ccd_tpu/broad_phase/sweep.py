"""Sorted sweep broad phase, TPU-native.

Replaces the reference's "Sweep and Tiniest Queue" CUDA kernel
(``src/scalable_ccd/cuda/broad_phase/sweep.cu:101-182`` with its per-warp
ring queue ``queue.cuh:14-27``) and the CPU TBB sort-and-sweep
(``src/scalable_ccd/broad_phase/sort_and_sweep.cpp``).  The CUDA design is
atomics-and-queues; this design is sort-scan-segment:

1.  Sort boxes by their *major-axis* lower bound (default x, matching the
    GPU path which hard-codes x — ``cuda/broad_phase/aabb.cu:86``).
2.  For each box i, its candidate partners are exactly the boxes
    j in (i, i + k_i] where ``k_i = searchsorted(min_major, max_major[i],
    'right') - i - 1`` — the *run length* along the sorted axis.  This single
    vectorized binary search replaces the queue kernel's dynamic
    pop/advance/re-push loop (``sweep.cu:139-181``): the sortedness makes the
    candidate set an index interval, so no queue is needed.
3.  The global pair index space (prefix sums of k_i) is enumerated in fixed
    size chunks; each chunk maps pair-slot p -> (i, j) with one more
    searchsorted, gathers the two mini-boxes, applies the filters, and
    compacts survivors to the front.  Data-dependent totals live on the host
    (int64 numpy), mirroring the reference's chunk cursor
    ``thread_start_box_id`` (``broad_phase.cuh:85``).

Filters (reference ``cuda/broad_phase/collision.cuh``):
- minor-axis overlap (``MiniBox::intersects``, aabb.cuh:100-104)
- simplex-pair validity: in two-list mode the ids must have opposite signs
  (``is_valid_pair``, collision.cuh:27-35)
- no shared vertex: nine integer compares (``share_a_vertex``,
  collision.cuh:17-21).

Emit convention (``sweep.cu:152-164``): one-list pairs are
(min, max) of element ids; two-list pairs are (flip(min), max) =
(list-A element id, list-B element id), where ``flip(id) = -id - 1``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scalable_ccd_tpu.geometry.aabb import AABBs
from scalable_ccd_tpu.ops import compact_rows, searchsorted_sorted
from scalable_ccd_tpu.utils.logging import logger

__all__ = [
    "SortedBoxes",
    "sort_boxes",
    "merge_two_lists",
    "count_major_runs",
    "enumerate_pairs_chunk",
    "sweep_chunks",
]


class SortedBoxes(NamedTuple):
    """Boxes sorted by major-axis lower bound, split SoA-style.

    The reference's ``DeviceAABBs`` (``cuda/broad_phase/aabb.cuh:122-150``)
    holds ``sorted_major_intervals`` + ``mini_boxes``; this is the same
    decomposition as plain arrays.
    """

    major_min: jax.Array  # (n,)
    major_max: jax.Array  # (n,)
    minor_min: jax.Array  # (n, 2)
    minor_max: jax.Array  # (n, 2)
    vertex_ids: jax.Array  # (n, 3) int32
    element_id: jax.Array  # (n,) int32

    @property
    def n(self) -> int:
        return self.major_min.shape[0]


_MINOR_AXES = {0: (1, 2), 1: (0, 2), 2: (0, 1)}

#: Default reorder implementation for :func:`sort_boxes` (f32 only):
#: "gather" = stable argsort + ONE stacked (n, 10) i32 row gather;
#: "sort" = ONE multi-operand stable ``lax.sort`` that carries the ten
#: payload columns through the sort itself (no gather at all).  Both are
#: bit-identical (stable, same key).  Hardware (round 4e,
#: ``tools/logs/hw_sort_probe.log``, 3.1M boxes): "sort" wins 72.6 ->
#: 59.2 ms plain and 80.4 -> 61.6 bucket_minor, so "auto" resolves to
#: it ON TPU (row gathers are latency-bound there; XLA:CPU gathers are
#: cheap and its multi-operand sort is not).  Read at trace time — pass
#: the ``reorder`` kwarg explicitly to override per call (the jit cache
#: keys on the kwarg, not on later mutations of this module var).
REORDER_IMPL = "auto"

#: Same switch for ``pack_boxes_ap``'s extent-class stable partition —
#: kept on the gather: its 1-bit key sorts measurably SLOWER than
#: argsort+gather at 3.1M rows (29.2 vs 31.3 ms, same probe).  Read at
#: TRACE time like REORDER_IMPL: mutating it after a pipeline has jitted
#: is ignored by the cache — pass ``pack_boxes_ap(..., reorder=...)``
#: to override per call.
PACK_REORDER_IMPL = "gather"


@functools.partial(
    jax.jit, static_argnames=("axis", "pad_to", "bucket_minor", "reorder")
)
def sort_boxes(
    boxes: AABBs, axis=0, pad_to: Optional[int] = None,
    bucket_minor: bool = False, reorder: Optional[str] = None,
) -> SortedBoxes:
    """Sort boxes along ``axis`` and split into major/minor arrays.

    Replaces the reference's ``split_boxes`` kernel + ``thrust::sort_by_key``
    (``cuda/broad_phase/aabb.cu:86-110``).  ``axis`` may be 0/1/2 or
    ``"auto"``, which picks the axis of largest box-center variance — the
    reference's next-axis heuristic (``sort_and_sweep.cpp:176-195``; the GPU
    path's ``calc_sort_dimension`` is dead code that hard-codes x,
    ``aabb.cu:86``).  The final pair set is axis-independent (all three
    axes are tested either way); the choice only affects candidate-slot
    counts and therefore sweep cost.

    ``bucket_minor`` is the **congestion ordering** for the all-pairs sweep
    kernel: the sort key becomes (quantized major_min, first minor lower
    bound) with a bucket of 4x the mean major extent, so the thousands of
    near-equal-major boxes of a congested scene (e.g. a fine cloth's
    sorted columns) order coherently along the minor axis — which makes
    the kernel's per-row minor-union skip effective.  The pair set is
    unchanged (the kernel's termination uses an exact suffix-min plane,
    and its filters use the true bounds), but this ordering is ONLY valid
    for the kernel sweeps: the XLA sweep's ``count_major_runs`` /
    ``searchsorted`` assume exactly-sorted ``major_min``.

    ``pad_to`` pads with sentinel boxes
    whose major interval is inverted (min at +big, max at -big): they sort
    to the end, their run length is genuinely 0 (max < every min, so
    ``count_major_runs`` finds no partners), and they are unreachable as
    partners of real boxes — jitted chunk shapes stay static across frames
    without enumerating a single pad pair.
    """
    if axis == "auto":
        centers = boxes.min + boxes.max  # x2, irrelevant for argmax
        var = jnp.var(centers, axis=0)  # (3,)
        perm = jnp.argsort(-var)
        pmin = jnp.take(boxes.min, perm, axis=1)
        pmax = jnp.take(boxes.max, perm, axis=1)
        major_min = pmin[:, 0]
        major_max = pmax[:, 0]
        minor_min = pmin[:, 1:]
        minor_max = pmax[:, 1:]
    else:
        m0, m1 = _MINOR_AXES[axis]
        major_min = boxes.min[:, axis]
        major_max = boxes.max[:, axis]
        minor_min = boxes.min[:, (m0, m1)]
        minor_max = boxes.max[:, (m0, m1)]
    vertex_ids = boxes.vertex_ids
    element_id = boxes.element_id

    if pad_to is not None and pad_to > major_min.shape[0]:
        n = major_min.shape[0]
        pad = pad_to - n
        big = jnp.finfo(major_min.dtype).max / 8
        major_min = jnp.concatenate([major_min, jnp.full((pad,), big, major_min.dtype)])
        major_max = jnp.concatenate([major_max, jnp.full((pad,), -big, major_max.dtype)])
        minor_min = jnp.concatenate([minor_min, jnp.full((pad, 2), big, minor_min.dtype)])
        minor_max = jnp.concatenate([minor_max, jnp.full((pad, 2), -big, minor_max.dtype)])
        vertex_ids = jnp.concatenate(
            [vertex_ids, jnp.full((pad, 3), jnp.int32(-(2**31) + 1), jnp.int32)]
        )
        element_id = jnp.concatenate([element_id, jnp.full((pad,), jnp.int32(0), jnp.int32)])

    if bucket_minor:
        # the secondary key and the kernel's row unions both use minor
        # axis 0 — swap the wider-spread minor into that slot, or a scene
        # whose first minor is the degenerate direction (e.g. a cloth's
        # drop axis, where every box overlaps) gets coherent-looking rows
        # whose unions never separate and the row skip never fires.  The
        # minor filters are symmetric in the two axes, so the swap cannot
        # change the pair set.
        mvar = jnp.var(minor_min + minor_max, axis=0)  # (2,) center spread
        swap = mvar[1] > mvar[0]
        minor_min = jnp.where(swap, minor_min[:, ::-1], minor_min)
        minor_max = jnp.where(swap, minor_max[:, ::-1], minor_max)
        extent = jnp.mean(jnp.maximum(major_max - major_min, 0.0))
        q = jnp.where(extent > 0, 4.0 * extent, jnp.asarray(1.0, major_min.dtype))
        bucket = jnp.floor(major_min / q)
        # ONE f32-key argsort instead of a 2-key lax.sort (measured 35 vs
        # 41 ms at 3M boxes; the rest of sort_boxes is the SoA reorder
        # gathers, PERF.md): consecutive buckets differ by >= 1.0 in the
        # composite key, and the minor fraction only needs to order
        # coherently WITHIN a bucket — f32 quantization of the fraction
        # merely blurs the secondary order (and near the f32 mantissa
        # limit can round across a bucket edge), which affects sweep cost,
        # never the pair set: the kernel's any-order planes are exact for
        # EVERY ordering.
        m0 = minor_min[:, 0]
        mlo = jnp.min(m0)
        mspan = jnp.maximum(jnp.max(m0) - mlo, 1e-30)
        frac = jnp.clip((m0 - mlo) / mspan, 0.0, 1.0 - 1e-7)
        bucket = bucket - jnp.min(bucket)  # small magnitudes keep f32 exact
        key = (bucket + frac).astype(jnp.float32)
    else:
        key = major_min
    if reorder is None:
        reorder = REORDER_IMPL
    if reorder == "auto":
        reorder = "sort" if jax.default_backend() == "tpu" else "gather"
    if reorder == "sort" and major_min.dtype == jnp.float32:
        # ONE multi-operand stable lax.sort: the ten payload columns ride
        # the sort's own data movement, replacing the argsort + stacked
        # row gather below (gathers are latency-bound at ~10 ns/ROW —
        # ~175 ms of the 210 ms sort_boxes total at 3M boxes, PERF.md).
        # Payloads ride in the **i32 domain** for the same bit-exactness
        # reason as the gather stack; the key stays f32 for ordering and
        # is DISCARDED (its payload twin is the kept copy).  Stability +
        # an identical key make this bit-identical to the gather path.
        b = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)  # noqa: E731
        ops = jax.lax.sort(
            (key.astype(jnp.float32),
             b(major_min), b(major_max),
             b(minor_min[:, 0]), b(minor_min[:, 1]),
             b(minor_max[:, 0]), b(minor_max[:, 1]),
             vertex_ids[:, 0], vertex_ids[:, 1], vertex_ids[:, 2],
             element_id),
            num_keys=1, is_stable=True,
        )
        f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)  # noqa: E731
        return SortedBoxes(
            major_min=f(ops[1]),
            major_max=f(ops[2]),
            minor_min=jnp.stack([f(ops[3]), f(ops[4])], axis=1),
            minor_max=jnp.stack([f(ops[5]), f(ops[6])], axis=1),
            vertex_ids=jnp.stack(ops[7:10], axis=1),
            element_id=ops[10],
        )
    order = jnp.argsort(key)
    # Apply the reorder as ONE stacked row gather (two in f64): gathers
    # cost ~10 ns/ROW regardless of row width (PERF.md), so six per-field
    # gathers pay 6x what one (n, 10) gather does — measured ~175 ms of
    # the 210 ms sort_boxes total at 3M boxes.  The stack rides in the
    # **i32 domain** (floats bitcast to i32, NOT ints to f32): integer
    # data movement is always bit-exact, whereas XLA:TPU may flush or
    # canonicalize f32 values whose bit patterns happen to be denormals /
    # NaNs — which is exactly what small ids and sentinel ids look like
    # when bitcast to f32 (hardware-observed corruption, round 4).
    f_cols = jnp.stack(
        [major_min, major_max,
         minor_min[:, 0], minor_min[:, 1],
         minor_max[:, 0], minor_max[:, 1]], axis=1,
    )  # (n, 6)
    i_cols = jnp.concatenate([vertex_ids, element_id[:, None]], axis=1)
    if f_cols.dtype == jnp.float32:
        stacked = jnp.concatenate(
            [jax.lax.bitcast_convert_type(f_cols, jnp.int32), i_cols],
            axis=1,
        )[order]
        f_g = jax.lax.bitcast_convert_type(stacked[:, :6], jnp.float32)
        i_g = stacked[:, 6:]
    else:
        f_g = f_cols[order]
        i_g = i_cols[order]
    return SortedBoxes(
        major_min=f_g[:, 0],
        major_max=f_g[:, 1],
        minor_min=f_g[:, 2:4],
        minor_max=f_g[:, 4:6],
        vertex_ids=i_g[:, :3],
        element_id=i_g[:, 3],
    )


def flip_id(ids: jax.Array) -> jax.Array:
    """Reversible negative tagging, ``flip_id(id) = -id - 1``
    (reference ``collision.cuh:11``)."""
    return -ids - 1


def merge_two_lists(boxes_a: AABBs, boxes_b: AABBs) -> AABBs:
    """Tag list A with negative element ids and concatenate with list B.

    The reference copies list A, flips its ids with a kernel, and merges the
    two already-sorted sequences with ``thrust::merge_by_key``
    (``cuda/broad_phase/broad_phase.cu:70-96``); concat-then-sort is the
    XLA-friendly equivalent (the sort in :func:`sort_boxes` does the merge).
    """
    return AABBs(
        min=jnp.concatenate([boxes_a.min, boxes_b.min]),
        max=jnp.concatenate([boxes_a.max, boxes_b.max]),
        vertex_ids=jnp.concatenate([boxes_a.vertex_ids, boxes_b.vertex_ids]),
        element_id=jnp.concatenate([flip_id(boxes_a.element_id), boxes_b.element_id]),
    )


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def count_major_runs(sorted_boxes: SortedBoxes, start: jax.Array, chunk_size: int) -> jax.Array:
    """Run length k_i for boxes [start, start + chunk_size).

    k_i = #(j > i with major_min[j] <= major_max[i]); the sweep kernel's
    "advance j while a.max >= b.min" loop (``sweep.cu:126-176``) collapsed
    into one vectorized binary search over the sorted lower bounds.
    """
    idx = start + jnp.arange(chunk_size, dtype=jnp.int32)
    idx_c = jnp.minimum(idx, sorted_boxes.n - 1)
    a_max = sorted_boxes.major_max[idx_c]
    reach = jnp.searchsorted(sorted_boxes.major_min, a_max, side="right", method="sort")
    k = reach.astype(jnp.int32) - idx_c.astype(jnp.int32) - 1
    return jnp.where(idx < sorted_boxes.n, jnp.maximum(k, 0), 0)


def _pair_filters(sorted_boxes: SortedBoxes, i, j, is_two_lists: bool):
    """Minor-axis overlap + validity + covertex filters for pair (i, j)."""
    a_min = sorted_boxes.minor_min[i]
    a_max = sorted_boxes.minor_max[i]
    b_min = sorted_boxes.minor_min[j]
    b_max = sorted_boxes.minor_max[j]
    minor_ok = jnp.all((a_min <= b_max) & (b_min <= a_max), axis=-1)

    a_vid = sorted_boxes.vertex_ids[i]  # (P, 3)
    b_vid = sorted_boxes.vertex_ids[j]
    share = jnp.any(a_vid[:, :, None] == b_vid[:, None, :], axis=(1, 2))

    a_eid = sorted_boxes.element_id[i]
    b_eid = sorted_boxes.element_id[j]
    if is_two_lists:
        valid = (a_eid >= 0) != (b_eid >= 0)
    else:
        valid = jnp.ones_like(minor_ok)
    return minor_ok & valid & ~share, a_eid, b_eid


def decode_pair_slots(
    sorted_boxes: SortedBoxes,
    box_start: jax.Array,
    offsets: jax.Array,
    slots: jax.Array,
    n_pairs: jax.Array,
    is_two_lists: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Map major-axis pair slots to filtered element-id pairs.

    ``offsets`` is the inclusive prefix sum of the run lengths k_i of the box
    chunk starting at ``box_start`` (int32, chunk-local).  Pair slot p maps to
    i = box_start + searchsorted(offsets, p, 'right') and
    j = i + 1 + (p - exclusive_offset(i)).

    ``slots`` must be ascending (every caller enumerates consecutive slots),
    which admits the merge-based :func:`searchsorted_sorted` — one sort
    instead of ``method='sort'``'s sort + unsorting scatter (scatters are
    ~40 ns/row on TPU).

    Returns ``(first, second, keep)``: element-id pairs in the reference's
    emit convention and the surviving-pair mask.
    """
    in_range = slots < n_pairs
    p_c = jnp.minimum(slots, jnp.maximum(n_pairs - 1, 0))

    local_i = searchsorted_sorted(offsets, p_c, side="right").astype(jnp.int32)
    excl = jnp.where(local_i > 0, offsets[jnp.maximum(local_i - 1, 0)], 0)
    i = box_start + local_i
    j = i + 1 + (p_c - excl)
    i = jnp.minimum(i, sorted_boxes.n - 1)
    j = jnp.minimum(j, sorted_boxes.n - 1)

    keep, a_eid, b_eid = _pair_filters(sorted_boxes, i, j, is_two_lists)
    keep = keep & in_range

    if is_two_lists:
        first = flip_id(jnp.minimum(a_eid, b_eid))
        second = jnp.maximum(a_eid, b_eid)
    else:
        first = jnp.minimum(a_eid, b_eid)
        second = jnp.maximum(a_eid, b_eid)
    return first, second, keep


class PaddedBoxes(NamedTuple):
    """Box arrays zero-padded past ``n`` so shifted reads never clamp.

    Built once per phase by :func:`pad_boxes_for_shifts`; padding rows have
    run length 0 and element/vertex ids that fail every filter.
    """

    minor_min: jax.Array  # (n + pad, 2)
    minor_max: jax.Array
    vertex_ids: jax.Array  # (n + pad, 3)
    element_id: jax.Array  # (n + pad,)
    n: int  # real box count


def pad_boxes_for_shifts(
    sorted_boxes: SortedBoxes, shift_cap: int, window: int, box_tile: int
) -> PaddedBoxes:
    """Zero-pad the partner-side arrays for :func:`shifted_pair_filters`."""
    pad = shift_cap + window + box_tile + 1

    def padded(a, fill):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
        )

    big = jnp.finfo(sorted_boxes.minor_min.dtype).max / 8
    return PaddedBoxes(
        minor_min=padded(sorted_boxes.minor_min, big),
        minor_max=padded(sorted_boxes.minor_max, -big),
        vertex_ids=padded(sorted_boxes.vertex_ids, jnp.int32(-(2**31) + 1)),
        element_id=padded(sorted_boxes.element_id, jnp.int32(0)),
        n=sorted_boxes.n,
    )


def shifted_pair_filters(
    boxes: PaddedBoxes,
    k_padded: jax.Array,
    box_start: jax.Array,
    box_tile: int,
    shift0: jax.Array,
    window: int,
    is_two_lists: bool,
    box_limit: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Filter pairs (i, i + s) for a box tile and a window of shifts.

    The gather-free sweep inner loop: for boxes
    ``i in [box_start, box_start + box_tile)`` and shifts
    ``s = shift0 + 1 + [0, window)``, the partner arrays are the box arrays
    displaced by ``s`` rows — realized as one dynamic slice per array plus
    ``window`` static sub-slices: pure contiguous reads and VPU compares,
    no gather and no binary search.  The major-axis overlap condition is
    ``s <= k_i`` (``k`` from :func:`count_major_runs`, zero-padded);
    remaining filters as in ``_pair_filters``.  ``boxes`` must be padded by
    :func:`pad_boxes_for_shifts` with the same ``window``/``box_tile`` and
    ``shift_cap >= shift0`` so no slice ever clamps.

    Returns ``(first, second, keep)`` of shape ``(window * box_tile,)``,
    shift-major, in the reference's emit convention (``sweep.cu:152-164``).

    Work per call is ``box_tile * window`` pair tests regardless of how
    many are live — profitable because each test is a handful of vector ops
    (the gather-based unit-decode path pays ~6 gathers per test).
    """
    W = window
    B = box_tile

    def a_side(arr):
        return jax.lax.dynamic_slice_in_dim(arr, box_start, B, axis=0)[None]

    def b_side(arr):
        blk = jax.lax.dynamic_slice_in_dim(
            arr, box_start + shift0 + 1, B + W - 1, axis=0
        )
        return jnp.stack(
            [jax.lax.slice_in_dim(blk, w, w + B, axis=0) for w in range(W)]
        )  # (W, B, ...)

    s_vals = shift0 + 1 + jnp.arange(W, dtype=jnp.int32)[:, None]  # (W, 1)
    valid = s_vals <= a_side(k_padded)[0][None, :]  # (W, B)
    if box_limit is not None:
        # a-side boxes past the caller's range (e.g. another shard's boxes)
        lane_idx = box_start + jnp.arange(B, dtype=jnp.int32)
        valid = valid & (lane_idx < box_limit)[None, :]

    a_min, a_max = a_side(boxes.minor_min), a_side(boxes.minor_max)
    b_min, b_max = b_side(boxes.minor_min), b_side(boxes.minor_max)
    minor_ok = jnp.all((a_min <= b_max) & (b_min <= a_max), axis=-1)

    a_vid = a_side(boxes.vertex_ids)  # (1, B, 3)
    b_vid = b_side(boxes.vertex_ids)  # (W, B, 3)
    share = jnp.any(a_vid[:, :, :, None] == b_vid[:, :, None, :], axis=(2, 3))

    a_eid = a_side(boxes.element_id)  # (1, B)
    b_eid = b_side(boxes.element_id)  # (W, B)
    if is_two_lists:
        pair_ok = (a_eid >= 0) != (b_eid >= 0)
    else:
        pair_ok = jnp.ones_like(minor_ok)

    keep = valid & minor_ok & pair_ok & ~share
    lo = jnp.minimum(a_eid, b_eid)
    hi = jnp.maximum(a_eid, b_eid)
    first = flip_id(lo) if is_two_lists else lo
    first = jnp.where(keep, jnp.broadcast_to(first, keep.shape), jnp.int32(-(2**31) + 1))
    second = jnp.where(keep, jnp.broadcast_to(hi, keep.shape), jnp.int32(-(2**31) + 1))
    return first.reshape(-1), second.reshape(-1), keep.reshape(-1)


def count_window_units(k: jax.Array, window: int) -> jax.Array:
    """Work units per box: ``ceil(k_i / window)``.

    A *unit* is one box paired against a window of ``window`` consecutive
    sweep partners — the enumeration granularity of
    :func:`decode_pair_units`.  Decomposing the pair-slot space into units
    shrinks the per-chunk binary-search domain by ``window`` x while the
    filter/compaction work stays proportional to true pair tests.
    """
    w = jnp.int32(window)
    return (k + w - 1) // w


def decode_pair_units(
    sorted_boxes: SortedBoxes,
    unit_offsets: jax.Array,
    units: jax.Array,
    n_units: jax.Array,
    k: jax.Array,
    window: int,
    is_two_lists: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Map ascending work-unit ids to filtered element-id pairs.

    ``unit_offsets`` is the inclusive prefix sum of
    :func:`count_window_units`; unit u maps to box
    ``i = searchsorted(unit_offsets, u, 'right')`` and window round
    ``r = u - excl(i)``, covering partners ``j = i + 1 + r*window + [0, window)``
    masked by ``r*window + w < k_i``.  Returns ``(first, second, keep)``
    flattened to ``len(units) * window`` rows, in the reference's emit
    convention (``sweep.cu:152-164``).
    """
    in_range = units < n_units
    u_c = jnp.minimum(units, jnp.maximum(n_units - 1, 0))
    i = searchsorted_sorted(unit_offsets, u_c, side="right").astype(jnp.int32)
    excl = jnp.where(i > 0, unit_offsets[jnp.maximum(i - 1, 0)], 0)
    r = u_c - excl
    w_lane = jnp.arange(window, dtype=jnp.int32)[None, :]
    i = jnp.minimum(i, sorted_boxes.n - 1)
    part = r[:, None] * window + w_lane  # partner rank within the run
    j = jnp.minimum(i[:, None] + 1 + part, sorted_boxes.n - 1)
    valid = in_range[:, None] & (part < k[i][:, None])

    i_flat = jnp.broadcast_to(i[:, None], j.shape).reshape(-1)
    j_flat = j.reshape(-1)
    keep, a_eid, b_eid = _pair_filters(sorted_boxes, i_flat, j_flat, is_two_lists)
    keep = keep & valid.reshape(-1)

    if is_two_lists:
        first = flip_id(jnp.minimum(a_eid, b_eid))
        second = jnp.maximum(a_eid, b_eid)
    else:
        first = jnp.minimum(a_eid, b_eid)
        second = jnp.maximum(a_eid, b_eid)
    return first, second, keep


@functools.partial(jax.jit, static_argnames=("pair_chunk_size", "is_two_lists"))
def enumerate_pairs_chunk(
    sorted_boxes: SortedBoxes,
    box_start: jax.Array,
    offsets: jax.Array,
    pair_start: jax.Array,
    n_pairs: jax.Array,
    pair_chunk_size: int,
    is_two_lists: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Materialize & filter one chunk of the major-axis pair index space.

    Returns ``(pairs, count)``: an int32 (P, 2) buffer whose first ``count``
    rows are the surviving element-id pairs in the reference's emit
    convention, the rest padded with -2**31+1.
    """
    slots = pair_start + jnp.arange(pair_chunk_size, dtype=jnp.int32)
    first, second, keep = decode_pair_slots(
        sorted_boxes, box_start, offsets, slots, n_pairs, is_two_lists
    )

    # Compact survivors to the front (sort-based; scatters are slow on TPU).
    sentinel = jnp.int32(-(2**31) + 1)
    count, pairs = compact_rows(
        keep,
        jnp.stack(
            [jnp.where(keep, first, sentinel), jnp.where(keep, second, sentinel)],
            axis=1,
        ),
    )
    return pairs, count


def sweep_chunks(
    sorted_boxes: SortedBoxes,
    is_two_lists: bool,
    box_chunk_size: int,
    pair_chunk_size: int,
    n_real_boxes: Optional[int] = None,
    box_start: int = 0,
    max_pairs_per_box_chunk: int = 1 << 30,
):
    """Host-driven generator over candidate-pair chunks.

    Yields ``(pairs_device, count_int)`` in bounded device memory, the
    analogue of ``BroadPhase::detect_overlaps_partial`` looped by
    ``is_complete()`` (``cuda/broad_phase/broad_phase.cu:121-252``).
    Totals are exact by construction, so no guess-and-retry is ever needed;
    the chunk-halving policy of ``handleBroadPhaseOverflow``
    (``memory_handler.cpp:55-79``) survives as the int32-safety valve: the
    run lengths are summed on the host in int64 and the *box* chunk is
    halved until its pair total fits ``max_pairs_per_box_chunk`` (clamped
    below int32 range), so the device-side int32 prefix sums can never wrap.
    A single box's run length is bounded by the box count (< 2^31), so
    halting at chunk size 1 is always safe.
    """
    n = sorted_boxes.n if n_real_boxes is None else n_real_boxes
    max_pairs = min(max_pairs_per_box_chunk, 2**31 - 1 - pair_chunk_size)
    while box_start < n:
        k = count_major_runs(sorted_boxes, jnp.int32(box_start), box_chunk_size)
        k_host = np.asarray(k, dtype=np.int64)
        chunk = box_chunk_size
        total = int(k_host.sum())
        while total > max_pairs and chunk > 1:
            chunk //= 2
            total = int(k_host[:chunk].sum())
        b = min(chunk, n - box_start)
        offsets = jnp.cumsum(k[:chunk], dtype=jnp.int32)
        logger().log(5, "broad chunk [%d, %d): %d major pairs", box_start, box_start + b, total)
        pair_start = 0
        while pair_start < total:
            pairs, count = enumerate_pairs_chunk(
                sorted_boxes,
                jnp.int32(box_start),
                offsets,
                jnp.int32(pair_start),
                jnp.int32(total),
                pair_chunk_size,
                is_two_lists,
            )
            yield pairs, int(count)
            pair_start += pair_chunk_size
        box_start += chunk


def detect_overlaps(
    sorted_boxes: SortedBoxes,
    is_two_lists: bool,
    box_chunk_size: int = 1 << 15,
    pair_chunk_size: int = 1 << 20,
    n_real_boxes: Optional[int] = None,
) -> np.ndarray:
    """Collect all candidate pairs to the host.

    Standalone broad-phase API, the analogue of
    ``BroadPhase::detect_overlaps()`` (``broad_phase.cu:226-252``) for callers
    that run their own narrow phase.
    """
    out = []
    for pairs, count in sweep_chunks(
        sorted_boxes, is_two_lists, box_chunk_size, pair_chunk_size, n_real_boxes
    ):
        if count:
            out.append(np.asarray(pairs[:count]))
    if not out:
        return np.zeros((0, 2), dtype=np.int32)
    return np.concatenate(out, axis=0)
