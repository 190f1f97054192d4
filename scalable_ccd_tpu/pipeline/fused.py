"""Single-dispatch fused CCD step: the whole pipeline in one XLA program.

The reference interleaves host-driven chunks with device kernels and syncs
after every stage (``cuda/ccd.cu:55-76``; ``cudaDeviceSynchronize`` after each
launch).  On TPU the same pipeline fuses into ONE jitted program with static
work budgets — zero host round-trips:

1. box build -> sort (VF two-list merge + EE one-list);
2. **sweep**: on TPU, the all-pairs subtile Mosaic kernel
   (:mod:`scalable_ccd_tpu.ops.pallas_sweep_ap`); elsewhere (or on
   request) the XLA shift-block enumeration in :func:`_sweep_compact` —
   boxes ``i`` vs partners ``i + s`` via contiguous slices and VPU
   compares (the filter tests of ``cuda/broad_phase/sweep.cu:139-181``),
   survivors sort-compacted into a dense buffer — the functional
   ``add_overlap`` atomic append (``collision.cuh:45-54``);
3. **narrow phase**: a ``while_loop`` over dense candidate batches, each
   solved by the Mosaic DFS kernel
   (:mod:`scalable_ccd_tpu.ops.pallas_solver`) on TPU or the XLA
   stack-queue solver elsewhere, threading the running TOI so later
   batches are pruned by earlier hits (the device-side twin of the chunk
   loop ``ccd.cu:55-76``).

Work is therefore proportional to the *true* candidate count, not to the
pre-filter slot space (which can be 10-100x larger on sorted-axis-congested
scenes).  Budget overflows (slot space or candidate buffer) are reported as
a scalar flag and the caller falls back to the chunked
:func:`scalable_ccd_tpu.pipeline.ccd` — the same contract as the reference's
overflow-and-retry protocol (``memory_handler.cpp:55-79``) moved to a single
boundary.

The same core runs under ``shard_map`` for multi-chip execution: every
shard sweeps a contiguous box range, the compacted candidate buffers are
pooled and re-striped across shards (one ICI ``all_gather`` per phase, so
narrow work stays balanced wherever contacts concentrate), and the running
TOI is ``pmin``'d after every narrow batch — the TPU-native replacement
for the reference's ``atomicMin`` (``atomic_min_float.cuh``) and an
upgrade over the dead multi-GPU peer-copy design
(``_multigpu/broad_phase.cu:72-115``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from scalable_ccd_tpu.broad_phase.sweep import (
    count_major_runs,
    merge_two_lists,
    pad_boxes_for_shifts,
    shifted_pair_filters,
    sort_boxes,
)
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.narrow_phase import (
    concat_frames,
    pack_edge_table,
    pack_face_table,
    find_roots,
    find_roots_bfs,
    gather_ee_queries,
    gather_vf_queries,
)
from scalable_ccd_tpu.narrow_phase.root_finder import compute_tolerance
from scalable_ccd_tpu.ops import compact_rows
from scalable_ccd_tpu.ops.pallas_solver import (
    SOLVER_BLOCK_SUB,
    pallas_find_roots,
    pallas_find_roots_bounded,
    pallas_solve_packed,
)
from scalable_ccd_tpu.ops.pallas_sweep_ap import (
    decode_pairs_ap,
    decode_records_range,
    pack_boxes_ap,
    pallas_sweep_pairs,
    pallas_sweep_records,
    records_pair_prefix,
    sample_first_pairs,
)


def _pallas_interpret() -> bool:
    """Interpret-mode Pallas off-TPU (CPU tests, forced-cpu dryruns)."""
    return jax.default_backend() != "tpu"


#: ``fused_ccd(bucket_minor="auto")`` enables the congestion ordering at
#: this many VF-phase boxes (vertices + faces); see the wrapper comment.
_AUTO_BUCKET_MIN_BOXES = 1 << 20

#: smallest budget ``fused_ccd``'s auto mode will pick (16k pair rows =
#: 128 KB — below this the buffer is noise and pow2 bucketing matters more)
_AUTO_BUDGET_MIN = 1 << 14

#: auto-budget initial guesses, as multiples of the phase's box/edge count
#: (measured pair densities: VF 0.23-1.2x boxes, EE 0.77-3.8x edges across
#: the bench and grid-1000 scenes — the guess avoids the retry dispatch in
#: the common case, the exact-total retry covers the rest)
_AUTO_VF_GUESS = 2
_AUTO_EE_GUESS = 4


def _pow2ceil(n: int) -> int:
    """Smallest power of two >= n (n >= 1)."""
    return 1 << (max(int(n), 1) - 1).bit_length()


#: sticky auto-budget resizes, keyed by (initial vf guess, initial ee
#: guess, sweep_impl): once a frame overflows the guess and retries with
#: grown budgets, later frames of the same scene-size class start there
_AUTO_BUDGET_MEMO: dict = {}

#: default staged-escalation round limit for the Pallas solver's global
#: mode — ~4-8x the measured median lane depth (hardware probes, round 4:
#: 99.2% of bench-scale lanes finish within 128 DFS rounds, 99.97%
#: within 256).  With the count-proportional second stage and the
#: multi-block straggler pool, bounding rounds is now *faster* than the
#: unbounded single pass (tools/hw_solver_block.py on v5e, 41k queries,
#: block_sub=16: 25.9 ms at rl=128 vs 26.2 unbounded — skipping the deep
#: tail in pass 1 and re-solving it densely pays for itself).  Keeps the
#: ``_MAX_ROUNDS`` stale-pending-min conservative accept unreachable by
#: policy: a skewed batch pools its stragglers into the exact second
#: pass instead of collapsing the TOI toward 0 (the reference re-runs
#: rather than degrades, ``narrow_phase.cu:146-195``).
_AUTO_ESCALATE_ROUNDS = 128


def _resolve_auto_escalation(escalate_rounds, solver: str,
                             max_iterations: int) -> int:
    """Resolve ``escalate_rounds`` auto (``None`` or the config sentinel
    ``-2``): staged escalation at ``_AUTO_ESCALATE_ROUNDS`` on the Pallas
    solver's exact global path, off elsewhere (``pallas_find_roots``
    ignores it in per-query / bounded-iteration modes anyway; the XLA
    solvers have no lane skew — their while loop retires each query
    independently)."""
    if escalate_rounds is not None and escalate_rounds != -2:
        return escalate_rounds
    if solver == "pallas" and max_iterations < 0:
        return _AUTO_ESCALATE_ROUNDS
    return -1


def _resolve_auto_presample(presample, n_vf_boxes: int) -> bool:
    """Resolve ``presample`` auto (``"auto"`` or ``None``): the TOI
    warm-start pre-batch pays below the congestion threshold and is pure
    overhead above it (hardware, round 4, ``tools/logs/hw_round4c.log``):
    bench scene 135.3 ms with vs 190.9 without (early cold batches
    explore deep before the TOI settles), grid-1000 7372 with vs 7248
    without — there the cold loop already reaches the final TOI in its
    first batches (``hw_narrow_residual.log``: warm-started and cold
    domain-check totals are IDENTICAL at 16.7M pairs), so the extra
    sampled batch buys nothing.  The crossover tracks scene congestion,
    so it reuses the ``bucket_minor`` box-count threshold.  Either
    setting is exact (pruning uses valid upper bounds); a wrong guess
    only costs a few percent of frame time.

    Callers resolve PER PHASE from that phase's own box count (VF:
    vertex+face boxes, EE: edge boxes) — for closed triangle meshes the
    two are nearly equal (Euler: e ≈ v + f), but open/wire-heavy meshes
    can sit on opposite sides of the crossover (VERDICT r4 weak #4)."""
    if presample is not None and presample != "auto":
        return bool(presample)
    return n_vf_boxes < _AUTO_BUCKET_MIN_BOXES


__all__ = [
    "FusedCCDResult",
    "FusedCollisionsResult",
    "detect_overlaps_fused",
    "fused_ccd",
    "fused_ccd_core",
    "sweep_chunks_fast",
]


def _partition_slice(sorted_boxes, axis_name, halo_boxes: int):
    """Box-partition mode: slice this shard's owned boxes + right halo out
    of the (replicated, **transient**) sorted arrays — the pod-scale memory
    story (BASELINE.json north star: "shard the sort axis across ICI"; the
    reference's dead multi-GPU code replicates everything,
    ``_multigpu/broad_phase.cu:113-115``).

    Shard ``s`` of ``S`` owns the tile-aligned sorted range
    ``[s*C, (s+1)*C)`` (``C = ceil_tiles(n/S) * _TILE``) and carries a
    static right halo of ``H`` boxes as the partner stream's reach: under
    the sweep invariant every partner of an owned box sits before the
    first position ``j`` with ``suffix_min(major_min)[j] >`` the owned
    boxes' max ``major_max`` — monotone for ANY ordering, so the halo test
    is exact for ``bucket_minor`` orderings too.  The full sorted arrays
    exist only transiently inside the dispatch; the *live* per-shard box
    planes handed to the sweep kernels are ``O(n/S + H)``.

    Returns ``(local_sorted_boxes, tiles_per, halo_ok, L)`` where
    ``local_*`` has exactly ``L = C + H`` rows (sentinel-padded past the
    scene; sentinels have inverted intervals and stream/match nothing) and
    ``halo_ok`` is False when a partner could lie beyond the halo — the
    caller must then flag overflow so the host retries with a larger halo
    (the same protocol as pair-budget overflow; pairs are never dropped
    silently)."""
    from scalable_ccd_tpu.broad_phase.sweep import SortedBoxes
    from scalable_ccd_tpu.ops.pallas_sweep_ap import _TILE

    S = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    n = sorted_boxes.n
    tiles_total = -(-n // _TILE)
    tiles_per = -(-tiles_total // S)
    C = tiles_per * _TILE
    H = max(-(-int(halo_boxes) // _TILE), 1) * _TILE
    L = C + H
    n_pad = S * C + H
    big = jnp.finfo(sorted_boxes.major_min.dtype).max / 8

    def pad(a, fill):
        extra = n_pad - n
        shape = (extra,) + a.shape[1:]
        return jnp.concatenate([a, jnp.full(shape, fill, a.dtype)])

    mm = pad(sorted_boxes.major_min, big)
    mx = pad(sorted_boxes.major_max, -big)
    mn2 = pad(sorted_boxes.minor_min, big)
    mx2 = pad(sorted_boxes.minor_max, -big)
    vid = pad(sorted_boxes.vertex_ids, jnp.int32(-(2**31) + 1))
    eid = pad(sorted_boxes.element_id, jnp.int32(0))

    start = me * C

    def sl(a):
        sizes = (L,) + a.shape[1:]
        idx = (start,) + (jnp.zeros_like(start),) * (a.ndim - 1)
        return jax.lax.dynamic_slice(a, idx, sizes)

    local = SortedBoxes(
        major_min=sl(mm), major_max=sl(mx), minor_min=sl(mn2),
        minor_max=sl(mx2), vertex_ids=sl(vid), element_id=sl(eid),
    )
    # halo sufficiency: exact via the global suffix-min of major_min
    # (padding is +big, so it cannot lower the suffix-min)
    fwd = jnp.flip(jax.lax.cummin(jnp.flip(mm)))
    owned_mx = local.major_max[:C]
    reach = jnp.max(jnp.where(local.major_min[:C] < big / 2, owned_mx, -big))
    j = jnp.minimum(start + L, n_pad - 1)
    halo_ok = (start + L >= n) | (fwd[j] > reach)
    return local, tiles_per, halo_ok, L


class FusedCCDResult(NamedTuple):
    #: () earliest TOI in [0, 1]; 1.0 = no contact (valid only if not overflowed)
    toi: jax.Array
    #: () bool — a budget was exceeded; fall back to the chunked pipeline
    overflowed: jax.Array
    #: () int32 — surviving VF candidate pairs (clamped to the pair budget)
    vf_total: jax.Array
    #: () int32 — surviving EE candidate pairs (clamped to the pair budget)
    ee_total: jax.Array
    #: () int32 — total narrow-phase domain evaluations (the reference's
    #: ``nbr_checks`` across the batch; psum'd across shards when sharded)
    total_checks: jax.Array
    #: () bool — the narrow phase took a conservative accept somewhere
    #: (solver stack depth, queue spill, or round cap).  The TOI is still
    #: conservative — possibly *earlier* than the true first contact —
    #: unlike ``overflowed``, which means candidate pairs may be MISSING
    #: and the result must be recomputed.  The reference instead re-runs
    #: the chunk after rebalancing (``narrow_phase.cu:146-195``); here the
    #: caller can choose to re-solve with a bigger solver or accept the
    #: earlier time.
    solver_capped: jax.Array


class FusedCollisionsResult(NamedTuple):
    """Fused result plus per-pair hits — the reference's
    ``SCALABLE_CCD_TOI_PER_QUERY`` output (``narrow_phase.cu:197-202``:
    ``thrust::copy_if(toi < 1)`` into a host collision list) from the
    single-dispatch pipeline.  Hit buffers are budget-sized with the valid
    prefix length in ``*_hit_count``.  Under ``shard_map`` the hit list is
    assembled on-device with one extra ``all_gather`` per phase and is
    replicated (identical on every shard); buffers are then
    ``n_shards * (budget + batch)`` rows."""

    toi: jax.Array
    overflowed: jax.Array
    vf_total: jax.Array
    ee_total: jax.Array
    total_checks: jax.Array
    solver_capped: jax.Array
    #: (vf_budget+, 2) int32 (vertex_id, face_id), hits compacted to front
    vf_hits: jax.Array
    #: (vf_budget+,) exact per-pair TOI for the compacted hits
    vf_hit_toi: jax.Array
    #: () int32 number of valid rows in vf_hits
    vf_hit_count: jax.Array
    ee_hits: jax.Array
    ee_hit_toi: jax.Array
    ee_hit_count: jax.Array


def _sweep_compact(
    sorted_boxes,
    is_vf: bool,
    k,
    pair_budget: int,
    sweep_batch: int,
    sweep_window: int,
    shift_cap: int,
    max_sweep_steps: int,
    axis_name: Optional[str],
    slack: int = 0,
    box_range=None,
):
    """Filter + compact the major-axis pair space into a dense pair buffer.

    The pair space is enumerated **gather-free** as (shift-block, box-tile)
    steps: each step tests boxes ``i`` of one tile against partners
    ``i + s`` for a window of ``sweep_window`` shifts via
    :func:`shifted_pair_filters` (contiguous slices + VPU compares — the
    gather-based decode costs ~10 ms per million pairs on v5e, the
    shift-block form well under 1 ms).  The step space is the exact
    per-tile work list ``sum_tiles(ceil(max_run_in_tile / W))`` (a scalar
    binary search maps step -> (tile, block)), so no loop iteration is
    spent on a (tile, block) with no live shifts.

    Returns ``(pairs, n_pairs, n_true, overflow)``: an int32 buffer whose
    first ``n_pairs`` rows are surviving element-id pairs, the unclamped
    survivor total ``n_true`` (exact when the overflow is budget-driven; a
    lower bound when runs exceeded ``shift_cap`` or the step cap was hit,
    since those pairs were never enumerated), and an overflow flag set in
    any of those three cases.
    """
    W = sweep_window
    B = max(1, sweep_batch // W)  # boxes per tile
    n = sorted_boxes.n

    if box_range is not None:
        # explicit sweep range: (traced start, static count) — the chunked
        # pipeline's cursor (``thread_start_box_id``, ``broad_phase.cuh:85``)
        shard_base = jnp.asarray(box_range[0], jnp.int32)
        n_my = int(box_range[1])
    elif axis_name is None:
        n_my = n
        shard_base = jnp.int32(0)
    else:
        n_shards_static = jax.lax.axis_size(axis_name)
        n_my = -(-n // n_shards_static)  # boxes per shard (static)
        shard_base = (jax.lax.axis_index(axis_name) * n_my).astype(jnp.int32)

    n_tiles = -(-n_my // B)  # static
    # with an explicit range the cursor can sit near n while the (static)
    # tile span still extends n_my+B rows past it — pad for the worst case
    pad_tile = B + (n_my if box_range is not None else 0)
    boxes = pad_boxes_for_shifts(sorted_boxes, shift_cap, W, pad_tile)
    k_padded = jnp.concatenate(
        [k, jnp.zeros((boxes.element_id.shape[0] - n,), k.dtype)]
    )
    # per-tile max run length -> per-tile shift-block count.  The step space
    # is the exact work list sum(ceil(tile_max_k / W)) — tiles with short
    # runs contribute few steps, so skew in run lengths costs only its own
    # tiles (the earlier design iterated the global max block count over
    # every tile and cond-skipped dead steps, paying loop-body overhead for
    # each; see PERF.md).
    k_tiles = jax.lax.dynamic_slice_in_dim(k_padded, shard_base, n_tiles * B)
    tile_max_k = jnp.max(k_tiles.reshape(n_tiles, B), axis=1)
    tile_max_k = jnp.minimum(tile_max_k, jnp.int32(shift_cap))
    blocks_per_tile = (tile_max_k + W - 1) // W
    block_prefix = jnp.cumsum(blocks_per_tile)  # (n_tiles,) inclusive
    total_steps = block_prefix[-1] if n_tiles > 0 else jnp.int32(0)
    # NOTE: a coarse (tile, block) liveness pass from windowed minor-bound
    # unions was tried here and removed: on dense contact scenes it prunes
    # <3% of steps (window unions are too loose) while its own loop costs
    # ~90 ms — see PERF.md.  Revisit at finer granularity if sparse scenes
    # dominate a workload.

    block_rows = B * W
    # slack: a full block is always written contiguously at the write
    # pointer (rows past the kept prefix are overwritten by later blocks);
    # also covers downstream dynamic slices so they never clamp.
    pairs0 = jnp.full(
        (pair_budget + max(block_rows, slack), 2), jnp.int32(-(2**31) + 1)
    )
    if n_tiles == 0:  # empty shard range: nothing to sweep
        return pairs0, jnp.int32(0), jnp.int32(0), jnp.zeros((), bool)

    def cond(st):
        step = st[0]
        return (step < total_steps) & (step < max_sweep_steps)

    def body(st):
        step, wp, nt, pairs, of = st
        # step -> (tile, block) through the exact work list: the tile is the
        # first prefix entry exceeding step (scalar binary search), the
        # block the remainder within that tile.
        tile = jnp.searchsorted(block_prefix, step, side="right").astype(jnp.int32)
        tile_c = jnp.minimum(tile, jnp.int32(max(n_tiles - 1, 0)))
        excl = jnp.where(tile_c > 0, block_prefix[jnp.maximum(tile_c - 1, 0)], 0)
        block = step - excl
        shift0 = block * W
        box_start = shard_base + tile_c * B

        first, second, keep = shifted_pair_filters(
            boxes, k_padded, box_start, B, shift0, W,
            is_two_lists=is_vf, box_limit=shard_base + n_my,
        )
        # Survivors are sparse (typically < 1% of slots; most steps have
        # none at all), while the sort that compacts them costs ~0.5 ms per
        # 128k-row block — so count first (a cheap reduction) and only run
        # the sort + append on steps that actually produced survivors.
        nkeep = jnp.sum(keep).astype(jnp.int32)

        def append(args):
            wp, pairs, of = args
            _, blk = compact_rows(keep, jnp.stack([first, second], axis=1))
            of = of | (wp + nkeep > pair_budget)
            wp_c = jnp.minimum(wp, jnp.int32(pair_budget))
            pairs = jax.lax.dynamic_update_slice_in_dim(pairs, blk, wp_c, axis=0)
            wp = jnp.minimum(wp + nkeep, jnp.int32(pair_budget))
            return wp, pairs, of

        wp, pairs, of = jax.lax.cond(
            nkeep > 0, append, lambda a: a, (wp, pairs, of)
        )
        return step + 1, wp, nt + nkeep, pairs, of

    step, n_pairs, n_true, pairs, of = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), pairs0,
         jnp.zeros((), bool)),
    )
    # runs longer than shift_cap or steps beyond the cap -> pairs missed
    of = of | (jnp.max(jax.lax.dynamic_slice_in_dim(
        k_padded, shard_base, n_tiles * B)) > shift_cap)
    of = of | (step < total_steps)
    return pairs, n_pairs, n_true, of


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_two_lists", "pair_budget", "sweep_batch", "sweep_window",
        "shift_cap", "max_sweep_steps",
    ),
)
def detect_overlaps_fused(
    sorted_boxes,
    is_two_lists: bool,
    pair_budget: int = 1 << 20,
    sweep_batch: int = 1 << 17,
    sweep_window: int = 32,
    shift_cap: int = 1 << 13,
    max_sweep_steps: int = 1 << 22,
):
    """Single-dispatch broad phase: all candidate pairs, device-resident.

    The fast-path analogue of ``BroadPhase::detect_overlaps()``
    (``cuda/broad_phase/broad_phase.cu:226-252``) for callers that run
    their own narrow phase: returns ``(pairs, count, overflow)`` where the
    first ``count`` rows of ``pairs`` are the surviving element-id pairs
    (reference emit convention); rows past ``count`` are garbage.  On
    ``overflow`` re-run with larger budgets or fall back to the chunked
    :func:`scalable_ccd_tpu.broad_phase.detect_overlaps`.
    """
    k = count_major_runs(sorted_boxes, jnp.int32(0), sorted_boxes.n)
    pairs, count, _, overflow = _sweep_compact(
        sorted_boxes, is_two_lists, k,
        pair_budget, sweep_batch, sweep_window, shift_cap, max_sweep_steps,
        axis_name=None,
    )
    return pairs, count, overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_two_lists", "box_chunk", "pair_budget", "sweep_batch",
        "sweep_window", "shift_cap", "max_sweep_steps",
    ),
)
def _sweep_chunk_fast(
    sorted_boxes, k, box_start,
    is_two_lists: bool, box_chunk: int, pair_budget: int,
    sweep_batch: int, sweep_window: int, shift_cap: int,
    max_sweep_steps: int,
):
    return _sweep_compact(
        sorted_boxes, is_two_lists, k,
        pair_budget, sweep_batch, sweep_window, shift_cap, max_sweep_steps,
        axis_name=None, box_range=(box_start, box_chunk),
    )


def sweep_chunks_fast(
    sorted_boxes,
    is_two_lists: bool,
    box_chunk_size: int = 1 << 15,
    pair_budget: int = 1 << 20,
    sweep_batch: int = 1 << 17,
    sweep_window: int = 32,
    shift_cap: int = 1 << 13,
    max_sweep_steps: int = 1 << 22,
    n_real_boxes: Optional[int] = None,
):
    """Host-driven generator over candidate-pair chunks, fast sweep.

    Drop-in for :func:`scalable_ccd_tpu.broad_phase.sweep.sweep_chunks`
    (the analogue of ``BroadPhase::detect_overlaps_partial`` looped by
    ``is_complete()``, ``cuda/broad_phase/broad_phase.cu:121-252``) built on
    the gather-free shift-block sweep; yields ``(pairs_device, count_int)``
    per box chunk.  A chunk whose survivors exceed ``pair_budget`` or whose
    runs exceed ``shift_cap`` falls back to the exact slot-decode generator
    for that chunk only.
    """
    from scalable_ccd_tpu.broad_phase.sweep import sweep_chunks

    n = sorted_boxes.n if n_real_boxes is None else n_real_boxes
    k = count_major_runs(sorted_boxes, jnp.int32(0), sorted_boxes.n)
    for box_start in range(0, n, box_chunk_size):
        pairs, count, _, overflow = _sweep_chunk_fast(
            sorted_boxes, k, jnp.int32(box_start),
            is_two_lists, box_chunk_size, pair_budget,
            sweep_batch, sweep_window, shift_cap, max_sweep_steps,
        )
        if bool(overflow):
            # exact fallback for this box chunk only (slot decode is
            # budget-free: totals are exact by construction)
            sub = sweep_chunks(
                sorted_boxes, is_two_lists,
                box_chunk_size=box_chunk_size,
                pair_chunk_size=max(pair_budget, 1 << 16),
                n_real_boxes=min(box_start + box_chunk_size, n),
                box_start=box_start,
            )
            for p_, c_ in sub:
                yield p_, c_
        else:
            yield pairs, int(count)


def sweep_chunks_pallas(
    sorted_boxes,
    is_two_lists: bool,
    box_chunk_size: int = 1 << 15,
    pair_budget: int = 1 << 20,
    n_real_boxes: Optional[int] = None,
    any_order: bool = False,
):
    """Host-driven chunk generator on the all-pairs subtile Mosaic kernel.

    The kernel's a-side tile range (``tile0``/``n_tiles``) IS the
    reference's broad-phase chunk cursor (``thread_start_box_id``,
    ``cuda/broad_phase/broad_phase.cu:121-224``) in 1024-box units; the
    partner stream always covers the whole packed array, so the union
    over chunks is exactly the single-dispatch pair set.  A chunk that
    overflows ``pair_budget`` retries once with the budget sized from the
    kernel's EXACT survivor total (the reference grows its buffer to
    ``real_count`` the same way, ``memory_handler.cpp:55-79``; no halving
    needed because totals stay exact on overflow).
    """
    from scalable_ccd_tpu.ops.pallas_sweep_ap import _TILE

    n = sorted_boxes.n if n_real_boxes is None else n_real_boxes
    packed, n_real = pack_boxes_ap(sorted_boxes)
    tiles_total = -(-n // _TILE)
    tiles_per = max(1, box_chunk_size // _TILE)
    interp = _pallas_interpret()
    for t0 in range(0, tiles_total, tiles_per):
        nt = min(tiles_per, tiles_total - t0)
        budget = pair_budget
        for _ in range(4):
            pairs, n_p, n_t, ovf = pallas_sweep_pairs(
                packed, n_real, is_two_lists, budget=budget,
                tile0=jnp.int32(t0), n_tiles=nt, interpret=interp,
                any_order=any_order,
            )
            if not bool(ovf):
                break
            budget = _pow2ceil(max(int(n_t), budget + 1))
        yield pairs, int(n_p)


def _phase(
    sorted_boxes,
    is_vf: bool,
    pair_budget: int,
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
    sweep_batch: int,
    sweep_window: int,
    shift_cap: int,
    max_sweep_steps: int,
    dtype,
    axis_name: Optional[str],
    solver: str = "bfs",
    sweep_impl: str = "xla",
    collect: bool = False,
    ipc_refine: bool = False,
    any_order: bool = False,
    escalate_rounds: int = -1,
    presample: bool = True,
    escalate_pool: str = "batch",
    compensated: bool = False,
    box_partition: int = 0,
    narrow_order: str = "sweep",
):
    """One simplex pairing (VF two-list or EE one-list) at fixed budgets.

    With ``presample`` (global single-chip mode, ``pair_budget >= 4 *
    batch``), the narrow loop is preceded by ONE extra batch of pairs
    sampled uniformly across the candidate stream (every
    ``n/batch``-th record's first pair on the record layouts, strided
    rows otherwise).  Candidates arrive in sweep order, so without it
    the running TOI only tightens as the loop reaches each contact
    region and every earlier batch explores deep; the sampled batch
    touches all regions first, so the loop starts at a near-final TOI
    and later batches root-prune.  The final TOI is unchanged (pruning
    uses valid upper bounds; sampled pairs simply solve twice) — one
    batch of extra work buys sweep-order independence.

    With ``collect``, also returns the per-pair hits: the solver runs in
    exact per-query mode (the reference's TOI_PER_QUERY build, where each
    query prunes only against its own ``data_in.toi``, ``root_finder.cu:297``)
    and each batch's exact TOIs are written back over the dense pair buffer
    with one contiguous update; hits (toi < 1) are sort-compacted at the end
    — the functional ``thrust::copy_if`` (``narrow_phase.cu:197-202``).

    With ``ipc_refine``, the IPC stepping rule (``ipc_ccd_strategy.cu:
    73-92``) applies at narrow-batch granularity: whenever a batch drops
    the running TOI below 1e-6, the pre-batch TOI is restored, the batch
    is re-solved exactly (unbounded iterations, ms=0, zero TOI
    disallowed), and the running TOI is scaled by 0.8 — all inside the
    single dispatch (a ``lax.cond``, so the exact re-solve costs nothing
    when not triggered).
    """
    n = sorted_boxes.n
    if sweep_impl not in (
        "xla", "pallas_ap", "pallas_rec", "pallas_sparse", "pallas_mxu",
        "pallas_mxu16",
    ):
        raise ValueError(
            f"unknown sweep_impl {sweep_impl!r}: expected 'xla', "
            "'pallas_ap', 'pallas_rec', 'pallas_sparse', 'pallas_mxu', or "
            "'pallas_mxu16' (the shifted-window kernel value 'pallas' was "
            "removed; use 'pallas_ap')"
        )
    if solver not in ("pallas", "bfs", "dfs"):
        raise ValueError(f"unknown solver {solver!r}")
    decode = None
    if sweep_impl in (
        "pallas_rec", "pallas_sparse", "pallas_mxu", "pallas_mxu16"
    ):
        # bit-record sweep kernel: survivors leave the kernel as
        # (partner, 128-box-row) mask records (no per-survivor pops);
        # 'pallas_sparse' emits one record per 128-lane row,
        # 'pallas_mxu'/'pallas_mxu16' place a whole 8/16-partner window's
        # records with one one-hot matmul, 'pallas_rec' the packed
        # per-record layout
        layout = {
            "pallas_sparse": "sparse", "pallas_mxu": "mxu",
            "pallas_mxu16": "mxu16",
        }.get(sweep_impl, "dense")
        if axis_name is None:
            packed, n_real = pack_boxes_ap(sorted_boxes)
            records, n_recs, n_pairs, overflow = pallas_sweep_records(
                packed, n_real, is_vf, pair_budget=pair_budget,
                interpret=_pallas_interpret(), any_order=any_order,
                layout=layout,
            )
            cum = records_pair_prefix(records, n_recs)
            n_true = n_pairs  # record emission gates its count on budget
            pairs = None

            def fetch(start, r_lo):
                # each narrow batch decodes its own pair range with a
                # monotone record cursor — no budget-sized decode at all
                return decode_records_range(
                    packed, records, cum, start, batch, n_pairs, r_lo,
                    is_vf,
                )
        else:
            # sharded records sweep: same a-side tile range shard as the
            # pairs kernel; each shard then decodes ITS OWN records to
            # element-id pairs in one shot (records reference THIS
            # shard's packed planes — the replicated full planes in
            # replicated mode, the owned+halo slice in partition mode)
            # and the pooled/striped narrow loop below runs unchanged on
            # final-id rows.  One budget-sized decode per shard per phase
            # (~10 ns/row of gathers) buys kernel-speed emission on
            # every chip.
            from scalable_ccd_tpu.ops.pallas_sweep_ap import _TILE

            S = jax.lax.axis_size(axis_name)
            me = jax.lax.axis_index(axis_name)
            if box_partition:
                # distributed-partition mode (_partition_slice): live box
                # planes are O(n/S + halo); a-side = local tiles
                # [0, tiles_per) = the owned range.  Extent
                # classification is disabled — it permutes the a-side
                # across the whole local window, which would move halo
                # boxes (owned by the next shards) into this shard's
                # a-side enumeration and double-count their pairs.
                local, tiles_per, halo_ok, _L = _partition_slice(
                    sorted_boxes, axis_name, box_partition
                )
                packed, n_real = pack_boxes_ap(
                    local, classify_min_boxes=1 << 62
                )
                tile0 = 0
            else:
                tiles_total = -(-n // _TILE)
                tiles_per = -(-tiles_total // S)
                packed, n_real = pack_boxes_ap(
                    sorted_boxes, pad_to_tiles=tiles_per * S
                )
                tile0 = me * tiles_per
                halo_ok = jnp.ones((), bool)
            records, n_recs, n_pairs, overflow = pallas_sweep_records(
                packed, n_real, is_vf, pair_budget=pair_budget,
                interpret=_pallas_interpret(), any_order=any_order,
                layout=layout, tile0=tile0, n_tiles=tiles_per,
            )
            overflow = overflow | ~halo_ok
            cum = records_pair_prefix(records, n_recs)
            n_true = n_pairs
            pairs, _ = decode_records_range(
                packed, records, cum, jnp.int32(0), pair_budget, n_pairs,
                jnp.int32(0), is_vf,
            )
            pairs = jnp.concatenate(
                [pairs, jnp.full((batch, 2), jnp.int32(-(2**31) + 1))]
            )

    elif sweep_impl == "pallas_ap":
        if axis_name is None:
            # all-pairs subtile sweep kernel: no run lengths, no shift cap
            packed, n_real = pack_boxes_ap(sorted_boxes)
            pairs, n_pairs, n_true, overflow = pallas_sweep_pairs(
                packed, n_real, is_vf, budget=pair_budget,
                interpret=_pallas_interpret(), raw=True,
                any_order=any_order,
            )
        else:
            # range-sharded hardware sweep: shard s sweeps the a-side
            # subtiles [s*T, (s+1)*T) of the sorted array (replicated
            # mode) or of its owned+halo slice (partition mode); the
            # partner stream covers everything an owned box can reach, so
            # the union of the shards' pair sets is exactly the
            # single-chip set — the TPU realization of the reference's
            # dead multi-GPU range shard
            # (``_multigpu/broad_phase.cu:72-115``), with the overflow
            # budget applied per shard.
            from scalable_ccd_tpu.ops.pallas_sweep_ap import _TILE

            S = jax.lax.axis_size(axis_name)
            me = jax.lax.axis_index(axis_name)
            if box_partition:
                local, tiles_per, halo_ok, _L = _partition_slice(
                    sorted_boxes, axis_name, box_partition
                )
                packed, n_real = pack_boxes_ap(
                    local, classify_min_boxes=1 << 62
                )
                tile0 = 0
            else:
                tiles_total = -(-n // _TILE)
                tiles_per = -(-tiles_total // S)
                packed, n_real = pack_boxes_ap(
                    sorted_boxes, pad_to_tiles=tiles_per * S
                )
                tile0 = me * tiles_per
                halo_ok = jnp.ones((), bool)
            pairs, n_pairs, n_true, overflow = pallas_sweep_pairs(
                packed, n_real, is_vf, budget=pair_budget,
                interpret=_pallas_interpret(),
                tile0=tile0, n_tiles=tiles_per, raw=True,
                any_order=any_order,
            )
            overflow = overflow | ~halo_ok
        if axis_name is not None and box_partition:
            # partition mode: raw a_slots reference the EMITTING shard's
            # local planes, so cross-shard balanced stripes cannot decode
            # them lazily — decode the whole buffer to element-id pairs
            # once per shard before pooling (the records-sharded path's
            # protocol; ~10 ns/row)
            pairs = decode_pairs_ap(packed, pairs, is_two_lists=is_vf)
            decode = None
        else:
            # raw (a_slot, partner_eid) rows: element ids resolve per
            # narrow batch — one small gather per batch instead of one
            # budget-sized gather up front (decode_pairs_ap docstring)
            decode = functools.partial(
                decode_pairs_ap, packed, is_two_lists=is_vf
            )
        # slack rows so the narrow loop's dynamic slices never clamp
        pairs = jnp.concatenate(
            [pairs, jnp.full((batch, 2), jnp.int32(-(2**31) + 1))]
        )
    else:
        k = count_major_runs(sorted_boxes, jnp.int32(0), n)
        pairs, n_pairs, n_true, overflow = _sweep_compact(
            sorted_boxes, is_vf, k,
            pair_budget, sweep_batch, sweep_window, shift_cap,
            max_sweep_steps, axis_name, slack=batch,
        )

    if pairs is not None:
        def fetch(start, r_lo):
            """Batch rows [start, start+batch) + pass-through cursor."""
            return (
                jax.lax.dynamic_slice_in_dim(pairs, start, batch, axis=0),
                r_lo,
            )

    lane = jnp.arange(batch, dtype=jnp.int32)

    # ---- TOI warm-start pre-batch (docstring) -----------------------------
    # Static gates: global mode only (collect needs every pair's exact
    # TOI — nothing to prune; ipc_refine has per-batch restore semantics
    # the extra batch would complicate), and only where the budget admits
    # enough batches for the warm start to matter.  The sharded pooled
    # loop has its own flavor below (samples the balanced buffer).
    do_presample = (
        presample and axis_name is None and not collect
        and not ipc_refine and pair_budget >= 4 * batch
    )
    if do_presample:
        if pairs is None:
            def presample_chunk():
                return sample_first_pairs(
                    packed, records, cum, n_recs, batch, is_vf
                )
        else:
            def presample_chunk():
                npr = jnp.clip(n_pairs, 0, pair_budget)
                # floor(i * npr / batch) without i32 overflow
                idx = lane * (npr // batch) + (lane * (npr % batch)) // batch
                return (
                    pairs[jnp.clip(idx, 0, pairs.shape[0] - 1)],
                    lane < npr,
                )
    # frame concat + per-element endpoint table shared by every narrow
    # batch: 2 row gathers per query instead of 5 (VF) / 6 (EE)
    # (concat_frames / pack_face_table docstrings)
    vcat = concat_frames(v0, v1, dtype)
    if is_vf:
        ftab = pack_face_table(vcat, faces)
    else:
        etab = pack_edge_table(vcat, edges)

    def _depth_keys(buf, n_valid, bound):
        """i32 bisection-depth key per row of ``buf`` (element-id pairs).

        ``sum_d ceil(log2(1/tol_d))`` is the domain-subdivision budget if
        nothing prunes — a static per-pair depth predictor computable
        from the query alone.  Rows at index >= ``n_valid`` (and rows the
        data-proportional loop never reaches, bounded by ``bound``) key
        to 2^30 so a sort parks them behind every real pair.  ``bound``
        must be collectively uniform under ``shard_map``.
        """
        kb = batch
        klane = jnp.arange(kb, dtype=jnp.int32)

        def kbody(st):
            step, keys = st
            start = step * kb
            chunk = jax.lax.dynamic_slice_in_dim(buf, start, kb, axis=0)
            if decode is not None:
                # raw sweep rows (pallas_ap lazy decode): resolve element
                # ids per key batch; the sorted buffer keeps RAW rows and
                # the narrow loop's per-batch decode applies unchanged
                chunk = decode(chunk)
            if is_vf:
                q = gather_vf_queries(
                    v0, v1, faces, chunk, dtype=dtype, vcat=vcat, ftab=ftab
                )
            else:
                q = gather_ee_queries(
                    v0, v1, edges, chunk, dtype=dtype, vcat=vcat, etab=etab
                )
            tol = compute_tolerance(q, is_vf, jnp.asarray(tolerance, dtype))
            k = jnp.sum(
                jnp.ceil(jnp.log2(jnp.maximum(1.0 / tol, 1.0))), axis=1
            ).astype(jnp.int32)
            k = jnp.where((start + klane) < n_valid, k, jnp.int32(2**30))
            return step + 1, jax.lax.dynamic_update_slice_in_dim(
                keys, k, start, axis=0
            )

        keys0 = jnp.full((buf.shape[0],), jnp.int32(2**30))
        _, keys = jax.lax.while_loop(
            lambda st: st[0] * kb < bound, kbody, (jnp.int32(0), keys0)
        )
        return keys

    def _key_sort(buf, n_valid, bound, slack):
        """Sort ``buf`` rows by depth key; invalid rows park at the back,
        so every ``index < n_valid`` mask stays correct afterwards.
        ``slack`` sentinel rows are appended for clamp-free slices."""
        keys = _depth_keys(buf, n_valid, bound)
        ops_sorted = jax.lax.sort(
            (keys, buf[:, 0], buf[:, 1]), num_keys=1
        )
        out = jnp.stack((ops_sorted[1], ops_sorted[2]), axis=1)
        if slack:
            out = jnp.concatenate(
                [out, jnp.full((slack, 2), jnp.int32(-(2**31) + 1))]
            )
        return out

    if narrow_order in ("key", "stream") and axis_name is None:
        # ---- pre-decoded candidate stream (+ optional depth ordering) ----
        # "stream": materialize the decoded pair stream ONCE and feed the
        # narrow loop plain dynamic slices — the records layouts otherwise
        # decode per batch (searchsorted over the record prefix + window
        # gathers), which hw_depth_order measured as the dominant narrow
        # cost at congested scale (VF grid-1000: 198 ms glue floor vs
        # ~790 ms pipeline narrow; the solver rounds themselves are
        # ~14 ms).  One budget-sized decode (~10 ns/row) buys a lean loop
        # — the single-chip twin of the sharded path's one-shot decode.
        #
        # "key": additionally sort the stream by the static depth key
        # ``sum_d ceil(log2(1/tol_d))`` so similar-depth lanes share a
        # solver block and one deep lane no longer serializes 2048
        # shallow ones (hw_depth_hist: 3.4-3.7x summed worst-lane depth
        # at grid-1000).  Exact in every mode: the TOI is a min over
        # pairs, pruning uses valid upper bounds only, and the warm-start
        # pre-batch keeps the running TOI near-final from batch one.
        P = pair_budget
        if pairs is None:
            # records layout: no dense row buffer exists — materialize the
            # decoded stream once (raw-row layouts instead keep their lazy
            # per-batch decode; _key_sort permutes the raw rows)
            pairs_d, _ = decode_records_range(
                packed, records, cum, jnp.int32(0), P, n_pairs,
                jnp.int32(0), is_vf,
            )
        else:
            pairs_d = pairs[:P]

        if narrow_order == "key":
            pairs = _key_sort(pairs_d, n_pairs, n_pairs, batch)
        else:
            pairs = jnp.concatenate(
                [pairs_d, jnp.full((batch, 2), jnp.int32(-(2**31) + 1))]
            )

        def fetch(start, r_lo):
            return (
                jax.lax.dynamic_slice_in_dim(pairs, start, batch, axis=0),
                r_lo,
            )

    def run_solver(chunk, keep, toi, ms_kw=None, max_iter=None, zero_ok=None):
        """Solve one dense candidate batch; returns
        ``(toi, checks, capped, per_query_toi_or_None)`` where ``capped``
        is the scalar conservative-accept flag (solver stack/queue/
        round-cap accepts — TOI valid but possibly early) and the per-query
        TOIs are returned only in ``collect`` mode.  The keyword overrides
        exist for the IPC exact re-solve (ms=0, unbounded, no zero TOI)."""
        ms_ = ms if ms_kw is None else ms_kw
        max_iter = max_iterations if max_iter is None else max_iter
        zero_ok = allow_zero_toi if zero_ok is None else zero_ok
        if decode is not None:
            chunk = decode(chunk)
        if is_vf:
            q = gather_vf_queries(
                v0, v1, faces, chunk, dtype=dtype, vcat=vcat, ftab=ftab
            )
        else:
            q = gather_ee_queries(
                v0, v1, edges, chunk, dtype=dtype, vcat=vcat, etab=etab
            )
        if solver == "pallas":
            out = pallas_find_roots(
                q, keep, is_vf, toi, ms_, tolerance,
                allow_zero_toi=zero_ok,
                interpret=_pallas_interpret(),
                toi_per_query=collect,
                max_iterations=max_iter,
                round_limit=escalate_rounds,
                # hardware-tuned block; interpret keeps the native-vreg 8
                # (same semantics — bitwise parity is pinned by
                # test_kernel_block_sub_parity — but half the padded lanes
                # for the CPU suite's tiny batches)
                block_sub=(
                    SOLVER_BLOCK_SUB if not _pallas_interpret() else 8
                ),
            )
            toi_k, capped_k, checks_k = out[:3]
            pq = out[3] if collect else None
            return toi_k, checks_k.astype(jnp.int32), capped_k, pq
        if solver == "bfs":
            res = find_roots_bfs(
                q, keep, is_vf,
                toi_init=toi, ms=ms_, tolerance=tolerance,
                max_iterations=max_iter,
                allow_zero_toi=zero_ok,
                toi_per_query=collect,
                compensated=compensated,
            )
        else:
            res = find_roots(
                q, keep, is_vf,
                toi_init=toi, ms=ms_, tolerance=tolerance,
                max_iterations=max_iter,
                allow_zero_toi=zero_ok,
                stack_capacity=stack_capacity,
                toi_per_query=collect,
                compensated=compensated,
            )
        return (
            res.toi, res.total_checks.astype(jnp.int32),
            jnp.any(res.overflow),
            res.per_query_toi if collect else None,
        )

    def ipc_step(chunk, keep, toi, toi_after, ck, capped_b):
        """The per-batch IPC refinement (``ipc_ccd_strategy.cu:73-92``):
        discard a too-early batch result, re-solve the batch exactly, and
        back off by 0.8.  Returns updated (toi_after, checks, capped)."""
        zero = jnp.asarray(0, dtype)

        def refine(_):
            toi_r, ck_r, capped_r, _ = run_solver(
                chunk, keep, toi, ms_kw=zero, max_iter=-1, zero_ok=False
            )
            # the reference scales the RUNNING toi (min of the restored
            # pre-batch value and the exact re-solve) by 0.8
            return jnp.minimum(toi, toi_r) * jnp.asarray(0.8, dtype), \
                ck_r, capped_r

        def keep_fn(_):
            return toi_after, jnp.int32(0), jnp.zeros((), bool)

        toi_after, ck_r, capped_r = jax.lax.cond(
            toi_after < 1e-6, refine, keep_fn, None
        )
        return toi_after, ck + ck_r, capped_b | capped_r

    def balance_sharded():
        """Pool + load-balance the per-shard candidate buffers: one
        ``all_gather`` of the budget-sized buffers, then each shard takes
        the me-th stripe OF EACH SOURCE shard's survivors, appended at a
        running write pointer so its candidates form a dense prefix (see
        the multi-chip narrow section below).  Returns
        ``(pairs_bal, mask_bal, used)`` with ``used`` the pmax'd dense
        prefix bound (collectively uniform trip count)."""
        S = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        share = -(-pair_budget // S)  # rows taken from each source shard
        all_pairs = jax.lax.all_gather(
            pairs[:pair_budget], axis_name)  # (S,B,2)
        all_counts = jax.lax.all_gather(n_pairs, axis_name)  # (S,)
        sent = jnp.int32(-(2**31) + 1)
        pad_rows = jnp.full((share + S, 2), sent)
        pairs_bal = jnp.full((S * share + batch, 2), sent)
        wp = jnp.int32(0)
        for src in range(S):
            c = all_counts[src]
            share_c = (c + S - 1) // S      # this source's stripe width
            start = me * share_c             # my stripe within [0, c)
            cnt = jnp.clip(c - start, 0, share_c)
            # slack-padded source so the share-sized slice never clamps
            # (start <= budget - share + S by construction)
            src_rows = jnp.concatenate([all_pairs[src], pad_rows])
            stripe = jax.lax.dynamic_slice_in_dim(
                src_rows, start, share, axis=0)
            pairs_bal = jax.lax.dynamic_update_slice_in_dim(
                pairs_bal, stripe, wp, axis=0
            )
            wp = wp + cnt
        mask_bal = jnp.arange(
            S * share + batch, dtype=jnp.int32) < wp
        # uniform trip bound: the largest dense prefix on any shard
        used = jax.lax.pmax(wp, axis_name)
        return pairs_bal, mask_bal, used

    if collect and axis_name is not None:
        # ---- multi-chip per-pair collisions --------------------------
        # Same pooled load balance as the global-TOI loop below, but the
        # solver runs in exact per-query mode (lanes prune only against
        # their own TOI, so no mid-loop pmin is needed for the per-pair
        # values — the scalar TOI is pmin'd once at the end).  Each
        # shard compacts its stripe's hits, then ONE more all_gather
        # builds the replicated global hit list with the same
        # contiguous-append trick — the multi-GPU analogue of the
        # reference's per-device ``thrust::copy_if`` + host concat
        # (``narrow_phase.cu:197-202``), without a host in the loop.
        S = jax.lax.axis_size(axis_name)
        pairs_bal, mask_bal, used = balance_sharded()
        if narrow_order == "key":
            # per-shard depth ordering of the balanced stripe: the sort is
            # local (each shard orders its own dense prefix), the loop
            # bound `used` is already collectively uniform, and the
            # `index < wp` masks survive the sort because invalid rows
            # park at the back
            wp_me = jnp.sum(mask_bal.astype(jnp.int32))
            pairs_bal = _key_sort(pairs_bal, wp_me, used, 0)
        Pb = pairs_bal.shape[0]
        pq0 = jnp.full((Pb,), jnp.inf, dtype)

        def cond(st):
            step = st[0]
            # no `toi > 0` early exit: every pair's exact TOI is needed
            return step * batch < used

        def body(st):
            step, toi, pq, checks, capped = st
            start = step * batch
            chunk = jax.lax.dynamic_slice_in_dim(
                pairs_bal, start, batch, axis=0)
            keep = jax.lax.dynamic_slice_in_dim(
                mask_bal, start, batch, axis=0)
            toi_new, ck, capped_b, pq_b = run_solver(chunk, keep, toi)
            pq = jax.lax.dynamic_update_slice_in_dim(
                pq, pq_b.astype(dtype), start, axis=0
            )
            return (step + 1, jnp.minimum(toi, toi_new), pq,
                    checks + ck, capped | capped_b)

        _, toi, pq, checks, capped = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), toi_in, pq0, jnp.int32(0),
             jnp.zeros((), bool)),
        )
        hit = (pq < 1.0) & mask_bal
        n_hits, h_pairs, h_toi = compact_rows(hit, pairs_bal, pq)
        if decode is not None:
            # hits are few; decode the compacted buffer once (raw rows
            # reference the replicated packed planes, so any shard
            # decodes any source shard's rows identically)
            h_pairs = decode(h_pairs)
        # replicated global hit list: gather every shard's compacted
        # buffer and append each dense prefix at a running pointer
        all_h = jax.lax.all_gather(h_pairs, axis_name)   # (S, Pb, 2)
        all_t = jax.lax.all_gather(h_toi, axis_name)     # (S, Pb)
        all_n = jax.lax.all_gather(n_hits, axis_name)    # (S,)
        sent = jnp.int32(-(2**31) + 1)
        g_pairs = jnp.full((S * Pb, 2), sent)
        g_toi = jnp.full((S * Pb,), jnp.inf, dtype)
        wp = jnp.int32(0)
        for s in range(S):
            g_pairs = jax.lax.dynamic_update_slice_in_dim(
                g_pairs, all_h[s], wp, axis=0)
            g_toi = jax.lax.dynamic_update_slice_in_dim(
                g_toi, all_t[s], wp, axis=0)
            wp = wp + all_n[s]
        toi = jax.lax.pmin(toi, axis_name)
        n_true = jax.lax.psum(n_true, axis_name)
        overflow = jax.lax.pmax(overflow, axis_name)
        checks = jax.lax.psum(checks, axis_name)
        capped = jax.lax.pmax(capped, axis_name)
        return (toi, n_true, overflow, checks, capped,
                g_pairs, g_toi, wp)

    if collect:
        P = pairs.shape[0] if pairs is not None else pair_budget + batch
        pq0 = jnp.full((P,), jnp.inf, dtype)
        # decoded element-id pairs, written batch by batch (the records
        # path has no dense pair buffer of its own)
        dec0 = (
            jnp.full((P, 2), jnp.int32(-(2**31) + 1))
            if pairs is None else None
        )

        def cond(st):
            step = st[0]
            # no `toi > 0` early exit: every pair's exact TOI is needed
            # (the chunked pipeline disables it the same way)
            return step * batch < n_pairs

        def body(st):
            if dec0 is not None:
                step, toi, pq, checks, capped, r_lo, dec = st
            else:
                step, toi, pq, checks, capped, r_lo = st
            start = step * batch
            chunk, r_lo = fetch(start, r_lo)
            keep = (start + lane) < n_pairs
            toi_new, ck, capped_b, pq_b = run_solver(chunk, keep, toi)
            pq = jax.lax.dynamic_update_slice_in_dim(
                pq, pq_b.astype(dtype), start, axis=0
            )
            out = (step + 1, jnp.minimum(toi, toi_new), pq, checks + ck,
                   capped | capped_b, r_lo)
            if dec0 is not None:
                dec = jax.lax.dynamic_update_slice_in_dim(
                    dec, chunk, start, axis=0
                )
                out = out + (dec,)
            return out

        carry0 = (jnp.int32(0), toi_in, pq0, jnp.int32(0),
                  jnp.zeros((), bool), jnp.int32(0))
        if dec0 is not None:
            carry0 = carry0 + (dec0,)
        st = jax.lax.while_loop(cond, body, carry0)
        _, toi, pq, checks, capped, _ = st[:6]
        dec = st[6] if dec0 is not None else None
        slot = jnp.arange(P, dtype=jnp.int32)
        hit = (pq < 1.0) & (slot < n_pairs)
        n_hits, h_pairs, h_toi = compact_rows(
            hit, pairs if dec is None else dec, pq
        )
        if decode is not None:
            # hits are few; decode the compacted buffer once
            h_pairs = decode(h_pairs)
        return toi, n_true, overflow, checks, capped, h_pairs, h_toi, n_hits

    # frame-level straggler pool (escalate_pool="frame"): every narrow
    # batch runs ONE bounded pass and appends its mid-search lanes' packed
    # query rows to a frame-wide buffer; a dense unbounded pass after the
    # loop retires the whole tail at once.  The per-batch ladder pays its
    # pooling glue (cumsum + gather + a second pallas dispatch) per batch
    # even when one lane escalates — measured at grid-1000 that glue
    # exceeds the occupancy win (PERF.md round-4d); amortized per frame it
    # is paid once.  Exactness: identical argument to the per-batch
    # ladder (pass-B re-solves every deferred lane from scratch, pruning
    # only against valid upper bounds), so the TOI is bitwise-identical
    # to the unbounded loop absent stack/dim-cap overflow accepts.
    # STATUS (rounds 4e-5, hw_ladder_grid1000.log / hw_ladder_bench.log):
    # scale-dependent.  Congested (grid-1000): LOSS — 6770-6783 ms vs 6362
    # per-batch rl=128 (the per-batch append glue dominates at 918
    # batches).  Bench scale: WIN — 116-118 ms vs the per-batch ladder's
    # 121 (matches escalation-off; the cond-gated second stage pays its
    # glue per batch).  fused_ccd's escalate_pool="auto" therefore selects
    # "frame" below the congestion box-count threshold, "batch" above.
    use_frame_pool = (
        escalate_pool == "frame" and axis_name is None
        and solver == "pallas" and not collect and not ipc_refine
        and max_iterations < 0
        and isinstance(escalate_rounds, int) and escalate_rounds >= 0
    )

    if axis_name is None:
        if do_presample:
            chunk_s, valid_s = presample_chunk()
            toi_s, ck_s, capped_s, _ = run_solver(chunk_s, valid_s, toi_in)
            toi_start = jnp.minimum(toi_in, toi_s)
        else:
            toi_start = toi_in
            ck_s = jnp.int32(0)
            capped_s = jnp.zeros((), bool)

        if use_frame_pool:
            block_sub = SOLVER_BLOCK_SUB if not _pallas_interpret() else 8
            PB = block_sub * 128  # pool granularity: one solver block
            # frame buffer: budget-proportional, block-aligned, one block
            # of slack so an append at cursor == K stays in bounds.
            # Memory: the (K+PB, ~31)-f32 packed-row buffer is carried
            # through the narrow while_loop — at the 1<<21 cap that is
            # ~260 MB HBM on top of the pair buffers (reached at
            # pair_budget >= 1<<27; at the default auto budgets it is
            # pair_budget/64 rows, ~2 MB/1M pairs) (ADVICE r4)
            K = min(1 << 21, max(1 << 14, pair_budget >> 6))
            K = -(-K // PB) * PB

            def run_bounded(chunk, keep, toi):
                if decode is not None:
                    chunk = decode(chunk)
                if is_vf:
                    q = gather_vf_queries(
                        v0, v1, faces, chunk, dtype=dtype, vcat=vcat,
                        ftab=ftab)
                else:
                    q = gather_ee_queries(
                        v0, v1, edges, chunk, dtype=dtype, vcat=vcat,
                        etab=etab)
                return pallas_find_roots_bounded(
                    q, keep, is_vf, toi, ms, tolerance,
                    round_limit=escalate_rounds,
                    allow_zero_toi=allow_zero_toi,
                    interpret=_pallas_interpret(), block_sub=block_sub,
                )

            def cond(st):
                step, toi = st[0], st[1]
                return (step * batch < n_pairs) & (toi > 0)

            def body(st):
                step, toi, checks, capped, r_lo, buf, cur = st
                start = step * batch
                chunk, r_lo = fetch(start, r_lo)
                keep = (start + lane) < n_pairs
                toi_new, ovf_b, ck, unfin, qrows = run_bounded(
                    chunk, keep, toi)
                toi_after = jnp.minimum(toi, toi_new)
                cnt = jnp.sum(unfin, dtype=jnp.int32)

                def skip(op):
                    buf, cur = op
                    return (buf, cur, toi_after, jnp.int32(0),
                            jnp.zeros((), bool))

                def pool(op):
                    buf, cur = op
                    cs = jnp.cumsum(unfin)
                    idx = jnp.searchsorted(
                        cs, jnp.arange(1, PB + 1, dtype=cs.dtype),
                        side="left")
                    idx = jnp.minimum(idx, batch - 1)
                    rows = jnp.take(qrows, idx, axis=0)
                    # rows past cnt duplicate real rows but land beyond
                    # cur + cnt: the next append overwrites from there and
                    # pass B masks on index < final cursor
                    buf = jax.lax.dynamic_update_slice(
                        buf, rows, (cur, jnp.int32(0)))
                    return (buf, cur + cnt, toi_after, jnp.int32(0),
                            jnp.zeros((), bool))

                def solve_now(op):
                    # pool full (cursor past K) or a pathologically deep
                    # batch (> one block of stragglers): retire this
                    # batch's tail immediately, unbounded, pruned by the
                    # running TOI — never drop, never conservative-fold
                    buf, cur = op
                    toi2, ovf2, ck2 = pallas_solve_packed(
                        qrows, unfin, is_vf, toi_after, tolerance,
                        allow_zero_toi=allow_zero_toi,
                        interpret=_pallas_interpret(),
                        block_sub=block_sub)
                    return (buf, cur, jnp.minimum(toi_after, toi2),
                            ck2.astype(jnp.int32), ovf2)

                buf, cur, toi_after, ck2, ovf2 = jax.lax.cond(
                    cnt == 0, skip,
                    lambda op: jax.lax.cond(
                        (cnt <= PB) & (cur <= K), pool, solve_now, op),
                    (buf, cur),
                )
                return (step + 1, toi_after,
                        checks + ck.astype(jnp.int32) + ck2,
                        capped | ovf_b | ovf2, r_lo, buf, cur)

            buf0 = jnp.zeros((K + PB, 31), jnp.float32)
            st = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), toi_start, ck_s, capped_s, jnp.int32(0),
                 buf0, jnp.int32(0)),
            )
            _, toi, checks, capped, _, buf, cur = st

            # pass B: the pooled tail, dense, one solver block per call
            b2lane = jnp.arange(PB, dtype=jnp.int32)

            def cond2(st):
                step, toi = st[0], st[1]
                return (step * PB < cur) & (toi > 0)

            def body2(st):
                step, toi, checks, capped = st
                rows = jax.lax.dynamic_slice(
                    buf, (step * PB, jnp.int32(0)), (PB, 31))
                valid2 = ((step * PB + b2lane) < cur).astype(jnp.int32)
                toi2, ovf2, ck2 = pallas_solve_packed(
                    rows, valid2, is_vf, toi, tolerance,
                    allow_zero_toi=allow_zero_toi,
                    interpret=_pallas_interpret(), block_sub=block_sub)
                return (step + 1, jnp.minimum(toi, toi2),
                        checks + ck2.astype(jnp.int32), capped | ovf2)

            _, toi, checks, capped = jax.lax.while_loop(
                cond2, body2, (jnp.int32(0), toi, checks, capped))
            return toi, n_true, overflow, checks, capped

        def cond(st):
            step, toi, checks, capped, r_lo = st
            # `toi > 0` early exit mirrors the reference chunk loop's
            # `remaining_queries && toi > 0` (narrow_phase.cu:136)
            return (step * batch < n_pairs) & (toi > 0)

        def body(st):
            step, toi, checks, capped, r_lo = st
            start = step * batch
            chunk, r_lo = fetch(start, r_lo)
            keep = (start + lane) < n_pairs
            toi_new, ck, capped_b, _ = run_solver(chunk, keep, toi)
            toi_after = jnp.minimum(toi, toi_new)
            if ipc_refine:
                toi_after, ck, capped_b = ipc_step(
                    chunk, keep, toi, toi_after, ck, capped_b
                )
            return step + 1, toi_after, checks + ck, capped | capped_b, r_lo

        _, toi, checks, capped, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), toi_start, ck_s, capped_s, jnp.int32(0)),
        )
        # report the EXACT survivor total (n_true): on overflow the user
        # (and the auto-budget retry) sees how many pairs actually exist,
        # not how many fit the buffer
        return toi, n_true, overflow, checks, capped

    # ---- multi-chip narrow: pool, balance, co-prune ----------------------
    # The reference's dead multi-GPU design leaves each device to solve its
    # own range's candidates with one final reduction; contacts concentrate
    # where geometry does, so one device grinds while the rest idle and
    # pruning information never crosses (VERDICT round 1).  Here:
    #  - every shard all-gathers the compacted candidate buffers (one ICI
    #    collective of the budget-sized buffers) and takes the me-th stripe
    #    OF EACH SOURCE shard's survivors: narrow work is balanced to within
    #    S rows regardless of where contacts sit;
    #  - the running TOI is pmin'd after EVERY narrow batch — the cross-chip
    #    analogue of atomicMin visibility during the search
    #    (root_finder.cu:295,323) — so shards prune each other mid-phase;
    #  - loop trip count and the toi-based early exit derive only from
    #    collectively-reduced values, keeping every shard in the same
    #    control flow (a per-shard count would deadlock the collective).
    # Append every stripe's share-block at a running write pointer: the
    # invalid tail of each block is overwritten by the next block (the
    # same contiguous-append trick as _sweep_compact), so my candidates
    # form a dense prefix of length sum(cnt_src) and the narrow loop's
    # trip count is data-proportional — NOT budget-proportional (a
    # budget-rounded bound cost a mesh-of-1 run 3.3x the single-chip
    # time in empty masked batches).
    pairs_bal, mask_bal, used = balance_sharded()
    if narrow_order == "key":
        # per-shard depth ordering of the balanced stripe (see the collect
        # branch above: local sort, uniform bound, masks survive)
        wp_me_k = jnp.sum(mask_bal.astype(jnp.int32))
        pairs_bal = _key_sort(pairs_bal, wp_me_k, used, 0)

    # TOI warm-start pre-batch, sharded flavor: each shard samples its own
    # balanced dense prefix (strides of it cover every source shard's
    # stripe, hence every contact region) and the loop-init pmin below
    # shares the warmest TOI with all shards before batch one.  Same
    # static gates as the single-chip path; runs on every shard, so
    # control flow stays collectively uniform.
    if presample and not ipc_refine and pair_budget >= 4 * batch:
        wp_me = jnp.sum(mask_bal.astype(jnp.int32))
        idx = lane * (wp_me // batch) + (lane * (wp_me % batch)) // batch
        chunk_s = pairs_bal[jnp.clip(idx, 0, pairs_bal.shape[0] - 1)]
        toi_s, ck_s, capped_s, _ = run_solver(chunk_s, lane < wp_me, toi_in)
        toi_in = jnp.minimum(toi_in, toi_s)
    else:
        ck_s = jnp.int32(0)
        capped_s = jnp.zeros((), bool)

    def cond(st):
        step, toi, checks, capped = st
        # both operands are collectively uniform (pmax'd bound, pmin'd toi)
        return (step * batch < used) & (toi > 0)

    def body(st):
        step, toi, checks, capped = st
        start = step * batch
        chunk = jax.lax.dynamic_slice_in_dim(pairs_bal, start, batch, axis=0)
        keep = jax.lax.dynamic_slice_in_dim(mask_bal, start, batch, axis=0)
        toi_new, ck, capped_b, _ = run_solver(chunk, keep, toi)
        # mid-phase TOI exchange: every shard sees every hit immediately
        toi_after = jax.lax.pmin(jnp.minimum(toi, toi_new), axis_name)
        if ipc_refine:
            # the refinement condition is collectively uniform (pmin'd
            # TOI), so every shard takes the same branch; the exact
            # re-solve covers each shard's own stripe and pmin's again
            toi_r, ck, capped_b = ipc_step(
                chunk, keep, toi, toi_after, ck, capped_b
            )
            toi_after = jax.lax.pmin(toi_r, axis_name)
        return step + 1, toi_after, checks + ck, capped | capped_b

    _, toi, checks, capped = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jax.lax.pmin(toi_in, axis_name), ck_s, capped_s),
    )
    toi = jax.lax.pmin(toi, axis_name)
    # each pair is emitted by exactly one shard (a-side range shard), so
    # the exact per-shard totals sum to the exact global total
    n_true = jax.lax.psum(n_true, axis_name)
    overflow = jax.lax.pmax(overflow, axis_name)
    checks = jax.lax.psum(checks, axis_name)
    capped = jax.lax.pmax(capped, axis_name)
    return toi, n_true, overflow, checks, capped


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
    narrow_batch: int = 1 << 14,
    sweep_batch: int = 1 << 17,
    sweep_window: int = 32,
    shift_cap: int = 1 << 13,
    max_sweep_steps: int = 1 << 22,
    sweep_axis=0,
    sweep_impl: str = "xla",
    axis_name: Optional[str] = None,
    solver: str = "bfs",
    collect: bool = False,
    ipc_refine: bool = False,
    bucket_minor: bool = False,
    escalate_rounds: int = -1,
    presample: bool = True,
    escalate_pool: str = "batch",
    precision: str = "f32",
    box_partition: int = 0,
    narrow_order: str = "sweep",
) -> FusedCCDResult:
    """Trace-through core; see :func:`fused_ccd` for the jitted entry.

    ``box_partition`` (sharded kernel sweeps only): a positive halo budget
    in boxes switches the broad phase to distributed-partition mode — each
    shard's live box planes are its owned sorted slice plus that halo
    (:func:`_partition_slice`), O(n/S + halo) per chip instead of the
    replicated O(n).  An insufficient halo sets ``overflowed`` (the host
    retries larger, like pair budgets); pairs are never dropped silently.

    ``vf_budget`` / ``ee_budget`` bound the *surviving* candidate pairs per
    phase (per shard when sharded) — the analogue of the reference's
    ``MAX_OVERLAP_SIZE`` (``memory_handler.hpp:11``).  ``sweep_batch`` and
    ``max_sweep_steps`` bound the pre-filter slot space enumeration
    (``MAX_OVERLAP_CUTOFF``-like); both loops exit early once the true totals
    are consumed, so oversized budgets cost compile-time shapes, not runtime.
    """
    if bucket_minor and sweep_impl == "xla":
        raise ValueError(
            "bucket_minor ordering is only valid for the Pallas sweep "
            "kernels (the XLA sweep requires exactly-sorted major bounds)"
        )
    if precision not in ("f32", "compensated"):
        raise ValueError(
            f"unknown precision {precision!r}: 'f32' or 'compensated' "
            "(double-word f32 inclusion function — the TPU counterpart of "
            "the reference's Scalar=double default; for true f64 pass "
            "dtype=jnp.float64 on CPU)"
        )
    if precision == "compensated" and solver == "pallas":
        raise ValueError(
            "precision='compensated' runs on the XLA solvers (pass "
            "solver='bfs' or 'dfs', or leave solver=None in fused_ccd for "
            "auto); the Mosaic kernel computes in plain f32"
        )
    if box_partition:
        if axis_name is None:
            raise ValueError(
                "box_partition is a multi-chip memory mode (shard_map "
                "axis required); single-chip runs hold the whole scene "
                "by definition"
            )
        if sweep_impl == "xla":
            raise ValueError(
                "box_partition requires the kernel sweeps (pallas_ap or "
                "a records layout); the XLA shift-block sweep indexes "
                "the full sorted array"
            )
    if escalate_pool not in ("batch", "frame"):
        raise ValueError(
            f"unknown escalate_pool {escalate_pool!r}: 'batch' (per-batch "
            "ladder) or 'frame' (frame-level straggler pool)"
        )
    if narrow_order not in ("sweep", "key", "stream"):
        raise ValueError(
            f"unknown narrow_order {narrow_order!r}: 'sweep' (candidates "
            "solved in sweep-emission order, records decoded per batch), "
            "'stream' (one up-front budget-sized decode, sweep order), or "
            "'key' (up-front decode + sort by the static bisection-depth "
            "predictor, grouping similar-depth lanes into the same solver "
            "block)"
        )
    if escalate_pool == "frame":
        # the frame pool only implements the global single-chip Pallas
        # fast path; any other combination falls back to the per-batch
        # ladder.  The result is exact either way, but a silent fallback
        # hides that the requested pooling mode is inactive (ADVICE r4)
        # — surface it once at trace time.
        reasons = []
        if solver != "pallas":
            reasons.append(f"solver={solver!r}")
        if collect:
            reasons.append("collect=True")
        if ipc_refine:
            reasons.append("ipc_refine=True")
        if max_iterations >= 0:
            reasons.append(f"max_iterations={max_iterations}")
        if not (isinstance(escalate_rounds, int) and escalate_rounds >= 0):
            reasons.append(f"escalate_rounds={escalate_rounds!r}")
        if axis_name is not None:
            reasons.append("sharded (axis_name set)")
        if reasons:
            from scalable_ccd_tpu.utils.logging import logger

            logger().warning(
                "escalate_pool='frame' is inactive with %s; "
                "falling back to per-batch pooling (exact either way)",
                ", ".join(reasons),
            )
    vb = build_vertex_boxes(
        vertices_t0, vertices_t1, inflation_radius=min_distance, dtype=dtype
    )
    eb = build_edge_boxes(vb, edges)
    fb = build_face_boxes(vb, faces)
    vf_sorted = sort_boxes(
        merge_two_lists(vb, fb), axis=sweep_axis, bucket_minor=bucket_minor
    )
    ee_sorted = sort_boxes(eb, axis=sweep_axis, bucket_minor=bucket_minor)

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
        sweep_batch=sweep_batch,
        sweep_window=sweep_window,
        shift_cap=shift_cap,
        max_sweep_steps=max_sweep_steps,
        dtype=dtype,
        axis_name=axis_name,
        solver=solver,
        sweep_impl=sweep_impl,
        any_order=bucket_minor,
        escalate_rounds=escalate_rounds,
        escalate_pool=escalate_pool,
        compensated=precision == "compensated",
        box_partition=box_partition,
        narrow_order=narrow_order,
    )
    # per-phase warm-start pre-batch: a (vf, ee) tuple resolves each phase
    # from its own box count (_resolve_auto_presample docstring); a plain
    # bool applies to both
    ps_vf, ps_ee = (
        presample if isinstance(presample, tuple) else (presample, presample)
    )
    toi0 = jnp.asarray(1.0, dtype)
    if collect:
        if ipc_refine:
            raise ValueError(
                "ipc_refine has no per-pair output (the reference discards "
                "collisions in ipc_ccd_strategy, ipc_ccd_strategy.cu:52-54)"
            )
        (toi1, vf_total, vf_over, vf_ck, vf_cap,
         vf_hits, vf_htoi, vf_n) = _phase(
            vf_sorted, True, vf_budget, min(narrow_batch, vf_budget),
            toi_in=toi0, collect=True, presample=ps_vf, **common,
        )
        (toi2, ee_total, ee_over, ee_ck, ee_cap,
         ee_hits, ee_htoi, ee_n) = _phase(
            ee_sorted, False, ee_budget, min(narrow_batch, ee_budget),
            toi_in=toi1, collect=True, presample=ps_ee, **common,
        )
        return FusedCollisionsResult(
            toi=toi2, overflowed=vf_over | ee_over,
            vf_total=vf_total, ee_total=ee_total,
            total_checks=vf_ck + ee_ck,
            solver_capped=vf_cap | ee_cap,
            vf_hits=vf_hits, vf_hit_toi=vf_htoi, vf_hit_count=vf_n,
            ee_hits=ee_hits, ee_hit_toi=ee_htoi, ee_hit_count=ee_n,
        )
    toi1, vf_total, vf_over, vf_ck, vf_cap = _phase(
        vf_sorted, True, vf_budget, min(narrow_batch, vf_budget),
        toi_in=toi0, ipc_refine=ipc_refine, presample=ps_vf, **common,
    )
    toi2, ee_total, ee_over, ee_ck, ee_cap = _phase(
        ee_sorted, False, ee_budget, min(narrow_batch, ee_budget),
        toi_in=toi1, ipc_refine=ipc_refine, presample=ps_ee, **common,
    )
    return FusedCCDResult(
        toi=toi2, overflowed=vf_over | ee_over, vf_total=vf_total,
        ee_total=ee_total, total_checks=vf_ck + ee_ck,
        solver_capped=vf_cap | ee_cap,
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
        "sweep_batch",
        "sweep_window",
        "shift_cap",
        "max_sweep_steps",
        "sweep_axis",
        "sweep_impl",
        "solver",
        "collect",
        "ipc_refine",
        "bucket_minor",
        "escalate_rounds",
        "presample",
        "escalate_pool",
        "precision",
        "narrow_order",
    ),
)
def _fused_ccd_jit(
    vertices_t0,
    vertices_t1,
    edges,
    faces,
    vf_budget: int = 1 << 20,
    ee_budget: int = 1 << 20,
    min_distance=0.0,
    tolerance=1e-6,
    max_iterations: int = -1,
    allow_zero_toi: bool = True,
    dtype=jnp.float32,
    stack_capacity: int = 96,
    narrow_batch: int = 1 << 14,
    sweep_batch: int = 1 << 17,
    sweep_window: int = 32,
    shift_cap: int = 1 << 13,
    max_sweep_steps: int = 1 << 22,
    sweep_axis=0,
    sweep_impl: str = "xla",
    solver: str = "bfs",
    collect: bool = False,
    ipc_refine: bool = False,
    bucket_minor: bool = False,
    escalate_rounds: int = -1,
    presample: bool = True,
    escalate_pool: str = "batch",
    precision: str = "f32",
    narrow_order: str = "sweep",
) -> FusedCCDResult:
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
        sweep_batch=sweep_batch,
        sweep_window=sweep_window,
        shift_cap=shift_cap,
        max_sweep_steps=max_sweep_steps,
        sweep_axis=sweep_axis,
        sweep_impl=sweep_impl,
        axis_name=None,
        solver=solver,
        collect=collect,
        ipc_refine=ipc_refine,
        bucket_minor=bucket_minor,
        escalate_rounds=escalate_rounds,
        presample=presample,
        escalate_pool=escalate_pool,
        precision=precision,
        narrow_order=narrow_order,
    )


def fused_ccd(
    vertices_t0,
    vertices_t1,
    edges,
    faces,
    validate: bool = True,
    collisions: Optional[list] = None,
    solver: Optional[str] = None,
    pca: bool = False,
    **kwargs,
) -> FusedCCDResult:
    """Single-chip fused CCD: one dispatch for the whole two-frame query.

    API mirror of ``cuda::ccd`` (``ccd.cuh:26-38``) under static budgets;
    see :func:`fused_ccd_core` for the knobs.

    ``vf_budget``/``ee_budget`` default to ``"auto"``: a scene-proportional
    power-of-two guess, re-dispatched once on overflow with budgets sized
    from the sweep's EXACT survivor totals (which it reports even when the
    buffer overflowed) — the TPU shape of the reference's memory-handler
    sizing + overflow retry (``memory_handler.hpp:11``).  Auto results
    never carry ``overflowed`` in practice; with explicit integer budgets,
    check ``result.overflowed`` — if True, re-run with larger budgets or
    use the chunked :func:`scalable_ccd_tpu.pipeline.ccd`.
    ``validate`` fails fast on
    NaN/inf vertices and malformed connectivity before entering the jitted
    program (one device reduction + scalar fetch; pass False in per-frame
    inner loops that validated the mesh once).

    Pass a ``collisions`` list to also collect per-pair ``(id_a, id_b,
    toi)`` hits — the reference's ``SCALABLE_CCD_TOI_PER_QUERY`` output
    (``ccd.cuh:35-37``, ``narrow_phase.cu:197-202``) from the same fused
    pipeline; the solver then runs in exact per-query mode (slower than
    the globally-pruned default).  VF hits are (vertex_id, face_id), EE
    hits (edge_id, edge_id); same convention as the chunked
    :func:`scalable_ccd_tpu.pipeline.ccd`.

    ``solver`` defaults to the Pallas hardware kernel
    (:mod:`scalable_ccd_tpu.ops.pallas_solver`) on TPU — for the global
    fast path AND the exact modes (collisions → per-query kernel mode,
    bounded iterations → per-lane check counters) — and to the XLA queue
    solver ("bfs") off-TPU or when an f64 dtype is requested (the kernel
    computes in f32).

    ``bucket_minor`` defaults to ``"auto"``: congestion ordering (sort by
    quantized major bucket then minor lower bound, with the kernel's exact
    any-order planes) switches on at ``_AUTO_BUCKET_MIN_BOXES`` VF-phase
    boxes on the kernel sweeps, where it was measured -32% on congested
    scenes and ~neutral below (PERF.md).  Pass ``True``/``False`` to
    force; the pair set and TOI are ordering-invariant either way.

    ``presample`` defaults to ``"auto"``: the TOI warm-start pre-batch
    runs below the same congestion threshold only (measured -30% at
    bench scale, pure overhead at grid-1000 —
    :func:`_resolve_auto_presample`).  Exact either way.

    ``narrow_order`` defaults to ``"auto"``: above the congestion
    threshold on the kernel sweeps, the candidate stream is decoded ONCE
    up front and the narrow loop runs on plain dynamic slices
    (``"stream"``) — the records layouts otherwise decode per batch,
    measured as the dominant congested narrow cost (hw_depth_order:
    VF 790 -> 212 ms, EE 2960 -> 806 ms at grid-1000).  ``"key"``
    additionally depth-sorts the stream (opt-in; the ordering oracle
    bound is ~110 ms/frame and the static key tracks depth poorly).
    Exact in every mode (the TOI is a min over pairs; per-pair hits are
    order-free sets).

    ``precision="compensated"`` evaluates the narrow-phase inclusion
    function in double-word f32 (~48-bit mantissa,
    :mod:`scalable_ccd_tpu.ops.twofloat`) with the matching error filter
    — the TPU answer to the reference's default ``Scalar=double`` build
    (``CMakeLists.txt:69``): scenes whose separations sit below the plain
    f32 filter (which conservatively collapses their TOI toward 0, e.g.
    the committed dense-cluster golden scene) resolve to the f64-oracle
    value.  Runs on the XLA solvers (solver auto-resolves to "bfs").
    """
    if validate:
        from scalable_ccd_tpu.geometry.mesh import validate_mesh_inputs

        validate_mesh_inputs(vertices_t0, vertices_t1, edges, faces)
    if pca:
        # world-rotation preconditioner so the sort axis aligns with the
        # direction of maximum spread (``nipals_pca``, the reference's
        # opt-in PCA path, ``utils/pca.cpp:5-47``); rigid rotation, so the
        # TOI is invariant and only candidate counts change
        from scalable_ccd_tpu.utils.pca import apply_pca

        vertices_t0, vertices_t1, _ = apply_pca(
            jnp.asarray(vertices_t0), jnp.asarray(vertices_t1)
        )
    if solver is None:
        # the kernel now covers the exact per-query and bounded-iteration
        # modes too (the reference's TOI_PER_QUERY build is the same kernel
        # under a flag, root_finder.cu:293-298); it computes in f32, so
        # explicit f64 requests — and the compensated double-word mode —
        # keep the XLA solver
        f32 = kwargs.get("dtype", jnp.float32) == jnp.float32
        plain = kwargs.get("precision", "f32") != "compensated"
        solver = (
            "pallas" if (f32 and plain and not _pallas_interpret()) else "bfs"
        )
    if kwargs.get("escalate_rounds") is None:
        kwargs["escalate_rounds"] = _resolve_auto_escalation(
            None, solver, kwargs.get("max_iterations", -1)
        )
    if kwargs.get("sweep_impl") is None:
        # MXU-placed bit-record emission on TPU, 16-partner window steps
        # — the measured winner at every scale (round 4d vs the 8-partner
        # mxu: 38.0+38.5 vs 42.6+44.9 ms sweep-only at bench scale, 1836
        # vs 2148 ms grid-600, 6367 vs 7245 ms grid-1000 full frames;
        # mxu itself beat raw pops everywhere, hw_verify_r4b);
        # XLA shift-block elsewhere (interpret-mode partner streaming is
        # impractically slow on CPU)
        kwargs["sweep_impl"] = (
            "xla" if _pallas_interpret() else "pallas_mxu16"
        )
    n_vf_boxes = int(jnp.shape(vertices_t0)[0]) + int(jnp.shape(faces)[0])
    if kwargs.get("bucket_minor", "auto") == "auto":
        # congestion ordering pays off when thousands of boxes share each
        # sorted-axis column (measured: -32% at 3M boxes / grid-1000,
        # ~neutral at 470k / grid-384, PERF.md); a box-count threshold is a
        # free, predictable proxy.  The pair set is ordering-invariant
        # (the kernel's any_order mode is exact), so a wrong guess only
        # shifts sweep cost a few percent.
        kwargs["bucket_minor"] = bool(
            n_vf_boxes >= _AUTO_BUCKET_MIN_BOXES
            and kwargs["sweep_impl"] != "xla"
        )
    if kwargs.get("escalate_pool", "auto") in ("auto", None):
        # straggler-pool scope (round-5 hardware, hw_ladder_bench.log vs
        # hw_ladder_grid1000.log): at bench scale the FRAME pool matches
        # escalation-off and beats the per-batch ladder (116-118 vs 121 ms
        # — the per-batch cond-gated second stage pays its glue per batch),
        # while at congested scale the frame pool's per-batch append glue
        # loses (6778 vs 6362 ms at grid-1000).  Auto keys on the same
        # congestion threshold as bucket_minor/presample, and only selects
        # "frame" where its static preconditions hold (global single-chip
        # Pallas fast path) so the fallback warning never fires on auto.
        er = kwargs.get("escalate_rounds", -1)
        frame_ok = (
            solver == "pallas"
            and collisions is None
            and not kwargs.get("ipc_refine", False)
            and kwargs.get("max_iterations", -1) < 0
            and isinstance(er, int) and er >= 0
            and n_vf_boxes < _AUTO_BUCKET_MIN_BOXES
        )
        kwargs["escalate_pool"] = "frame" if frame_ok else "batch"
    if kwargs.get("narrow_order", "auto") in ("auto", None):
        # Measured dead end, kept opt-in (hw_narrow_order.log): "stream"
        # pre-decodes the whole budget in ONE decode_records_range call,
        # whose (P, 128) record-row gather intermediate hits a slow path
        # at P=2^24 — 10,987 ms/frame vs sweep's 6,321 at grid-1000
        # despite the lean loop itself being 3.7x faster on a pre-decoded
        # stream (hw_depth_order).  "key" additionally sorts by a
        # predictor that tracks depth poorly (ordering oracle bound
        # ~110 ms/frame).  Auto therefore stays sweep-order everywhere;
        # the decode-glue lever needs a chunked pre-decode, not a budget
        # -sized one.
        kwargs["narrow_order"] = "sweep"
    if kwargs.get("presample", "auto") in ("auto", None):
        # warm-start pre-batch below the congestion threshold only
        # (_resolve_auto_presample docstring: measured win at bench
        # scale, measured pure overhead at grid-1000), resolved per phase
        # from that phase's own box count; collapse to a plain bool when
        # equal (one jit cache key instead of an equivalent tuple key)
        ps_vf = _resolve_auto_presample("auto", n_vf_boxes)
        ps_ee = _resolve_auto_presample("auto", int(jnp.shape(edges)[0]))
        kwargs["presample"] = ps_vf if ps_vf == ps_ee else (ps_vf, ps_ee)
    # auto budgets: the reference sizes its pair buffers from free device
    # memory and re-runs on overflow (``memory_handler.hpp:11``,
    # ``broad_phase.cu`` halve/retry); here budgets are compile-time
    # shapes, so "auto" means: start from a scene-proportional
    # power-of-two guess (pow2 bucketing keeps recompiles to one per
    # scene-size class), and on overflow re-dispatch ONCE with budgets
    # sized from the EXACT survivor totals the sweep reports even when
    # its buffer overflowed (``pallas_sweep_pairs`` ``n_true``).
    vf_auto = kwargs.get("vf_budget", "auto") == "auto"
    ee_auto = kwargs.get("ee_budget", "auto") == "auto"
    auto_key = None
    if vf_auto:
        n_vf = int(jnp.shape(vertices_t0)[0]) + int(jnp.shape(faces)[0])
        kwargs["vf_budget"] = max(
            _pow2ceil(_AUTO_VF_GUESS * n_vf), _AUTO_BUDGET_MIN
        )
    if ee_auto:
        n_ee = int(jnp.shape(edges)[0])
        kwargs["ee_budget"] = max(
            _pow2ceil(_AUTO_EE_GUESS * n_ee), _AUTO_BUDGET_MIN
        )
    if vf_auto or ee_auto:
        # sticky resize: a per-frame simulation loop must not pay the
        # undersized dispatch + retry on EVERY call once one frame has
        # shown the guess too small — remember grown budgets per
        # scene-size class (the initial pow2 guesses) for the process
        auto_key = (
            kwargs.get("vf_budget"), kwargs.get("ee_budget"),
            kwargs.get("sweep_impl"),
        )
        grown = _AUTO_BUDGET_MEMO.get(auto_key)
        if grown is not None:
            if vf_auto:
                kwargs["vf_budget"] = max(kwargs["vf_budget"], grown[0])
            if ee_auto:
                kwargs["ee_budget"] = max(kwargs["ee_budget"], grown[1])

    def _dispatch():
        if collisions is None:
            return _fused_ccd_jit(
                vertices_t0, vertices_t1, edges, faces, solver=solver,
                **kwargs
            )
        return _fused_ccd_jit(
            vertices_t0, vertices_t1, edges, faces, collect=True,
            solver=solver, **kwargs
        )

    res = _dispatch()
    if (vf_auto or ee_auto) and bool(res.overflowed):
        for _ in range(3):
            grew = False
            vf_t, ee_t = int(res.vf_total), int(res.ee_total)
            if vf_auto and vf_t > kwargs["vf_budget"]:
                kwargs["vf_budget"] = _pow2ceil(vf_t)
                grew = True
            if ee_auto and ee_t > kwargs["ee_budget"]:
                kwargs["ee_budget"] = _pow2ceil(ee_t)
                grew = True
            if not grew:
                # overflow not traceable to a pair budget (XLA sweep
                # shift/step caps, or the records path's gated count):
                # grow everything growable geometrically instead
                if kwargs["sweep_impl"] == "xla":
                    kwargs["shift_cap"] = 2 * kwargs.get(
                        "shift_cap", 1 << 13
                    )
                    kwargs["max_sweep_steps"] = 2 * kwargs.get(
                        "max_sweep_steps", 1 << 22
                    )
                if vf_auto:
                    kwargs["vf_budget"] *= 2
                if ee_auto:
                    kwargs["ee_budget"] *= 2
            res = _dispatch()
            if not bool(res.overflowed):
                break
        _AUTO_BUDGET_MEMO[auto_key] = (
            kwargs["vf_budget"] if vf_auto else 0,
            kwargs["ee_budget"] if ee_auto else 0,
        )

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
