"""Pallas TPU kernel: all-pairs subtile sweep (broad phase).

Hardware kernel for the sorted sweep's hot loop, replacing the XLA
shift-block enumeration (``pipeline/fused.py:_sweep_compact``) on TPU.
The reference's equivalent is the STQ kernel
(``src/scalable_ccd/cuda/broad_phase/sweep.cu:101-182``): one thread per
box advancing through its run with a per-warp work queue.  The XLA
formulation enumerates (tile, shift-block) steps whose cost is dominated
by per-step loop overhead and by sort-based compaction of very sparse
survivors (<1% of slots); measured ~0.2-0.5 ns/slot of filter work but
~10x that in overhead at large scale.

This kernel restructures the sweep around the VPU:

- Grid step = a **subtile** of 8x128 = 1024 consecutive sorted boxes,
  resident in VMEM as one ``(8, 128)`` plane per field.
- Partner boxes stream through a scalar loop: each iteration broadcasts
  one partner's fields against all 1024 subtile boxes (a dozen vector
  compares = the full pair filter for 1024 candidate pairs).  The sweep
  invariant gives the exact termination: stop when the partner's
  ``major_min`` exceeds the subtile's max ``major_max`` — no run-length
  precomputation, no ``shift_cap``, no skew waste beyond the subtile's own
  spread (1024-box granularity, vs per-4096-tile in the XLA path).
- Partner data is DMA'd HBM->VMEM in aligned 1024-box windows ahead of the
  scalar cursor.
- Survivors are extracted with a pop loop costing O(survivors): locate
  the min- AND max-position set lanes with two independent reductions
  (their latencies overlap — up to two pops per round), append RAW
  ``(a_slot, partner_eid)`` rows to a VMEM collect buffer with one-hot
  writes, clear the lanes, repeat.  The a-side value is the scalar the
  position reduce already produced and the partner id one SMEM read, so
  no per-pop value reductions exist; element ids and the emit convention
  are resolved by ONE XLA gather per consumer batch
  (:func:`decode_pairs_ap`).  The collect buffer flushes to the HBM pair
  buffer in 128-aligned DMA bursts through a write pointer in SMEM
  scratch that persists across the sequential grid — the functional
  ``add_overlap`` atomic append (``collision.cuh:45-54``).
- Pair-budget overflow sets a flag and stops appending (the caller falls
  back / retries, the reference's ``real_count`` protocol).

The decoded emit convention matches ``shifted_pair_filters`` / the
reference (``sweep.cu:152-164``): one-list pairs are (min, max) element
ids, two-list pairs (flip(min), max) with list A negative-tagged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_sweep_pairs",
    "pallas_sweep_records",
    "pack_boxes_ap",
    "decode_pairs_ap",
    "records_pair_prefix",
    "decode_records_range",
]

_SUB, _LANE = 8, 128
_TILE = _SUB * _LANE          # boxes per grid step
_WIN = _TILE                  # partner window size (boxes)
_STAGE = _SUB * _LANE         # staging block: 1024 pairs, burst-DMA'd
_SENTINEL = -(2**31) + 1

#: bit-record emission: one record per (partner, subtile-row) with any
#: survivor; 8 i32 words per record (w0..w3 = 128-bit lane mask, w4 =
#: partner sorted index, w5 = absolute a-side 128-lane row, w6/w7 pad),
#: 16 records per 128-lane buffer row, 128 records per (8, 128) stage
_REC_WORDS = 8
_REC_PER_ROW = _LANE // _REC_WORDS
_REC_STAGE = _SUB * _REC_PER_ROW

#: sparse-staged bit-record emission: records are built in full 128-lane
#: staging rows (placement = ONE sublane-compare select per record,
#: instead of the dense path's per-record 16-way slot placement + group
#: fold that made dense records ~1 us each, PERF.md round-3) and land in
#: HBM at the same 32 B/record as the dense layout: a branch-free BULK
#: fold compacts the full (32, 128) staging block to 2 dense rows of the
#: (8, 128) fold buffer once per 32 records (32 static roll+selects
#: ~= 1 vector op/record, amortized where the dense path paid per
#: record), and the fold buffer DMAs to HBM once per 128 records at
#: 8-row alignment — Mosaic cannot DMA lane-slices (tiling 128), so a
#: narrow copy of lanes 0:8 is not an option; the fold is the cheapest
#: dense landing and makes the HBM layout identical to ``"dense"``.
_SREC_STAGE = 32
_SREC_FOLD_ROWS = _SREC_STAGE // _REC_PER_ROW  # dense rows per fold (2)
_SREC_FOLDS = _SUB // _SREC_FOLD_ROWS  # fold slots per flush buffer (4)

#: MXU-placed emission ("mxu"/"mxu16" layouts): the staging buffer must
#: hold a partially filled 32-record block (up to 31 rows) plus one whole
#: window step's records (up to 64 at 8 partners/step, 128 at 16) placed
#: in a single one-hot matmul — 32 + 8*stream_batch rows; completed
#: 32-row blocks fold out and the buffer shifts down by a static roll.

# f32 field plane order.  The last five exist on the partner side only
# (zeros on a permuted a-side): _FWDMIN = suffix-min of major_min over the
# stream order — the EXACT stream-termination bound for ANY box ordering
# (equals major_min itself under the plain major sort); _ROWUMIN/_ROWUMAX =
# per-128-box-row unions of the first minor axis, the row-skip test;
# _WINUMIN/_WINUMAX = the same unions per aligned 1024-box window
# (broadcast over the window's rows), the window-skip test;
# _BATUMIN/_BATUMAX = the same unions per aligned 8-box stream batch
# (broadcast over the batch's lanes), the batch-skip test — scalars so
# the kernel can read them from SMEM (vector reduces from SMEM are
# rejected by Mosaic on hardware).
(_MAJ_MIN, _MAJ_MAX, _MIN0, _MIN1, _MAX0, _MAX1,
 _FWDMIN, _ROWUMIN, _ROWUMAX, _WINUMIN, _WINUMAX,
 _BATUMIN, _BATUMAX) = range(13)
_NF = 13  # f32 plane count
# i32 field plane order (_POS = box position in sorted order, for the
# j > i test and the stream start; the a-side may be extent-reordered)
_V0, _V1, _V2, _EID, _POS = range(5)

#: a box whose major extent exceeds this multiple of the mean is "long"
_LONG_EXTENT_FACTOR = 4.0

#: below this box count the extent-class permutation costs more than the
#: subtile skew it removes (measured: ~9 ms pack overhead at 220k boxes,
#: ~25% sweep win at 3M boxes)
_CLASSIFY_MIN_BOXES = 1 << 19


def pack_boxes_ap(
    sorted_boxes,
    n_real=None,
    classify_min_boxes: int = _CLASSIFY_MIN_BOXES,
    long_extent_factor: float = _LONG_EXTENT_FACTOR,
    pad_to_tiles: int = 0,
    reorder: "str | None" = None,
):
    """SortedBoxes -> ((6, R, 128) f32, (5, R, 128) i32, n) kernel planes.

    Rows are 128-box groups, padded so every window DMA stays in bounds;
    padding boxes have ``major_min = +big`` (the partner stream terminates
    before them), inverted minors, sentinel ids, and a +big position.

    The a-side enumeration is **extent-classed** (for scenes of at least
    ``classify_min_boxes`` boxes): boxes whose major extent exceeds
    ``long_extent_factor x mean`` are stably partitioned to the
    back, so the few long-run boxes (e.g. large static-obstacle faces
    scattered through a fine cloth) share subtiles with each other instead
    of inflating every subtile's partner range to their run length — a
    subtile streams partners until none of ITS boxes can reach further.
    The partner stream still reads sorted order through the ``_POS`` plane,
    so the pair set is unchanged (verified against the XLA sweep; the
    parameters exist so tests can force the permuted path on small scenes).
    """
    n = sorted_boxes.n if n_real is None else n_real
    # ``pad_to_tiles`` rounds the a-side up to a whole number of subtiles
    # per shard so every shard of a range-sharded sweep can run the same
    # static grid (trailing subtiles are all-padding and stream nothing)
    rows = max(-(-n // _LANE), pad_to_tiles * _SUB) + 2 * (_WIN // _LANE)
    total = rows * _LANE
    big = jnp.asarray(jnp.finfo(jnp.float32).max / 8, jnp.float32)

    f_cols = jnp.stack([
        sorted_boxes.major_min[:n].astype(jnp.float32),
        sorted_boxes.major_max[:n].astype(jnp.float32),
        sorted_boxes.minor_min[:n, 0].astype(jnp.float32),
        sorted_boxes.minor_min[:n, 1].astype(jnp.float32),
        sorted_boxes.minor_max[:n, 0].astype(jnp.float32),
        sorted_boxes.minor_max[:n, 1].astype(jnp.float32),
    ], axis=1)  # (n, 6)
    i_cols = jnp.stack([
        sorted_boxes.vertex_ids[:n, 0].astype(jnp.int32),
        sorted_boxes.vertex_ids[:n, 1].astype(jnp.int32),
        sorted_boxes.vertex_ids[:n, 2].astype(jnp.int32),
        sorted_boxes.element_id[:n].astype(jnp.int32),
        jnp.arange(n, dtype=jnp.int32),
    ], axis=1)  # (n, 5)
    f_fill = jnp.array([big, -big, big, big, -big, -big], jnp.float32)
    i_fill = jnp.array(
        [_SENTINEL, _SENTINEL, _SENTINEL, 0, 2**30], jnp.int32
    )

    classify = n >= classify_min_boxes

    def planes(cols, fill, perm):
        if perm is not None:
            cols = cols[perm]
        padded = jnp.concatenate(
            [cols, jnp.broadcast_to(fill, (total - n, fill.shape[0]))]
        )  # (total, F)
        return jnp.transpose(padded.reshape(rows, _LANE, -1), (2, 0, 1))

    if classify:
        # stable partition: short boxes first, long boxes after, each class
        # in sorted-position order.  Applied either as ONE row gather in
        # the i32 domain (f32 columns ride along bitcast to i32 — integer
        # moves are bit-exact, while XLA:TPU flushes/canonicalizes f32 bit
        # patterns that look like denormals/NaNs, i.e. precisely what i32
        # ids bitcast to f32 are; ~10 ns/row, PERF.md) or as ONE
        # multi-operand stable lax.sort whose payload columns ride the
        # sort's own data movement (same REORDER_IMPL switch as
        # sort_boxes; small scenes skip the permutation entirely —
        # subtile skew is cheap there, the reorder is not)
        # ``reorder`` kwarg overrides per call; the module default
        # (PACK_REORDER_IMPL) is read at TRACE time — callers inside an
        # already-traced program see the value from when they first
        # compiled, exactly like sort_boxes's REORDER_IMPL
        from scalable_ccd_tpu.broad_phase import sweep as _sweep

        impl = reorder if reorder is not None else _sweep.PACK_REORDER_IMPL
        extent = f_cols[:, _MAJ_MAX] - f_cols[:, _MAJ_MIN]
        thr = long_extent_factor * jnp.mean(extent)
        if impl == "sort":
            ops = jax.lax.sort(
                ((extent > thr).astype(jnp.int32),
                 *(jax.lax.bitcast_convert_type(f_cols[:, k], jnp.int32)
                   for k in range(6)),
                 *(i_cols[:, k] for k in range(5))),
                num_keys=1, is_stable=True,
            )
            f_perm = jax.lax.bitcast_convert_type(
                jnp.stack(ops[1:7], axis=1), jnp.float32
            )
            i_perm = jnp.stack(ops[7:], axis=1)
        else:
            order = jnp.argsort((extent > thr).astype(jnp.int32),
                                stable=True)
            stacked = jnp.concatenate(
                [jax.lax.bitcast_convert_type(f_cols, jnp.int32), i_cols],
                axis=1,
            )[order]
            f_perm = jax.lax.bitcast_convert_type(
                stacked[:, :6], jnp.float32
            )
            i_perm = stacked[:, 6:]
        bf6 = planes(f_perm, f_fill, None)
        bi = planes(i_perm, i_fill, None)
    else:
        bf6 = planes(f_cols, f_fill, None)
        bi = planes(i_cols, i_fill, None)
    # the partner stream reads SORTED order; when the a-side was not
    # permuted the same planes serve both sides (no second copy)
    wf6 = planes(f_cols, f_fill, None) if classify else bf6
    wi = planes(i_cols, i_fill, None) if classify else bi

    def extras(wf):
        """Partner-side stream-termination + skip planes (13 total).

        fwdmin[j] = min of major_min over positions >= j: monotone
        non-decreasing for ANY ordering, so `fwdmin > a_reach` is an exact
        stream stop (== major_min under the plain sort).  Row unions span
        each 128-box row's first minor axis, window unions each aligned
        1024-box window's, batch unions each aligned 8-box stream batch's;
        padding (inverted bounds) cannot widen any of them.
        """
        mm = wf[_MAJ_MIN].reshape(-1)
        fwd = jnp.flip(jax.lax.cummin(jnp.flip(mm))).reshape(rows, _LANE)
        rmin = jnp.min(wf[_MIN0], axis=1)  # (rows,)
        rmax = jnp.max(wf[_MAX0], axis=1)
        # per-8-box batch unions, broadcast back over each batch's lanes
        # (the stream keeps j 8-aligned, so a batch is exactly one group)
        bat_min = jnp.repeat(
            jnp.min(wf[_MIN0].reshape(rows, _LANE // 8, 8), axis=2),
            8, axis=1,
        )
        bat_max = jnp.repeat(
            jnp.max(wf[_MAX0].reshape(rows, _LANE // 8, 8), axis=2),
            8, axis=1,
        )
        # windows are the kernel's aligned 8-row loads; rows need not be a
        # multiple of 8, so pad the grouping with inverted bounds
        wrows = -(-rows // _SUB)
        pad_r = wrows * _SUB - rows
        rmin_g = jnp.concatenate([rmin, jnp.full((pad_r,), big)])
        rmax_g = jnp.concatenate([rmax, jnp.full((pad_r,), -big)])
        wmin = jnp.min(rmin_g.reshape(wrows, _SUB), axis=1)  # (wrows,)
        wmax = jnp.max(rmax_g.reshape(wrows, _SUB), axis=1)
        brd = lambda x: jnp.broadcast_to(x[:, None], (rows, _LANE))  # noqa: E731
        wbrd = lambda x: brd(jnp.repeat(x, _SUB)[:rows])  # noqa: E731
        return jnp.concatenate(
            [wf, fwd[None], brd(rmin)[None], brd(rmax)[None],
             wbrd(wmin)[None], wbrd(wmax)[None],
             bat_min[None], bat_max[None]]
        )

    wf = extras(wf6)
    bf = jnp.concatenate(
        [bf6, jnp.zeros((_NF - 6, rows, _LANE), jnp.float32)]
    ) if classify else wf
    return (bf, bi, wf, wi), n


def _sweep_kernel(
    n_ref,        # (1, 1) i32 SMEM: real box count
    tile0_ref,    # (1, 1) i32 SMEM: first a-side subtile of this call's
                  # range (nonzero when a shard sweeps a slice of the
                  # sorted array, cf. the reference's range shard
                  # ``_multigpu/broad_phase.cu:72``)
    bf_hbm,       # (_NF, R, 128) f32 in HBM: a-side (extent-classed order)
    bi_hbm,       # (5, R, 128) i32 in HBM: a-side ids + positions
    wf_hbm,       # (_NF, R, 128) f32 in HBM: partner side (stream order;
                  # planes 6-12 = suffix-min termination + row/window/batch
                  # minor unions)
    wi_hbm,       # (5, R, 128) i32 in HBM: partner side
    *refs,        # outputs then scratch — layout depends on ``emit``:
                  #   pairs:   pairs_out (2, PB, 128) HBM; np_out, nt_out,
                  #            ovf_out (1,1) SMEM; scratch a_f a_i w_f w_i,
                  #            stage (2,8,128), state (4,), sems (4,)
                  #   records: recs_out (RR, 128) HBM; np_out, nrec_out,
                  #            ovf_out (1,1) SMEM; scratch a_f a_i w_f w_i,
                  #            stage (8,128), astage (16,128), state (4,),
                  #            sems (4,)
                  #   sparse:  recs_out (RR, 128) HBM; np_out, nrec_out,
                  #            ovf_out (1,1) SMEM; scratch a_f a_i w_f w_i,
                  #            stage (_SREC_STAGE,128), foldbuf (8,128),
                  #            state (4,), sems (4,)
    is_two_lists: bool,
    budget: int,
    count_only: bool = False,
    emit: str = "pairs",
    rec_cap: int = 0,
    any_order: bool = False,
    stream_batch: int = 8,
):
    # partners per stream step.  8 = one minor-union batch group; 16
    # (mxu emission only) halves the per-step scalar-branch overhead —
    # the measured record-build cost driver at congested scale (PERF.md
    # round 4c: ~200 ns/record, ~5 branches per record-bearing window
    # step) — and gives the one-hot placement matmul its full 128
    # candidate rows.  The stream keeps j ``stream_batch``-aligned.
    assert stream_batch in (8, 16)
    assert stream_batch == 8 or emit == "mxu"
    if emit == "records":
        (recs_out, np_out, nrec_out, ovf_out,
         a_f, a_i, w_f, w_i, stage, astage, state, sems) = refs

        def fold_group(rc, rem):
            """Fold staging records ``rc - rem .. rc - 1`` into the dense
            stage row they belong to (all <= 16 share one row because
            _REC_PER_ROW == the group size); shared by the in-loop group
            boundary and the final partial flush."""
            s1l = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
            f_sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
            folded = jnp.zeros((1, _LANE), jnp.int32)
            for rr in range(_REC_PER_ROW):
                bl = _REC_WORDS * rr
                seg = (s1l >= bl) & (s1l < bl + 6) & (rem > rr)
                folded = jnp.where(
                    seg, pltpu.roll(astage[rr:rr + 1], bl, axis=1), folded
                )
            srow = ((rc - rem) % _REC_STAGE) // _REC_PER_ROW
            stage[:] = jnp.where(
                f_sub == srow,
                jnp.broadcast_to(folded, (_SUB, _LANE)),
                stage[:],
            )
    elif emit in ("sparse", "mxu"):
        (recs_out, np_out, nrec_out, ovf_out,
         a_f, a_i, w_f, w_i, stage, foldbuf, state, sems) = refs

        def fold_stage(fidx, win=0):
            # Butterfly fold: the (32, 128) staging block (one record per
            # row, lanes 0:8, rest stale) -> 2 dense 16-record rows, in 4
            # static roll+select steps.  Step k pairs rows at pitch 2^k:
            # the odd row's record block (lanes [0, 8*2^k), valid by
            # induction) rolls up by the pitch and right by 8*2^k lanes
            # into the even row; after step 3 rows 0 and 16 are the two
            # dense rows.  Stale lanes never leak: each step copies
            # exactly the source row's valid block (words 6:7 of each
            # record ride along as garbage — the decode reads words 0:6
            # only).  A flat 32-select chain was tried first and
            # SEGFAULTED XLA:CPU's compiler when the kernel was inlined
            # into the fused pipeline (interpret mode) — keep fold chains
            # log-depth.
            f_sub = jax.lax.broadcasted_iota(
                jnp.int32, (_SREC_STAGE, _LANE), 0
            )
            f_lane = jax.lax.broadcasted_iota(
                jnp.int32, (_SREC_STAGE, _LANE), 1
            )
            # ``win`` selects a completed 32-row block (the mxu layouts
            # place a whole window step's records at once, so up to
            # stream_batch/4 blocks can complete in one step)
            x = stage[_SREC_STAGE * win:_SREC_STAGE * (win + 1)]
            for k in range(4):  # pitch 1,2,4,8 rows; width 8,16,..,64 lanes
                pitch = 1 << k
                width = _REC_WORDS << k
                rolled = pltpu.roll(
                    pltpu.roll(x, _SREC_STAGE - pitch, axis=0),
                    width, axis=1,
                )
                seg = (
                    (f_sub % (2 * pitch) == 0)
                    & (f_lane >= width) & (f_lane < 2 * width)
                )
                x = jnp.where(seg, rolled, x)
            fb_sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
            fb = foldbuf[:]
            half = _SREC_STAGE // 2
            fb = jnp.where(
                fb_sub == _SREC_FOLD_ROWS * fidx,
                jnp.broadcast_to(x[0:1], (_SUB, _LANE)), fb,
            )
            fb = jnp.where(
                fb_sub == _SREC_FOLD_ROWS * fidx + 1,
                jnp.broadcast_to(x[half:half + 1], (_SUB, _LANE)), fb,
            )
            foldbuf[:] = fb
    else:
        (pairs_out, np_out, nt_out, ovf_out,
         a_f, a_i, w_f, w_i, stage, state, sems) = refs
    t = tile0_ref[0, 0] + pl.program_id(0)
    n = n_ref[0, 0]
    # static clamp for the stream start: an all-padding subtile (a shard's
    # trailing tiles) has min(a_pos) = +big; clamping keeps the window
    # preload in bounds while the stream loop's `j < n` test still makes it
    # a no-op (the packing always pads two windows past the real boxes)
    total_rows = bf_hbm.shape[1]
    j_clamp = total_rows * _LANE - 2 * _WIN

    @pl.when(pl.program_id(0) == 0)
    def _():
        state[0] = 0
        state[1] = 0
        state[2] = 0


    # load the subtile (one DMA per dtype)
    a_dma = pltpu.make_async_copy(
        bf_hbm.at[:, pl.ds(t * _SUB, _SUB), :], a_f, sems.at[0]
    )
    a_dma.start()
    ai_dma = pltpu.make_async_copy(
        bi_hbm.at[:, pl.ds(t * _SUB, _SUB), :], a_i, sems.at[1]
    )
    ai_dma.start()
    a_dma.wait()
    ai_dma.wait()

    a_mmax = a_f[_MAJ_MAX]
    a_mmin = a_f[_MAJ_MIN] if any_order else None
    # padding rows carry -big, so the max is over real subtile boxes
    a_reach = jnp.max(a_mmax)
    a_pos = a_i[_POS]  # sorted-order positions (+big on padding)
    # the partner stream starts just past the subtile's earliest box,
    # rounded down to keep the stream batches aligned (rounding down only
    # re-tests partners the ``a_pos < jabs`` direction filter rejects)
    j0 = jnp.minimum(
        (jnp.min(a_pos) + 1) // stream_batch * stream_batch,
        jnp.int32(j_clamp),
    )
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    flatpos = sub_iota * _LANE + lane_iota  # a-box index within subtile
    s_sub = sub_iota
    s_lane = lane_iota
    if emit in ("records", "sparse"):
        _shl = jnp.int32(1) << (s_lane % 32)  # lane -> its mask-word bit

    a_min0, a_min1 = a_f[_MIN0], a_f[_MIN1]
    a_max0, a_max1 = a_f[_MAX0], a_f[_MAX1]
    a_v0, a_v1, a_v2 = a_i[_V0], a_i[_V1], a_i[_V2]
    a_eid = a_i[_EID]
    # subtile union of the first minor axis (padding carries inverted
    # bounds, so the reduction sees real boxes only) — the row-skip bound
    a_umin0 = jnp.min(a_min0)
    a_umax0 = jnp.max(a_max0)

    def load_window(base_row):
        wf = pltpu.make_async_copy(
            wf_hbm.at[:, pl.ds(base_row, _SUB), :], w_f, sems.at[2]
        )
        wf.start()
        wi = pltpu.make_async_copy(
            wi_hbm.at[:, pl.ds(base_row, _SUB), :], w_i, sems.at[3]
        )
        wi.start()
        wf.wait()
        wi.wait()
        if any_order:
            # window-level minor-union skip flag (state[3]): when the whole
            # 1024-partner window's first-minor union misses the subtile's,
            # the stream jumps a full window per iteration instead of a row.
            # The unions are precomputed planes (broadcast per window) so
            # this is two scalar SMEM reads — Mosaic rejects vector reduces
            # from SMEM on hardware.  row_dead subsumes the per-row gating;
            # this flag only widens the jump.
            wmin = w_f[_WINUMIN, 0, 0]
            wmax = w_f[_WINUMAX, 0, 0]
            state[3] = jnp.where(
                (wmin > a_umax0) | (wmax < a_umin0), jnp.int32(1), jnp.int32(0)
            )

    def flush(count):
        """DMA the 1024-pair stage to the HBM buffer at the write pointer.

        Mid-run flushes happen exactly when the running collected count
        crosses a _STAGE boundary, so the write pointer (count, clamped)
        advances in 1024-pair steps and stays row-aligned; the final flush
        writes the full stage once more (rows past the tail are garbage —
        the buffer has a stage of slack) without moving past the count.
        """
        wp = state[0]
        fits = wp + count <= jnp.int32(budget)
        state[2] = jnp.where(fits, state[2], 1)

        @pl.when(fits)
        def _():
            row = pl.multiple_of((wp // _LANE) // _SUB * _SUB, _SUB)
            out_dma = pltpu.make_async_copy(
                stage,
                pairs_out.at[:, pl.ds(row, _SUB), :],
                sems.at[2],
            )
            out_dma.start()
            out_dma.wait()

        state[0] = jnp.where(fits, wp + count, wp)

    # --- partner stream ----------------------------------------------------
    # j = first index of an 8-partner batch; window holds [wbase, +_WIN).
    # Batching amortizes loop/branch overhead and, crucially, the per-
    # partner cross-lane reduction: one sum over (UB, 8, 128) replaces UB
    # iterations each paying their own reduction.  j stays UB-aligned
    # (batches start at the 1024-aligned p0); partners past the stream's
    # true end fail the major test on their own, so overshoot is safe.
    UB = stream_batch

    def cond(c):
        j, wbase, go = c[0], c[1], c[3]
        return (go != 0) & (j < n)

    def body(c):
        j, wbase, cnt, go = c

        # advance the window when the batch crosses it
        @pl.when(j + UB > wbase + _WIN)
        def _():
            load_window((wbase + _WIN) // _LANE)
        wbase = jnp.where(j + UB > wbase + _WIN, wbase + _WIN, wbase)

        sl = j - wbase
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (UB, 1, 1), 0)

        # j stays 8-aligned (the start rounds down, advances are +8 or to
        # 128/1024-aligned boundaries), so a batch never crosses a 128-lane
        # row: one divmod addresses all 8 partners (the per-read
        # (sl+u)//128 forms cost ~2 scalar div/mods x 72 reads per batch
        # and the compiler cannot prove them redundant without the
        # alignment invariant)
        row = sl // _LANE
        lane0 = sl % _LANE

        # scalars -> (UB, 1, 1) vector via one-hot fills (1-D vectors are
        # not representable in Mosaic, so no stack+reshape)
        def field_f(fidx):
            out = jnp.zeros((UB, 1, 1), jnp.float32)
            for u in range(UB):
                v = w_f[fidx, row, lane0 + u]
                out = jnp.where(iota_u == u, v, out)
            return out

        def field_i(fidx):
            out = jnp.zeros((UB, 1, 1), jnp.int32)
            for u in range(UB):
                v = w_i[fidx, row, lane0 + u]
                out = jnp.where(iota_u == u, v, out)
            return out

        # stop once no subtile box can reach any remaining partner: the
        # suffix-min plane makes this exact for any stream ordering
        # (under the plain major sort it IS major_min)
        b_first = w_f[_FWDMIN, row, lane0]
        go = jnp.where(b_first > a_reach, 0, go)

        # row skip: a 128-partner row whose first-minor union cannot touch
        # the subtile's union holds no surviving pair (the minor filter
        # would kill every slot) — jump the stream to the next row.  This
        # prunes nothing under the plain major sort on congested scenes
        # (rows span the whole minor extent; gated off to keep the default
        # path free of the two scalar reads) but becomes the main work
        # saver under sort_boxes(bucket_minor=True).
        if any_order:
            r_min0 = w_f[_ROWUMIN, row, 0]
            r_max0 = w_f[_ROWUMAX, row, 0]
            row_dead = (r_min0 > a_umax0) | (r_max0 < a_umin0)
            # batch skip: the same union test per 8-partner batch.  A live
            # row streams 16 batches; under bucket_minor ordering a row's
            # batches partition its minor span, so a narrow subtile union
            # overlaps only a few — two SMEM scalar reads skip the other
            # batches' full vector filter (~72 SMEM reads + ~20 vector
            # ops).  Advance stays +UB: only row_dead widens the jump.
            # The union planes are per-8-box groups; a UB=16 step is dead
            # only when BOTH of its groups are.
            bat_dead = None
            for g8 in range(UB // 8):
                b_bmin0 = w_f[_BATUMIN, row, lane0 + 8 * g8]
                b_bmax0 = w_f[_BATUMAX, row, lane0 + 8 * g8]
                g_dead = (b_bmin0 > a_umax0) | (b_bmax0 < a_umin0)
                bat_dead = g_dead if bat_dead is None else bat_dead & g_dead
        else:
            row_dead = go != go  # constant False, same trace type
            bat_dead = row_dead

        @pl.when((go != 0) & ~row_dead & ~bat_dead)
        def _():
            b_mmin = field_f(_MAJ_MIN)
            b_min0 = field_f(_MIN0)
            b_min1 = field_f(_MIN1)
            b_max0 = field_f(_MAX0)
            b_max1 = field_f(_MAX1)
            b_v0 = field_i(_V0)
            b_v1 = field_i(_V1)
            b_v2 = field_i(_V2)
            b_eid = field_i(_EID)

            a3 = lambda x: x[None]  # (8, 128) -> (1, 8, 128)  # noqa: E731
            keep = b_mmin <= a3(a_mmax)  # (UB, 8, 128) via broadcast
            if any_order:
                # under the plain major sort, position j > i implies
                # a.major_min <= b.major_max, so this direction is free;
                # under bucket_minor (or any other) ordering it must be
                # tested explicitly or phantom pairs leak through
                b_mmax = field_f(_MAJ_MAX)
                keep &= a3(a_mmin) <= b_mmax
            keep &= (a3(a_min0) <= b_max0) & (b_min0 <= a3(a_max0))
            keep &= (a3(a_min1) <= b_max1) & (b_min1 <= a3(a_max1))
            if is_two_lists:
                keep &= (a3(a_eid) >= 0) != (b_eid >= 0)
            share = (
                (a3(a_v0) == b_v0) | (a3(a_v0) == b_v1) | (a3(a_v0) == b_v2)
                | (a3(a_v1) == b_v0) | (a3(a_v1) == b_v1) | (a3(a_v1) == b_v2)
                | (a3(a_v2) == b_v0) | (a3(a_v2) == b_v1) | (a3(a_v2) == b_v2)
            )
            keep &= ~share
            # only boxes strictly before the partner pair with it (j+u > i)
            jabs = j + jax.lax.broadcasted_iota(jnp.int32, (UB, 1, 1), 0)
            keep &= a3(a_pos) < jabs

            total = jnp.sum(keep, dtype=jnp.int32)

            if count_only:
                # ablation / exact-count pass: consume the filter result
                # without extraction (state[1] returns the true pair count)
                state[1] = state[1] + total
                return
            # NOTE: a single-reduce live-partner bitmask (max over
            # axes (1,2) of keep * (1 << u)) was tried here to replace the
            # eight per-partner sums; the (UB, 1, 1) multi-axis reduction
            # fails Mosaic's layout check on hardware ("arr.size() >=
            # layout_rank") — keep the per-partner 2-D sums.

            if emit == "records":
                # Bit-record emission (PERF.md round-3): per (partner,
                # subtile-row) with survivors, pack the row's 128 keep bits
                # into 4 words via 5 static roll-adds and write the 6-word
                # record to a FIXED lane block (lanes 0:6) of the staging
                # row ``rc % 16`` — a branch-free broadcast-compare select,
                # where the original design's dynamic-slot placement needed
                # a 16-way static-shift branch per record.  Every 16
                # records the staging group folds into one dense 128-lane
                # stage row with 16 STATIC rolls; no per-survivor pops at
                # all.  The XLA side bit-ranks records per narrow batch
                # (decode_records_range); the dense layout is unchanged.
                sA_sub = jax.lax.broadcasted_iota(
                    jnp.int32, (_REC_PER_ROW, _LANE), 0
                )
                sA_lane = jax.lax.broadcasted_iota(
                    jnp.int32, (_REC_PER_ROW, _LANE), 1
                )

                @pl.when(total > 0)
                def _(sA_sub=sA_sub, sA_lane=sA_lane):
                    for u in range(UB):
                        keep_u = keep[u]
                        tot_u = jnp.sum(keep_u, dtype=jnp.int32)

                        @pl.when(tot_u > 0)
                        def _(u=u, keep_u=keep_u, tot_u=tot_u):
                            cc0 = state[1]
                            rc0 = state[0]
                            fits = (cc0 + tot_u <= jnp.int32(budget)) & (
                                rc0 + _SUB <= jnp.int32(rec_cap)
                            )
                            state[2] = jnp.where(fits, state[2], 1)

                            @pl.when(fits)
                            def _(u=u, keep_u=keep_u, tot_u=tot_u, cc0=cc0):
                                state[1] = cc0 + tot_u
                                j_abs = j + u
                                # one reduce: bit r set iff row r has any
                                # survivor (rows contribute 1<<r at most once)
                                rowmax = jnp.max(
                                    jnp.where(
                                        keep_u, jnp.int32(1) << s_sub, 0
                                    ),
                                    axis=1, keepdims=True,
                                )  # (8, 1): 1<<r or 0
                                rowbits = jnp.sum(rowmax, dtype=jnp.int32)
                                for r in range(_SUB):
                                    @pl.when((rowbits >> r) % 2 == 1)
                                    def _(r=r):
                                        # row r's keep bits -> 4 words at
                                        # lanes 0/32/64/96 via 5 static
                                        # roll-adds (sum, not max: lane-31
                                        # bits are negative)
                                        vr = jnp.sum(
                                            jnp.where(
                                                keep_u & (s_sub == r), _shl, 0
                                            ),
                                            axis=0, keepdims=True,
                                        )  # (1, 128)
                                        for st_ in (1, 2, 4, 8, 16):
                                            vr = vr + pltpu.roll(
                                                vr, _LANE - st_, axis=1
                                            )
                                        rc = state[0]
                                        absrow = t * _SUB + r
                                        b16 = jnp.broadcast_to(
                                            vr, (_REC_PER_ROW, _LANE)
                                        )
                                        u16 = jnp.zeros(
                                            (_REC_PER_ROW, _LANE), jnp.int32
                                        )
                                        for g in range(4):
                                            u16 = jnp.where(
                                                sA_lane == g,
                                                pltpu.roll(
                                                    b16,
                                                    (g - 32 * g) % _LANE,
                                                    axis=1,
                                                ),
                                                u16,
                                            )
                                        u16 = jnp.where(
                                            sA_lane == 4, j_abs, u16
                                        )
                                        u16 = jnp.where(
                                            sA_lane == 5, absrow, u16
                                        )
                                        m = (
                                            sA_sub == rc % _REC_PER_ROW
                                        ) & (sA_lane < 6)
                                        astage[:] = jnp.where(
                                            m, u16, astage[:]
                                        )
                                        rc = rc + 1
                                        state[0] = rc

                                        @pl.when(rc % _REC_PER_ROW == 0)
                                        def _():
                                            fold_group(rc, _REC_PER_ROW)

                                        @pl.when(rc % _REC_STAGE == 0)
                                        def _():
                                            row8 = pl.multiple_of(
                                                (rc // _REC_STAGE - 1) * _SUB,
                                                _SUB,
                                            )
                                            dma = pltpu.make_async_copy(
                                                stage,
                                                recs_out.at[
                                                    pl.ds(row8, _SUB), :
                                                ],
                                                sems.at[2],
                                            )
                                            dma.start()
                                            dma.wait()
                return

            if emit == "mxu":
                # MXU-placed bit records: the whole 8-partner window's
                # records (one per (partner, subtile-row) with survivors,
                # <= 64) are built and PLACED IN ONE MATMUL — the branch
                # count per window step is ~5 flat, vs ~2 per record for
                # the select-placed "sparse" layout (scalar branches at
                # ~50-100 cycles are the per-record cost driver, PERF.md).
                #
                #   1. mask-pack all 64 candidate rows at once on the
                #      flattened (64, 128) keep plane (5 roll-adds + 3
                #      roll-selects, shared by every row);
                #   2. halfword-encode each row (lanes 0:6 = low 16 bits
                #      of the 6 record words, lanes 8:14 = high bits,
                #      lane 15 = live sentinel) so the f32 MXU pass is
                #      EXACT (values < 2^16 << 2^24);
                #   3. ranks by a log-step sublane prefix sum; dst row =
                #      write-base + rank (dead rows dst=-1);
                #   4. one-hot D[s, d] = (dst_s == d) and a single
                #      dot_general contracting s places every record:
                #      out[d, :] = the unique record with dst d;
                #   5. recombine halfwords, select placed rows into the
                #      96-row staging ring, fold completed 32-row blocks
                #      (<= 2 per step) with the shared butterfly, DMA the
                #      fold buffer every 4th block, shift the ring down
                #      by a static roll.
                n64 = UB * _SUB
                # staging ring: one partial 32-record block + one whole
                # window step's records (96 rows at UB=8, 160 at UB=16);
                # when it exceeds 128 the destination one-hot needs a
                # second 128-lane block (the matmul output rows = the
                # one-hot's lane dim)
                mxu_stage = _SREC_STAGE + n64
                dl = _LANE if mxu_stage <= _LANE else 2 * _LANE
                sub64 = jax.lax.broadcasted_iota(jnp.int32, (n64, _LANE), 0)
                lane64 = jax.lax.broadcasted_iota(jnp.int32, (n64, _LANE), 1)
                subd = jax.lax.broadcasted_iota(jnp.int32, (n64, dl), 0)
                laned = jax.lax.broadcasted_iota(jnp.int32, (n64, dl), 1)
                s96 = jax.lax.broadcasted_iota(
                    jnp.int32, (mxu_stage, _LANE), 0
                )
                l96 = jax.lax.broadcasted_iota(
                    jnp.int32, (mxu_stage, _LANE), 1
                )

                @pl.when(total > 0)
                def _(sub64=sub64, lane64=lane64, subd=subd, laned=laned,
                      s96=s96, l96=l96):
                    K = keep.reshape(n64, _LANE)
                    rowlive = jnp.max(
                        jnp.where(K, 1, 0), axis=1, keepdims=True
                    )  # (n64, 1)
                    live = jnp.broadcast_to(rowlive, (n64, _LANE))
                    nrec = jnp.sum(rowlive, dtype=jnp.int32)
                    cc0 = state[1]
                    rc0 = state[0]
                    fits = (cc0 + total <= jnp.int32(budget)) & (
                        rc0 + nrec <= jnp.int32(rec_cap)
                    )
                    state[2] = jnp.where(fits, state[2], 1)

                    @pl.when(fits)
                    def _(live=live, nrec=nrec, cc0=cc0, rc0=rc0):
                        state[1] = cc0 + total
                        # 1. mask words, all rows in parallel
                        shl = jnp.int32(1) << (lane64 % 32)
                        vr = jnp.where(K, shl, 0)
                        for st_ in (1, 2, 4, 8, 16):
                            vr = vr + pltpu.roll(vr, _LANE - st_, axis=1)
                        u64 = vr
                        for g in range(1, 4):
                            u64 = jnp.where(
                                lane64 == g,
                                pltpu.roll(vr, (g - 32 * g) % _LANE, axis=1),
                                u64,
                            )
                        u64 = jnp.where(lane64 == 4, j + sub64 // _SUB, u64)
                        u64 = jnp.where(
                            lane64 == 5, t * _SUB + sub64 % _SUB, u64
                        )
                        # 2. halfword planes + live sentinel
                        lo = u64 & 0xFFFF
                        hi = (u64 >> 16) & 0xFFFF
                        rh = jnp.where(lane64 < 6, lo, 0)
                        rh = rh + jnp.where(
                            (lane64 >= _REC_WORDS)
                            & (lane64 < _REC_WORDS + 6),
                            pltpu.roll(hi, _REC_WORDS, axis=1),
                            0,
                        )
                        rh = rh + jnp.where(lane64 == 15, live, 0)
                        # 3. ranks (inclusive prefix, then exclusive),
                        # computed in the destination's dl-lane domain so
                        # dst broadcasts straight into the one-hot
                        lived = jnp.broadcast_to(rowlive, (n64, dl))
                        inc = lived
                        st_ = 1
                        while st_ < n64:
                            inc = inc + jnp.where(
                                subd >= st_,
                                pltpu.roll(inc, st_, axis=0),
                                0,
                            )
                            st_ *= 2
                        dst = jnp.where(
                            lived > 0, rc0 % _SREC_STAGE + inc - lived, -1
                        )
                        # 4. one-hot placement matmuls, exact BY VALUE
                        # RANGE at the MXU's default (single-pass bf16)
                        # precision.  The default truncates f32 operands
                        # to bf16 (8-bit mantissa) ON HARDWARE — the
                        # round-4 hw-suite pair-set corruption for
                        # halfwords >= 2^8 — so the halfwords are split
                        # into bytes: integers < 2^8 are bf16-exact, the
                        # one-hot keeps one nonzero term per output, and
                        # the f32 accumulate recombines exactly.  Two
                        # single-pass matmuls replace the previous
                        # precision=HIGHEST one (its mandated multi-pass
                        # decomposition costs ~3x the MXU passes for
                        # 16-bit exactness we can get by construction).
                        df = (laned == dst).astype(jnp.float32)  # (n64, dl)
                        dn = (((0,), (0,)), ((), ()))
                        out_hi = jax.lax.dot_general(
                            df, (rh >> 8).astype(jnp.float32), dn,
                            preferred_element_type=jnp.float32,
                        )
                        out_lo = jax.lax.dot_general(
                            df, (rh & 0xFF).astype(jnp.float32), dn,
                            preferred_element_type=jnp.float32,
                        )  # (dl, 128): row = dst, lanes = halfword rec
                        oi = (
                            out_hi[:mxu_stage].astype(jnp.int32) << 8
                        ) | out_lo[:mxu_stage].astype(jnp.int32)
                        # 5. recombine + select into the staging ring
                        comb = jnp.where(
                            l96 < 6,
                            oi | (
                                pltpu.roll(oi, _LANE - _REC_WORDS, axis=1)
                                << 16
                            ),
                            0,
                        )
                        hit = jnp.broadcast_to(
                            oi[:, 15:16] > 0, (mxu_stage, _LANE)
                        )
                        stage[:] = jnp.where(hit, comb, stage[:])
                        rc = rc0 + nrec
                        state[0] = rc
                        k0 = rc0 // _SREC_STAGE
                        nf = rc // _SREC_STAGE - k0

                        def fold_k(c):
                            """Fold completed block c (rows 32c:32c+32)
                            as global block k0 + c, flushing the fold
                            buffer when it fills its 4th slot."""
                            fold_stage((k0 + c) % _SREC_FOLDS, win=c)
                            k = k0 + c + 1

                            @pl.when(k % _SREC_FOLDS == 0)
                            def _():
                                row8 = pl.multiple_of(
                                    (k // _SREC_FOLDS - 1) * _SUB, _SUB
                                )
                                dma = pltpu.make_async_copy(
                                    foldbuf,
                                    recs_out.at[pl.ds(row8, _SUB), :],
                                    sems.at[2],
                                )
                                dma.start()
                                dma.wait()

                        # up to n64/32 blocks complete per step (2 at
                        # UB=8, 4 at UB=16; at most one foldbuf DMA —
                        # consecutive k's contain one multiple of 4)
                        for nfv in range(1, n64 // _SREC_STAGE + 1):
                            @pl.when(nf == nfv)
                            def _(nfv=nfv):
                                for c in range(nfv):
                                    fold_k(c)
                                stage[:] = pltpu.roll(
                                    stage[:],
                                    mxu_stage - nfv * _SREC_STAGE,
                                    axis=0,
                                )
                return

            if emit == "sparse":
                # Sparse-staged bit records (PERF.md round-3 design): one
                # record per (partner, subtile-row) with survivors, built in
                # a full 128-lane staging row (lanes 0:6 = 4 mask words,
                # partner sorted index, absolute a-row; the rest stale).
                # ALL the mask-word packing runs ONCE per surviving partner
                # on the full (8, 128) keep plane (5 roll-adds pack every
                # row's 128 bits in parallel; 3 roll+selects lay words out
                # to lanes 1:4), so a record costs just one static row slice
                # + one sublane-compare select into the staging block — no
                # 16-way slot placement (the dense path's ~1 us/record cost
                # driver).  Every 32 records the block BULK-folds into 2
                # dense rows of the fold buffer (32 static roll+selects,
                # ~1 op/record amortized), which DMAs to HBM every 128
                # records — so HBM sees the exact "dense" layout and the
                # decode path is shared.
                sS_sub = jax.lax.broadcasted_iota(
                    jnp.int32, (_SREC_STAGE, _LANE), 0
                )

                @pl.when(total > 0)
                def _(sS_sub=sS_sub):
                    for u in range(UB):
                        keep_u = keep[u]
                        tot_u = jnp.sum(keep_u, dtype=jnp.int32)

                        @pl.when(tot_u > 0)
                        def _(u=u, keep_u=keep_u, tot_u=tot_u):
                            cc0 = state[1]
                            rc0 = state[0]
                            fits = (cc0 + tot_u <= jnp.int32(budget)) & (
                                rc0 + _SUB <= jnp.int32(rec_cap)
                            )
                            state[2] = jnp.where(fits, state[2], 1)

                            @pl.when(fits)
                            def _(u=u, keep_u=keep_u, tot_u=tot_u, cc0=cc0):
                                state[1] = cc0 + tot_u
                                # all 8 rows' mask words in parallel: after
                                # the roll-adds lane 32g of row r holds
                                # word g of row r's 128-bit survivor mask
                                vr8 = jnp.where(keep_u, _shl, 0)
                                for st_ in (1, 2, 4, 8, 16):
                                    vr8 = vr8 + pltpu.roll(
                                        vr8, _LANE - st_, axis=1
                                    )
                                u8 = vr8  # lane 0 already holds word 0
                                for g in range(1, 4):
                                    u8 = jnp.where(
                                        s_lane == g,
                                        pltpu.roll(
                                            vr8, (g - 32 * g) % _LANE, axis=1
                                        ),
                                        u8,
                                    )
                                u8 = jnp.where(s_lane == 4, j + u, u8)
                                u8 = jnp.where(
                                    s_lane == 5, t * _SUB + s_sub, u8
                                )
                                # one reduce: bit r set iff row r survives
                                rowmax = jnp.max(
                                    jnp.where(
                                        keep_u, jnp.int32(1) << s_sub, 0
                                    ),
                                    axis=1, keepdims=True,
                                )
                                rowbits = jnp.sum(rowmax, dtype=jnp.int32)
                                for r in range(_SUB):
                                    @pl.when((rowbits >> r) % 2 == 1)
                                    def _(r=r):
                                        rc = state[0]
                                        stage[:] = jnp.where(
                                            sS_sub == rc % _SREC_STAGE,
                                            jnp.broadcast_to(
                                                u8[r:r + 1],
                                                (_SREC_STAGE, _LANE),
                                            ),
                                            stage[:],
                                        )
                                        rc = rc + 1
                                        state[0] = rc

                                        @pl.when(rc % _SREC_STAGE == 0)
                                        def _(rc=rc):
                                            fold_stage(
                                                (rc // _SREC_STAGE - 1)
                                                % _SREC_FOLDS
                                            )

                                            @pl.when(rc % _REC_STAGE == 0)
                                            def _():
                                                row8 = pl.multiple_of(
                                                    (rc // _REC_STAGE - 1)
                                                    * _SUB,
                                                    _SUB,
                                                )
                                                dma = pltpu.make_async_copy(
                                                    foldbuf,
                                                    recs_out.at[
                                                        pl.ds(row8, _SUB), :
                                                    ],
                                                    sems.at[2],
                                                )
                                                dma.start()
                                                dma.wait()
                return

            @pl.when(total > 0)
            def _():
                # extract per partner: all pop-loop vector work then runs on
                # single (8, 128) planes instead of the (UB, 8, 128) batch.
                #
                # Pops emit RAW (a_slot, partner_eid): the a-side value is
                # the scalar the position reduce already produced (the
                # packed-order slot t*_TILE + pos), and the partner's
                # element id is one SMEM scalar read — so no per-pop value
                # reductions at all; element-id resolution and the emit
                # convention move to one XLA gather per narrow batch
                # (decode_pairs_ap).  Each round extracts up to TWO
                # survivors via independent min- and max-position reduces
                # (their latencies overlap, unlike sequential pops).
                base = t * _TILE
                for u in range(UB):
                    keep_u = keep[u]
                    tot_u = jnp.sum(keep_u, dtype=jnp.int32)

                    @pl.when(tot_u > 0)
                    def _(u=u, keep_u=keep_u, tot_u=tot_u):
                        b_eid_u = w_i[_EID, row, lane0 + u]

                        def pop_cond(pc):
                            return pc[0] > 0

                        def pop_body(pc):
                            remaining, keep_i, cc = pc
                            # i1 vectors cannot ride while-carries (Mosaic);
                            # the mask travels as i32
                            keepm = keep_i != 0
                            so = cc % _STAGE
                            pos_lo = jnp.min(
                                jnp.where(keepm, flatpos, jnp.int32(_TILE))
                            )
                            pos_hi = jnp.max(
                                jnp.where(keepm, flatpos, jnp.int32(-1))
                            )
                            # take the max too unless it IS the min or the
                            # second slot would cross the stage boundary
                            # (the boundary case pops it next round instead)
                            two = (pos_hi != pos_lo) & (so < _STAGE - 1)
                            sel = (flatpos == pos_lo) | (
                                two & (flatpos == pos_hi)
                            )
                            oh0 = (s_sub == so // _LANE) & (
                                s_lane == so % _LANE
                            )
                            so1 = so + 1
                            oh1 = two & (s_sub == so1 // _LANE) & (
                                s_lane == so1 % _LANE
                            )
                            stage[0] = jnp.where(
                                oh0, base + pos_lo,
                                jnp.where(oh1, base + pos_hi, stage[0]),
                            )
                            stage[1] = jnp.where(oh0 | oh1, b_eid_u, stage[1])
                            keep_i = jnp.where(sel, 0, keep_i)
                            popped = 1 + two.astype(jnp.int32)
                            cc = cc + popped

                            # stage full: burst it to the HBM pair buffer
                            @pl.when(cc % _STAGE == 0)
                            def _():
                                flush(jnp.int32(_STAGE))

                            return remaining - popped, keep_i, cc

                        cc0 = state[1]
                        _, _, cc1 = jax.lax.while_loop(
                            pop_cond, pop_body,
                            (tot_u, keep_u.astype(jnp.int32), cc0),
                        )
                        state[1] = cc1

        j_next = jnp.where(row_dead, wbase + (row + 1) * _LANE, j + UB)
        if any_order:
            j_next = jnp.where(state[3] != 0, wbase + _WIN, j_next)
        return j_next, wbase, cnt, go

    wbase0 = j0 // _WIN * _WIN
    load_window(wbase0 // _LANE)  # window containing the stream start
    jax.lax.while_loop(
        cond, body, (j0, wbase0, jnp.int32(0), jnp.int32(1))
    )

    if count_only:
        np_out[0, 0] = state[1]
        if emit == "pairs":
            nt_out[0, 0] = state[1]
        ovf_out[0, 0] = 0
        return

    if emit in ("sparse", "mxu"):
        # final flush: fold the partial staging block (if any — its rows
        # past the record tail fold in as garbage records, masked by the
        # record count downstream; for "mxu" the partial block sits at
        # ring rows [0, rc % 32) after the step-end shifts), then write
        # the whole fold buffer once more when it holds records not yet
        # DMA'd
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            rc = state[0]

            @pl.when(rc % _SREC_STAGE > 0)
            def _():
                fold_stage((rc // _SREC_STAGE) % _SREC_FOLDS)

            @pl.when(rc % _REC_STAGE > 0)
            def _():
                row8 = pl.multiple_of((rc // _REC_STAGE) * _SUB, _SUB)
                dma = pltpu.make_async_copy(
                    foldbuf, recs_out.at[pl.ds(row8, _SUB), :], sems.at[2]
                )
                dma.start()
                dma.wait()

        np_out[0, 0] = state[1]
        nrec_out[0, 0] = state[0]
        ovf_out[0, 0] = state[2]
        return

    if emit == "records":
        # final flush: fold the partial staging group (if any) into its
        # dense stage row, then write the whole stage once more (rows past
        # the record tail are stale and ignored by the masked decode)
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            rc = state[0]
            rem = rc % _REC_PER_ROW

            @pl.when(rem > 0)
            def _():
                fold_group(rc, rem)

            @pl.when(rc % _REC_STAGE > 0)
            def _():
                row8 = pl.multiple_of((rc // _REC_STAGE) * _SUB, _SUB)
                dma = pltpu.make_async_copy(
                    stage, recs_out.at[pl.ds(row8, _SUB), :], sems.at[2]
                )
                dma.start()
                dma.wait()

        np_out[0, 0] = state[1]
        nrec_out[0, 0] = state[0]
        ovf_out[0, 0] = state[2]
        return

    # final flush on the last subtile: the stage holds cc % _STAGE pairs
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        rem = state[1] % _STAGE

        @pl.when(rem > 0)
        def _():
            flush(rem)

    np_out[0, 0] = state[0]
    # exact survivor total: the pop loops run for EVERY filter survivor
    # (they are not budget-gated; only the stage flush is), so state[1]
    # is the true pair count even when the buffer overflowed — the
    # auto-budget retry sizes its second dispatch from this
    nt_out[0, 0] = state[1]
    ovf_out[0, 0] = state[2]


@functools.partial(jax.jit, static_argnames=("is_two_lists",))
def decode_pairs_ap(packed, pairs_raw, is_two_lists: bool):
    """Raw kernel pairs ``(a_slot, partner_eid)`` -> element-id pairs.

    The kernel emits the a-side as its packed-order slot (a scalar the
    position reduce produces for free) and the partner as its element id
    (one SMEM scalar read); this resolves the a-side element id with ONE
    row gather and applies the reference emit convention
    (``sweep.cu:152-164``): one-list pairs (min, max), two-list pairs
    (flip(min), max).  Rows at/past the pair count decode to garbage and
    must stay masked by the caller.  Called per narrow batch in the fused
    pipeline so the gather cost tracks candidates actually consumed.
    """
    bf, bi, wf, wi = packed
    a_flat = bi[_EID].reshape(-1)
    a_eid = a_flat[jnp.clip(pairs_raw[:, 0], 0, a_flat.shape[0] - 1)]
    b_eid = pairs_raw[:, 1]
    lo = jnp.minimum(a_eid, b_eid)
    hi = jnp.maximum(a_eid, b_eid)
    first = (-lo - 1) if is_two_lists else lo
    return jnp.stack([first, hi], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_two_lists", "budget", "interpret", "n_tiles", "raw", "count_only",
        "any_order",
    ),
)
def pallas_sweep_pairs(
    packed, n, is_two_lists: bool, budget: int, interpret: bool = False,
    tile0=None, n_tiles: int = 0, raw: bool = False,
    count_only: bool = False, any_order: bool = False,
):
    """Run the all-pairs sweep kernel over packed box planes.

    ``packed`` is the tuple from :func:`pack_boxes_ap`.  Returns
    ``(pairs, n_pairs, n_true, overflow)``: ``pairs`` is ``(PB, 2)`` int32
    with the surviving element-id pairs in rows ``[0, n_pairs)`` (order is
    deterministic but not sorted); ``n_true`` is the EXACT survivor total
    regardless of budget (the filter/pop path is not budget-gated, only
    buffer writes are); ``overflow`` True when the budget was exceeded
    (rows past ``n_pairs`` missing — the caller retries with a budget
    sized from ``n_true``, cf. the reference's memory-handler re-size
    loop, ``memory_handler.hpp``/``broad_phase.cu`` overflow retry).

    With ``raw=True`` the buffer instead holds the kernel's raw
    ``(a_slot, partner_eid)`` rows — pass them (or any row subset) through
    :func:`decode_pairs_ap`; the fused pipeline does this per narrow batch
    so the decode gather is paid once per candidate consumed, not once per
    budget row.

    ``tile0``/``n_tiles`` restrict the a-side to subtiles
    ``[tile0, tile0 + n_tiles)`` — the range shard of a multi-chip sweep
    (the reference's dead multi-GPU design shards exactly this way,
    ``_multigpu/broad_phase.cu:72-115``); the partner stream still covers
    the whole sorted array, so the union over shards of the emitted pair
    sets equals the single-chip set.  ``n_tiles`` must be static and the
    packing padded with ``pad_to_tiles`` so every shard's range stays in
    bounds; ``tile0`` may be traced (e.g. ``axis_index * n_tiles``).
    """
    bf, bi, wf, wi = packed
    n_static = bf.shape[1] * _LANE - 2 * _WIN  # upper bound on n
    if n_tiles <= 0:
        n_tiles = -(-n_static // _TILE)
    if tile0 is None:
        tile0 = jnp.int32(0)
    PBR = -(-budget // _LANE) + _SUB  # rows incl. one stage of slack

    kernel = functools.partial(
        _sweep_kernel, is_two_lists=is_two_lists, budget=budget,
        count_only=count_only, any_order=any_order,
    )
    pairs, n_pairs, n_true, ovf = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, PBR, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NF, _SUB, _LANE), jnp.float32),
            pltpu.VMEM((5, _SUB, _LANE), jnp.int32),
            pltpu.SMEM((_NF, _SUB, _LANE), jnp.float32),
            pltpu.SMEM((5, _SUB, _LANE), jnp.int32),
            pltpu.VMEM((2, _SUB, _LANE), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(n, jnp.int32).reshape(1, 1),
        jnp.asarray(tile0, jnp.int32).reshape(1, 1),
        bf, bi, wf, wi,
    )

    flat = pairs.reshape(2, PBR * _LANE)
    out = jnp.transpose(flat)
    if not raw and not count_only:
        out = decode_pairs_ap(packed, out, is_two_lists)
    return out, n_pairs[0, 0], n_true[0, 0], ovf[0, 0] != 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_two_lists", "pair_budget", "rec_budget", "interpret", "n_tiles",
        "any_order", "layout",
    ),
)
def pallas_sweep_records(
    packed, n, is_two_lists: bool, pair_budget: int, rec_budget: int = 0,
    interpret: bool = False, tile0=None, n_tiles: int = 0,
    any_order: bool = False, layout: str = "sparse",
):
    """All-pairs sweep with **bit-record** emission.

    Instead of popping survivors one by one (a ~300-500 ns/pop latency
    chain, PERF.md), the kernel writes one record per
    (partner, 128-box a-row) with any survivor: 4 mask words (one bit
    per a-lane, packed with 5 static roll-adds), the partner's sorted
    index, and the absolute a-row.  Records cost ~O(1) vector work each
    regardless of how many survivors they carry; the XLA side bit-ranks
    them per narrow batch (:func:`decode_records_range`).

    ``layout`` picks the emission scheme (identical decode, identical HBM
    layout and cost, 32 B/record):

    - ``"sparse"`` (default): mask packing amortized per surviving
      partner on the full (8, 128) plane; placing a record is one
      sublane-compare select into a full-width staging row, bulk-folded
      to the dense layout every 32 records (~1 vector op/record) — the
      cheapest per-record vector work (PERF.md round-3).
    - ``"dense"``: records packed 16 per staging row in-kernel; each
      record pays a 16-way slot placement and every 16 records a group
      fold — measured ~1 us/record, slower than pops; kept as a tested
      alternative.
    - ``"mxu"``: the whole 8-partner window's records (<= 64) placed by
      ONE one-hot ``dot_general`` on halfword-encoded rows (exact in
      f32) — ~5 scalar branches per window step instead of ~2 per
      record; built for congested scenes where emission is the frame's
      dominant cost.
    - ``"mxu16"``: the same placement over a 16-partner window step
      (<= 128 records per matmul, the placement's full candidate-row
      capacity): halves the per-step scalar-branch count per record —
      the measured record-build cost driver at congested scale (~200
      ns/record, PERF.md round 4c) — at the price of a 160-row staging
      ring and a 256-lane destination one-hot.

    Returns ``(records, n_records, n_pairs, overflow)`` where ``records``
    is the tiled ``(rec_rows, 128)`` int32 buffer — record ``r`` at
    ``[r >> 4, (r & 15) * 8 : +8]``, valid records ``[0, n_records)``;
    only :func:`records_pair_prefix` / :func:`decode_records_range`
    should index it (an ``(R, 8)`` view would tile-pad 16x in HBM).
    ``n_pairs`` is the exact surviving-pair total;
    ``overflow`` means the pair or record budget was exceeded
    (records/pairs missing — retry or fall back).  ``rec_budget``
    defaults to ``pair_budget`` (every record holds at least one pair,
    so that never overflows first).
    """
    bf, bi, wf, wi = packed
    n_static = bf.shape[1] * _LANE - 2 * _WIN
    if n_tiles <= 0:
        n_tiles = -(-n_static // _TILE)
    if tile0 is None:
        tile0 = jnp.int32(0)
    if rec_budget <= 0:
        rec_budget = pair_budget
    rec_cap = rec_budget
    # 8-row flush buffers plus one of slack for the final whole-buffer
    # flush (both layouts land the same dense 16-record/row HBM format)
    rec_rows = (-(-rec_budget // _REC_STAGE) + 1) * _SUB

    if layout not in ("sparse", "dense", "mxu", "mxu16"):
        raise ValueError(f"unknown record layout {layout!r}")
    stream_batch = 16 if layout == "mxu16" else 8
    emit = {"dense": "records", "mxu16": "mxu"}.get(layout, layout)
    kernel = functools.partial(
        _sweep_kernel, is_two_lists=is_two_lists, budget=pair_budget,
        emit=emit, rec_cap=rec_cap, any_order=any_order,
        stream_batch=stream_batch,
    )
    recs, n_pairs, n_recs, ovf = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rec_rows, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NF, _SUB, _LANE), jnp.float32),
            pltpu.VMEM((5, _SUB, _LANE), jnp.int32),
            pltpu.SMEM((_NF, _SUB, _LANE), jnp.float32),
            pltpu.SMEM((5, _SUB, _LANE), jnp.int32),
        ] + (
            [
                pltpu.VMEM(
                    (
                        # ring = one partial 32-record block + one whole
                        # window step's records (96 at UB=8, 160 at UB=16)
                        _SREC_STAGE + stream_batch * _SUB
                        if layout in ("mxu", "mxu16") else _SREC_STAGE,
                        _LANE,
                    ),
                    jnp.int32,
                ),
                pltpu.VMEM((_SUB, _LANE), jnp.int32),
            ]
            if layout in ("sparse", "mxu", "mxu16") else
            [
                pltpu.VMEM((_SUB, _LANE), jnp.int32),
                pltpu.VMEM((_REC_PER_ROW, _LANE), jnp.int32),
            ]
        ) + [
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(n, jnp.int32).reshape(1, 1),
        jnp.asarray(tile0, jnp.int32).reshape(1, 1),
        bf, bi, wf, wi,
    )
    # recs stays in the kernel's native (rec_rows, 128) layout: a
    # (rec_rows*16, 8) reshape looks natural but its TPU tiled layout
    # pads the 8-wide minor dim to 128 lanes — 16x the HBM (a 2^25 pair
    # budget ballooned to 17 GB and failed to compile, round-4 hw suite).
    # Record r lives at [r >> 4, (r & 15) * 8 : +8]; only
    # records_pair_prefix / decode_records_range index it.
    return recs, n_recs[0, 0], n_pairs[0, 0], ovf[0, 0] != 0


def records_pair_prefix(records, n_records):
    """Inclusive per-record pair-count prefix over a record buffer.

    Garbage rows at/past ``n_records`` (never DMA'd) are masked to zero,
    so the cumulative sum ends at the exact pair total and stays
    monotone for the binary-search decode.

    ``records`` is the tiled ``(rec_rows, 128)`` buffer (16 records of 8
    words per row; a record's pair count is the popcount of its words
    0-3).  The 8-lane group sums run as three shifted adds in the
    128-lane domain — no minor-dim-8 reshape, whose padded TPU layout
    would cost 16x the HBM.
    """
    pc = jax.lax.population_count(records)  # (rec_rows, 128)
    col = jnp.arange(_LANE, dtype=jnp.int32)
    pc = jnp.where((col % _REC_WORDS) < 4, pc, 0)
    for s in (1, 2, 4):
        pc = pc + jnp.roll(pc, -s, axis=1)
    # lane 8k now holds the word-sum of record k in its row (the roll
    # wrap only contaminates lanes > 120, never read)
    per_rec = pc[:, ::_REC_WORDS].reshape(-1)  # (rec_rows * 16,)
    rows = jnp.arange(per_rec.shape[0], dtype=jnp.int32)
    return jnp.cumsum(jnp.where(rows < n_records, per_rec, 0),
                      dtype=jnp.int32)


def decode_records_range(
    packed, records, cum, start, batch: int, n_pairs, r_lo, is_two_lists: bool
):
    """Decode pairs ``[start, start + batch)`` from bit-records.

    ``cum`` is :func:`records_pair_prefix`'s output; ``r_lo`` a lower
    bound on the first record containing pair ``start`` (monotone batch
    cursor — pass 0 for the first batch and the returned cursor after).
    The record window is resolved with the merge-based searchsorted over
    ``batch + 1`` rows (consecutive pair indices touch at most ``batch``
    records since every record holds >= 1 pair), then each pair bit-ranks
    its record's 128-bit mask.  Returns ``(chunk, new_r_lo)`` with
    ``chunk`` (batch, 2) element-id pairs in the reference emit
    convention; rows at/past ``n_pairs`` are garbage (mask downstream).
    """
    from scalable_ccd_tpu.ops import searchsorted_sorted

    bf, bi, wf, wi = packed
    R = records.shape[0] * _REC_PER_ROW  # tiled (rec_rows, 128) buffer
    p = start + jnp.arange(batch, dtype=jnp.int32)
    valid = p < n_pairs

    r_lo_c = jnp.clip(r_lo, 0, jnp.maximum(R - batch - 1, 0))
    cum_win = jax.lax.dynamic_slice_in_dim(cum, r_lo_c, batch + 1)
    r = r_lo_c + searchsorted_sorted(cum_win, p, side="right").astype(jnp.int32)
    r_c = jnp.minimum(r, R - 1)
    excl = jnp.where(r_c > 0, cum[jnp.maximum(r_c - 1, 0)], 0)
    k = p - excl  # k-th set bit of this record
    chunk = _decode_record_bits(packed, records, r_c, k, is_two_lists)
    new_r_lo = jnp.max(jnp.where(valid, r_c, r_lo_c))
    return chunk, new_r_lo


def _decode_record_bits(packed, records, r_c, k, is_two_lists: bool):
    """Decode the ``k``-th set bit of record ``r_c`` (both (batch,) i32)
    to a (batch, 2) element-id pair row in the reference emit
    convention.  Shared by the range decode above and the uniform record
    sampler below."""
    bf, bi, wf, wi = packed
    # record r_c lives at [r_c >> 4, (r_c & 15) * 8 : +8] of the tiled
    # buffer: one (batch, 128) row gather (~10 ns/row regardless of
    # width, PERF.md).  The 8-word extraction is a STATIC 16-way select
    # chain, NOT take_along_axis: per-row dynamic LANE indexing is a
    # cross-lane permute that XLA:TPU lowers catastrophically (measured
    # ~190 ns/pair decode — ~5x the row-gather law — with the
    # take_along_axis form; the whole-budget variant hit a slow path
    # worth +4.6 s/frame, hw_narrow_order round 5).  16 masked adds on
    # (batch, 8) lanes are pure VPU elementwise work.
    rec_rows_g = records[r_c >> 4]  # (batch, 128)
    word_pos = r_c & (_REC_PER_ROW - 1)
    rec = jnp.zeros((r_c.shape[0], _REC_WORDS), records.dtype)
    for c in range(_REC_PER_ROW):
        sel = (word_pos == c)[:, None]
        rec = rec + jnp.where(
            sel, rec_rows_g[:, c * _REC_WORDS:(c + 1) * _REC_WORDS], 0
        )

    w = rec[:, 0:4]
    c0 = jax.lax.population_count(w[:, 0])
    c01 = c0 + jax.lax.population_count(w[:, 1])
    c012 = c01 + jax.lax.population_count(w[:, 2])
    g = (
        (k >= c0).astype(jnp.int32)
        + (k >= c01).astype(jnp.int32)
        + (k >= c012).astype(jnp.int32)
    )
    word = jnp.where(
        g == 0, w[:, 0],
        jnp.where(g == 1, w[:, 1], jnp.where(g == 2, w[:, 2], w[:, 3])),
    )
    kk = k - jnp.where(
        g == 0, 0, jnp.where(g == 1, c0, jnp.where(g == 2, c01, c012))
    )
    # kk-th set bit of the 32-bit word (vectorized rank walk)
    bitidx = jnp.zeros_like(kk)
    cnt = jnp.zeros_like(kk)
    uw = word
    for b in range(32):
        bit = (uw >> b) & 1
        bitidx = jnp.where((bit == 1) & (cnt == kk), b, bitidx)
        cnt = cnt + bit
    lane = g * 32 + bitidx
    a_slot = rec[:, 5] * _LANE + lane
    j = rec[:, 4]

    a_flat = bi[_EID].reshape(-1)
    b_flat = wi[_EID].reshape(-1)
    a_eid = a_flat[jnp.clip(a_slot, 0, a_flat.shape[0] - 1)]
    b_eid = b_flat[jnp.clip(j, 0, b_flat.shape[0] - 1)]
    lo = jnp.minimum(a_eid, b_eid)
    hi = jnp.maximum(a_eid, b_eid)
    first = (-lo - 1) if is_two_lists else lo
    return jnp.stack([first, hi], axis=1)


def sample_first_pairs(
    packed, records, cum, n_records, batch: int, is_two_lists: bool
):
    """One (batch, 2) chunk sampled uniformly across the record stream:
    record ``floor(i * n_records / batch)``, its FIRST pair.  Returns
    ``(chunk, valid)``.

    Records are emitted in sweep order, so a uniform record stride
    covers every contact region of the scene; solving this chunk before
    the sequential batch loop settles the running TOI near its final
    value and later batches root-prune (the reference's live global toi,
    ``narrow_phase.cu:136-195``, made effective from batch one).
    Duplicate coverage with the main loop is harmless — the global TOI
    is a min over per-pair values.  No searchsorted: the sampled pair's
    record index is known and its in-record rank is 0 by construction.
    """
    R = records.shape[0] * _REC_PER_ROW
    i = jnp.arange(batch, dtype=jnp.int32)
    nr = jnp.clip(n_records, 0, R)
    # floor(i * nr / batch) without i32 overflow (i*nr can reach 2^38)
    r_s = i * (nr // batch) + (i * (nr % batch)) // batch
    valid = i < nr
    r_c = jnp.clip(r_s, 0, jnp.maximum(nr - 1, 0))
    chunk = _decode_record_bits(
        packed, records, r_c, jnp.zeros_like(i), is_two_lists
    )
    return chunk, valid
