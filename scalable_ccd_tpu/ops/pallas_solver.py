"""Pallas TPU kernel: tight-inclusion root-finder, per-query in-VMEM DFS.

Hardware kernel for the narrow phase's hot loop, replacing the XLA
stack-queue solver (:func:`scalable_ccd_tpu.narrow_phase.bfs.find_roots_bfs`)
on the global-mode fast path.  The reference's equivalent is ``ccd_kernel``
(``src/scalable_ccd/cuda/narrow_phase/root_finder.cu:277-370``): one CUDA
thread per (t,u,v) domain pulled from a global ring buffer, ``atomicMin`` on
the shared TOI.  The XLA formulation pays ~2 HBM row-gathers per domain
evaluation (query-data fetch + compaction permute, ~10 ns each — measured,
PERF.md), which bounds it to ~22 ns/eval.  This kernel keeps everything in
VMEM:

- Each grid step owns a block of ``8*128`` queries laid out as the VPU's
  native ``(8, 128)`` vector registers; all per-query state (current domain,
  stack pointer, flags) lives in vector registers / VMEM.
- Each query runs its own depth-first bisection with a **value-free
  compressed stack**: descending into a child modifies exactly one domain
  bound to the midpoint, and because every bound is a dyadic rational
  (``k/2^m``, the domain starts at [0,1]^3 and is only ever bisected), the
  replaced parent bound is reconstructed exactly on unwind from the child
  bounds alone — ``H = 2*hi - lo`` (left child) / ``L = 2*lo - hi``
  (right child), exact in f32 while the per-dim split depth stays <= 24
  (numerators stay below 2^25, and a single subtraction whose exact result
  is representable is exact).  A stack level therefore stores only a
  4-bit nibble {split dim, side, pending-sibling flag}: 64 levels = 256
  bits = 8 i32 planes held in vector registers and shifted by constants —
  no VMEM stack arrays and no per-level one-hot addressing at all (the
  previous formulation's unrolled 64-level select chains were ~10x the
  cost of the interval arithmetic itself).  A packed per-dim split
  counter enforces the <= 24 exactness bound; exceeding it conservative-
  accepts exactly like stack overflow (f32 cannot usefully resolve
  intervals below 2^-24 of the unit domain anyway).
- The running TOI is shared at three scopes, mirroring the reference's
  ``atomicMin`` visibility: lanes of a block share it every round; blocks
  share it through an SMEM scratch accumulator that persists across the
  sequential grid; batches share it through ``toi_init``.
- Conservative-accept on stack overflow and on the round cap (the
  reference's overflow protocol, ``narrow_phase.cu:146-195``, collapsed to
  "report an earlier time, never drop"): a per-lane running minimum of all
  pending siblings' earliest times makes the round-cap accept safe.

Acceptance conditions, feasibility culls, tolerance/error semantics are
identical to ``find_roots`` / ``find_roots_bfs`` (and to ``ccd_kernel``,
``root_finder.cu:311-368``); tolerances and error bounds are computed once
in XLA and shipped in the packed query rows.  All three reference modes
run on hardware: the global fast path, the exact per-query TOI_PER_QUERY
mode (per-lane TOI plane output, own-TOI pruning), and the bounded
iteration count (per-lane check counters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scalable_ccd_tpu.narrow_phase.types import (
    CCDQueries,
    compute_tolerance,
    numerical_error_bound,
)

__all__ = ["pallas_find_roots", "PALLAS_SOLVER_BLOCK", "SOLVER_BLOCK_SUB"]

#: queries per grid step: ``block_sub`` sublane rows of one 128-lane
#: vreg plane each.  8 sublanes = one native (8, 128) f32 vreg; larger
#: blocks amortize the while-loop round overhead (the cond's any-reduce,
#: scalar bookkeeping, SMEM TOI traffic) over more lanes at the price of
#: a slightly larger per-block worst-lane round count — the sweet spot
#: is measured on hardware (tools/hw_solver_block.py).
_SUB, _LANE = 8, 128
PALLAS_SOLVER_BLOCK = _SUB * _LANE

#: hardware-tuned ``block_sub`` the pipelines pass (tools/hw_solver_block.py,
#: v5e, 41k-query bench solve): 16 sublanes edges out 8 at every round
#: limit (25.1 vs 25.6 ms at rl=64) and clearly wins unbounded (26.2 vs
#: 33.5 ms — twice the lanes halve the sequential block count and the
#: per-round scalar overhead per query); 32 is flat-to-worse (vreg
#: pressure).  ``pallas_find_roots`` itself defaults to the native-vreg 8
#: so kernel-level tests exercise the canonical layout.
SOLVER_BLOCK_SUB = 16

#: per-lane DFS depth; deeper pushes conservative-accept (tol=1e-6 needs
#: ~60 levels worst case across 3 dims; 64 covers it, and overflow is safe)
_DEPTH = 64

#: round cap per block — a runaway backstop only.  It must be effectively
#: unreachable: the cap's conservative accept falls back on the monotone
#: pending-sibling minimum, which is ~0 for any lane that split in u/v
#: near t=0, so a capped block collapses the global TOI toward 0 (sound
#: but useless).  The DFS terminates on its own (depth-overflow accepts
#: bound the tree), so the cap only guards against infinite loops from
#: bugs, matching the reference's unbounded max_iter default.
_MAX_ROUNDS = 1 << 20

# stack-nibble bit layout (4 bits per level)
_DIM_MASK = 3
_SIDE_HI = 4  # set: the replaced value was the old *upper* bound of `dim`
_PENDING = 8  # set: a sibling (child2) is still to be explored

#: per-dim split-depth cap: bounds at depth m are k/2^m with k <= 2^m, so
#: the midpoint sum (k1 + k2 <= 2^(m+1)) and the unwind reconstruction
#: (2*hi - lo) stay exactly representable in f32's 24-bit mantissa for
#: m <= 23; the 24th split is the last exact one and deeper requests
#: conservative-accept (below 2^-24 of the unit domain f32 cannot
#: usefully resolve the interval anyway — the XLA twins' mids degenerate
#: to a bound at the same scale and accept too)
_DIM_CAP = 24


def _solver_kernel(
    qp_ref,      # (31, 8, 128) f32 packed queries for this block
    valid_ref,   # (8, 128) i32 validity mask
    toi0_ref,    # (1, 1) f32 SMEM: initial TOI bound for the whole call
    cotol_ref,   # (1, 1) f32 SMEM: co-domain tolerance
    *refs,       # outputs then scratch; see below
    is_vf: bool,
    allow_zero_toi: bool,
    per_query: bool,
    max_iterations: int,
    round_limit: int = -1,
    sub: int = _SUB,
):
    """One grid step = one 1024-query block.

    ``per_query`` is the reference's ``SCALABLE_CCD_TOI_PER_QUERY`` build
    (``root_finder.cu:293-298,324-326``): every lane prunes only against
    its OWN running TOI and an exact per-lane TOI plane is written out —
    the global bound is still reported but never used to prune, so each
    pair's time is exact.  ``max_iterations >= 0`` drops (never accepts)
    domains past the per-lane check count, matching the reference's
    bounded mode (``root_finder.cu:303-305`` returns without accepting).

    ``round_limit >= 0`` is the staged-escalation bounded pass: the block
    loop stops after that many rounds and lanes still mid-search are
    reported in a per-lane ``unfin`` output plane INSTEAD of taking the
    round-cap conservative accept — the caller re-solves exactly those
    lanes (compacted across blocks) in a second unbounded call, so a
    block never waits ``max_lane_rounds`` when the straggler tail can be
    pooled.  Only meaningful with ``per_query=False``.
    """
    # per_query + round_limit is rejected here (not just in the public
    # wrapper): the epilogue below would otherwise reference the unbound
    # pq_out_ref at trace time
    assert not (round_limit >= 0 and per_query)
    if round_limit >= 0:
        (toi_out_ref, ovf_out_ref, checks_out_ref, unfin_out_ref,
         toi_run) = refs
    elif per_query:
        (toi_out_ref, ovf_out_ref, checks_out_ref, pq_out_ref,
         toi_run) = refs
    else:
        (toi_out_ref, ovf_out_ref, checks_out_ref, toi_run) = refs
    # 4-bit stack nibbles, newest in the low bits of plane 0
    n_path = max(1, -(-_DEPTH // 8))

    @pl.when(pl.program_id(0) == 0)
    def _():
        toi_run[0, 0] = toi0_ref[0, 0]

    q = [qp_ref[0, i] for i in range(31)]  # 31 planes of (8, 128)
    # field order matches the packing in pallas_find_roots below
    p = q[0:24]   # p0s xyz, p1s, p2s, p3s, p0e, p1e, p2e, p3e
    tol = q[24:27]
    err = q[27:30]
    ms = q[30]
    co_tol = cotol_ref[0, 0]
    eps = jnp.finfo(jnp.float32).eps
    uv_limit = jnp.float32(1.0) / (jnp.float32(1.0) - eps)
    inf = jnp.float32(jnp.inf)

    def corners_minmax(lo, hi):
        """min/max of F over the 8 corners of the (t,u,v) box, per xyz dim.

        Same association order as ``domain_corners``
        (``narrow_phase/types.py``) so rounding matches the XLA solvers.
        """
        cmin = [None] * 3
        cmax = [None] * 3
        for t in (lo[0], hi[0]):
            # lerp the four points at this t corner
            lerp = []
            for pi in range(4):
                for d in range(3):
                    ps = p[3 * pi + d]
                    pe = p[12 + 3 * pi + d]
                    lerp.append((pe - ps) * t + ps)
            for d in range(3):
                p0, p1_, p2, p3 = lerp[d], lerp[3 + d], lerp[6 + d], lerp[9 + d]
                if is_vf:
                    a = p2 - p1_   # t1 - t0
                    b = p3 - p1_   # t2 - t0
                    for u in (lo[1], hi[1]):
                        for v in (lo[2], hi[2]):
                            f = p0 - a * u - b * v - p1_
                            cmin[d] = f if cmin[d] is None else jnp.minimum(cmin[d], f)
                            cmax[d] = f if cmax[d] is None else jnp.maximum(cmax[d], f)
                else:
                    a = p1_ - p0   # a1 - a0
                    b = p3 - p2   # b1 - b0
                    for u in (lo[1], hi[1]):
                        for v in (lo[2], hi[2]):
                            f = (a * u + p0) - (b * v + p2)
                            cmin[d] = f if cmin[d] is None else jnp.minimum(cmin[d], f)
                            cmax[d] = f if cmax[d] is None else jnp.maximum(cmax[d], f)
        return cmin, cmax

    valid = valid_ref[0] != 0

    def body(state):
        (lo0, lo1, lo2, hi0, hi1, hi2, sp, cur_ok_i, pend_min, toi_blk,
         tpq, checks_lane, checks, ovf_i) = state[: 14]
        path = list(state[14: 14 + n_path])
        dimcnt = state[14 + n_path]
        rounds = state[-1]
        # Mosaic cannot carry i1 vectors through scf.while — flags ride as i32
        cur_ok = cur_ok_i != 0
        lo = (lo0, lo1, lo2)
        hi = (hi0, hi1, hi2)

        if per_query:
            # exact mode: each lane prunes only against its own TOI
            # (root_finder.cu:297 under TOI_PER_QUERY)
            bound = tpq
        else:
            bound = jnp.minimum(toi_blk, toi_run[0, 0])
        min_t = lo0
        pruned = min_t >= bound
        active = cur_ok
        if max_iterations >= 0:
            # the reference compares the pre-increment per-query counter and
            # DROPS past the cap (root_finder.cu:289,303-305 — no accept)
            pruned = pruned | (checks_lane > max_iterations)
        checks_lane = checks_lane + active.astype(jnp.int32)
        checks = checks + jnp.sum(active, dtype=jnp.int32)

        cmin, cmax = corners_minmax(lo, hi)
        miss = jnp.zeros_like(active)
        box_in = jnp.ones_like(active)
        true_tol = jnp.float32(0.0)
        for d in range(3):
            miss = miss | (cmin[d] - ms > err[d]) | (cmax[d] + ms < -err[d])
            box_in = box_in & ~((cmin[d] + ms < -err[d]) | (cmax[d] - ms > err[d]))
            true_tol = jnp.maximum(true_tol, cmax[d] - cmin[d])
        true_tol = jnp.maximum(true_tol, 0.0)
        hit = ~miss

        w = [hi[d] - lo[d] for d in range(3)]
        if allow_zero_toi:
            pos_ok = jnp.ones_like(active)
        else:
            pos_ok = min_t > 0
        cond1 = (w[0] <= tol[0]) & (w[1] <= tol[1]) & (w[2] <= tol[2])
        cond2 = box_in & pos_ok
        cond3 = (true_tol <= co_tol) & pos_ok

        # split dim: argmax of widths/tol, first index on ties
        r = [w[d] / tol[d] for d in range(3)]
        d0 = (r[0] >= r[1]) & (r[0] >= r[2])
        d1 = ~d0 & (r[1] >= r[2])
        split = jnp.where(d0, 0, jnp.where(d1, 1, 2))
        s_lo = jnp.where(d0, lo0, jnp.where(d1, lo1, lo2))
        s_hi = jnp.where(d0, hi0, jnp.where(d1, hi1, hi2))
        mid = (s_lo + s_hi) * jnp.float32(0.5)
        degenerate = (s_lo >= mid) | (mid >= s_hi)

        live = active & ~pruned & hit
        accept = live & (cond1 | cond2 | cond3 | degenerate)
        want_split = live & ~accept
        # split-dim depth so far (packed 8-bit counters: dims 0/1/2 in
        # bits 0-7/8-15/16-23) — past _DIM_CAP the dyadic reconstruction
        # below could round, so treat it exactly like a full stack
        cnt_d = jnp.where(
            d0, dimcnt & 255,
            jnp.where(d1, (dimcnt >> 8) & 255, (dimcnt >> 16) & 255),
        )
        stack_full = (sp >= _DEPTH) | (cnt_d >= _DIM_CAP)
        ovf_now = want_split & stack_full
        accept = accept | ovf_now          # conservative accept
        do_split = want_split & ~stack_full
        ovf_i = ovf_i | jnp.any(ovf_now).astype(jnp.int32)

        acc_t = jnp.where(accept, min_t, inf)
        toi_blk = jnp.minimum(toi_blk, jnp.min(acc_t))
        tpq = jnp.minimum(tpq, acc_t)

        # ---- split lanes: save the replaced upper bound, descend child1 --
        is_t = split == 0
        if is_vf:
            other = jnp.where(split == 1, lo2, lo1)
            push2_ok = (is_t & (mid <= bound)) | (
                ~is_t & ((mid + other) <= uv_limit)
            )
        else:
            push2_ok = ~is_t | (mid <= bound)
        meta = split + jnp.where(push2_ok, _SIDE_HI | _PENDING, _SIDE_HI)
        # push: shift the 4-bit nibble chain left through the path planes
        # (register ops only — no VMEM stack, no one-hot depth addressing)
        carry = meta
        for k in range(n_path):
            top = jax.lax.shift_right_logical(path[k], jnp.int32(28))
            path[k] = jnp.where(do_split, (path[k] << 4) | carry, path[k])
            carry = top
        dimcnt = dimcnt + jnp.where(
            do_split,
            jnp.where(d0, 1, jnp.where(d1, 1 << 8, 1 << 16)),
            0,
        )
        # pending child2's earliest time: mid if the split dim is t, else lo_t
        child2_t = jnp.where(split == 0, mid, lo0)
        pend_min = jnp.where(do_split & push2_ok,
                             jnp.minimum(pend_min, child2_t), pend_min)
        hi0 = jnp.where(do_split & (split == 0), mid, hi0)
        hi1 = jnp.where(do_split & (split == 1), mid, hi1)
        hi2 = jnp.where(do_split & (split == 2), mid, hi2)
        sp = sp + do_split.astype(jnp.int32)

        # ---- finished lanes unwind (up to 2 levels per round) ------------
        # a lane unwinds if its current domain just completed (accept,
        # prune, or miss) or if it was already mid-unwind from an earlier
        # round (cur_ok False but stack nonempty)
        finish = active & (pruned | ~hit | accept)
        cur_ok = cur_ok & ~finish  # splitters keep their child1 current
        unwind = finish | (~cur_ok & (sp > 0))
        for _ in range(2):
            can = unwind & (sp > 0)
            m = path[0] & 15  # newest nibble (garbage off-mask, gated below)
            dim = m & _DIM_MASK
            side_hi = (m & _SIDE_HI) != 0
            pending = (m & _PENDING) != 0
            old_hi = jnp.where(dim == 0, hi0, jnp.where(dim == 1, hi1, hi2))
            old_lo = jnp.where(dim == 0, lo0, jnp.where(dim == 1, lo1, lo2))
            # reconstruct the replaced parent bound from the child bounds:
            # left child [L, mid] of [L, H] -> H = 2*mid - L; right child
            # [mid, H] of [L, H] -> L = 2*mid - H.  Exact in f32: every
            # bound is k/2^m with m <= _DIM_CAP (the split guard), so the
            # exact result is representable and one subtraction rounds to
            # it (the reason the stack needs no value words at all)
            val = jnp.where(
                side_hi,
                jnp.float32(2.0) * old_hi - old_lo,
                jnp.float32(2.0) * old_lo - old_hi,
            )
            r_hi = can & side_hi
            r_lo = can & ~side_hi
            hi0 = jnp.where(r_hi & (dim == 0), val, hi0)
            hi1 = jnp.where(r_hi & (dim == 1), val, hi1)
            hi2 = jnp.where(r_hi & (dim == 2), val, hi2)
            lo0 = jnp.where(r_lo & (dim == 0), val, lo0)
            lo1 = jnp.where(r_lo & (dim == 1), val, lo1)
            lo2 = jnp.where(r_lo & (dim == 2), val, lo2)
            # enter the pending sibling: its lower bound is the old upper
            # bound (the mid); rewrite the nibble to a non-pending LO entry
            # (on its later unwind, L = 2*lo - hi restores the parent)
            enter = can & pending & side_hi
            lo0 = jnp.where(enter & (dim == 0), old_hi, lo0)
            lo1 = jnp.where(enter & (dim == 1), old_hi, lo1)
            lo2 = jnp.where(enter & (dim == 2), old_hi, lo2)
            path[0] = jnp.where(enter, (path[0] & ~15) | dim, path[0])
            # non-pending: this level is fully unwound — pop the nibble
            do_pop = can & ~enter
            for k in range(n_path - 1):
                path[k] = jnp.where(
                    do_pop,
                    jax.lax.shift_right_logical(path[k], jnp.int32(4))
                    | (path[k + 1] << 28),
                    path[k],
                )
            path[n_path - 1] = jnp.where(
                do_pop,
                jax.lax.shift_right_logical(path[n_path - 1], jnp.int32(4)),
                path[n_path - 1],
            )
            dimcnt = dimcnt - jnp.where(
                do_pop,
                jnp.where(dim == 0, 1, jnp.where(dim == 1, 1 << 8, 1 << 16)),
                0,
            )
            sp = sp - do_pop.astype(jnp.int32)
            cur_ok = cur_ok | enter
            unwind = unwind & ~enter
        # lanes still unwinding (cur_ok False, sp>0) resume next round

        return (lo0, lo1, lo2, hi0, hi1, hi2, sp,
                cur_ok.astype(jnp.int32), pend_min,
                toi_blk, tpq, checks_lane, checks, ovf_i,
                *path, dimcnt, rounds + 1)

    round_cap = round_limit if round_limit >= 0 else _MAX_ROUNDS

    def cond(state):
        sp, cur_ok_i = state[6], state[7]
        rounds = state[-1]
        return jnp.any((cur_ok_i != 0) | (sp > 0)) & (rounds < round_cap)

    zero = jnp.zeros((sub, _LANE), jnp.float32)
    one = jnp.ones((sub, _LANE), jnp.float32)
    izero = jnp.zeros((sub, _LANE), jnp.int32)
    state = (
        zero, zero, zero, one, one, one,
        izero,                                          # sp
        valid.astype(jnp.int32),                        # cur_ok
        jnp.full((sub, _LANE), jnp.inf, jnp.float32),   # pend_min
        toi_run[0, 0],                                  # toi_blk
        jnp.full((sub, _LANE), jnp.inf, jnp.float32),   # tpq
        izero,                                          # checks_lane
        jnp.int32(0),                                   # checks
        jnp.int32(0),                                   # ovf
        *([izero] * n_path),                            # path nibbles
        izero,                                          # dimcnt
        jnp.int32(0),                                   # rounds (keep last)
    )
    state = jax.lax.while_loop(cond, body, state)
    lo0, sp, cur_ok_i = state[0], state[6], state[7]
    pend_min, toi_blk, tpq = state[8], state[9], state[10]
    checks, ovf_i = state[12], state[13]
    cur_ok = cur_ok_i != 0

    leftover = cur_ok | (sp > 0)
    if round_limit >= 0:
        # staged escalation: report the mid-search lanes instead of
        # folding them — the caller's second pass solves them exactly,
        # so neither the TOI nor the overflow flag absorbs the cap.
        # Sound AND exact ABSENT stack/dim-cap overflow accepts: pass-1
        # accepts are genuine subdomain accepts, and pruning only ever
        # removes domains with min_t >= the final TOI, so
        # min(pass1, pass2-from-scratch) == the unbounded result.  If an
        # overflow conservative-accept fires, its accept value depends on
        # the running-bound trajectory (which differs between the passes
        # and the single pass), so TOI/overflow may diverge — both
        # remain conservative (earlier-or-equal TOI, flag set).
        unfin_out_ref[0] = leftover.astype(jnp.int32)
    else:
        # round cap: conservative-accept whatever is still alive or
        # pending.  pend_min is monotone (never raised on pop), so it is
        # a valid lower bound for every unexplored sibling — stale-low
        # is conservative.
        left_t = jnp.where(
            cur_ok, jnp.minimum(lo0, pend_min),
            jnp.where(sp > 0, pend_min, jnp.float32(jnp.inf)),
        )
        capped = jnp.any(leftover)
        toi_blk = jnp.where(
            capped, jnp.minimum(toi_blk, jnp.min(left_t)), toi_blk
        )
        tpq = jnp.minimum(tpq, left_t)
        ovf_i = ovf_i | capped.astype(jnp.int32)

    toi_new = jnp.minimum(toi_run[0, 0], toi_blk)
    toi_run[0, 0] = toi_new
    i = pl.program_id(0)
    toi_out_ref[i, 0] = toi_new
    ovf_out_ref[i, 0] = ovf_i
    checks_out_ref[i, 0] = checks
    if per_query:
        pq_out_ref[0] = jnp.where(valid, tpq, jnp.float32(jnp.inf))


def _find_roots_packed(
    qrows,        # (Q, 31) packed query rows (see pallas_find_roots)
    valid,        # (Q,) int32
    is_vf: bool,
    toi_init,
    tolerance,
    allow_zero_toi: bool,
    interpret: bool,
    toi_per_query: bool,
    max_iterations: int,
    round_limit: int,
    block_sub: int = _SUB,
):
    """One pallas_call over pre-packed rows; the two-pass escalation in
    ``pallas_find_roots`` shares the packed array between its calls (one
    row gather instead of re-gathering every ``CCDQueries`` field)."""
    dt = jnp.float32
    block = block_sub * _LANE
    Q = qrows.shape[0]
    n_blocks = -(-Q // block)
    total = n_blocks * block
    pad = total - Q
    if pad:
        qrows = jnp.concatenate([qrows, jnp.zeros((pad, 31), dt)])
    qp = jnp.transpose(
        qrows.reshape(n_blocks, block_sub, _LANE, 31), (0, 3, 1, 2)
    )
    v = jnp.zeros((total,), jnp.int32).at[: Q].set(valid.astype(jnp.int32))
    v = v.reshape(n_blocks, block_sub, _LANE)

    toi0 = jnp.asarray(toi_init, dt).reshape(1, 1)
    cotol = jnp.asarray(tolerance, dt).reshape(1, 1)

    kernel = functools.partial(
        _solver_kernel, is_vf=is_vf, allow_zero_toi=allow_zero_toi,
        per_query=toi_per_query, max_iterations=max_iterations,
        round_limit=round_limit, sub=block_sub,
    )
    out_specs = [
        # whole-array SMEM refs: each grid step writes its own row
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_blocks, 1), dt),
        jax.ShapeDtypeStruct((n_blocks, 1), jnp.int32),
        jax.ShapeDtypeStruct((n_blocks, 1), jnp.int32),
    ]
    if round_limit >= 0 or toi_per_query:
        out_specs.append(
            pl.BlockSpec(
                (1, block_sub, _LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct(
                (n_blocks, block_sub, _LANE),
                jnp.int32 if round_limit >= 0 else dt,
            )
        )
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, 31, block_sub, _LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_sub, _LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, v, toi0, cotol)

    toi_b, ovf_b, checks_b = outs[:3]
    toi = jnp.min(toi_b)
    overflowed = jnp.any(ovf_b != 0)
    checks = jnp.sum(checks_b)
    if round_limit >= 0:
        unfin = outs[3].reshape(total)[:Q]
        return toi, overflowed, checks, unfin
    if toi_per_query:
        pq = outs[3].reshape(total)[:Q]
        toi = jnp.minimum(toi, jnp.min(pq, initial=jnp.inf))
        return toi, overflowed, checks, pq
    return toi, overflowed, checks


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_vf", "allow_zero_toi", "interpret", "toi_per_query",
        "max_iterations", "round_limit", "block_sub",
    ),
)
def pallas_find_roots(
    queries: CCDQueries,
    valid: jax.Array,
    is_vf: bool,
    toi_init,
    ms,
    tolerance,
    allow_zero_toi: bool = True,
    interpret: bool = False,
    toi_per_query: bool = False,
    max_iterations: int = -1,
    round_limit: int = -1,
    block_sub: int = _SUB,
):
    """Batched earliest-TOI solve on the TPU kernel.

    Global mode (default): same contract as ``find_roots_bfs(...,
    toi_per_query=False)`` — returns ``(toi, overflowed, total_checks)``
    where ``toi`` is min(toi_init, earliest accepted time) and overflow
    means a conservative accept was taken somewhere (result valid,
    possibly early).

    ``toi_per_query=True`` is the reference's TOI_PER_QUERY build
    (``root_finder.cu:293-298,324-326``): returns ``(toi, overflowed,
    total_checks, per_query_toi)`` with an exact ``(Q,)`` per-pair TOI
    (+inf where no contact / invalid); lanes prune only against their own
    TOI, so each entry is order-independent.

    ``max_iterations >= 0`` bounds the per-query domain-check count,
    dropping (not accepting) domains past it — the reference's bounded
    mode, a speed/accuracy knob that is NOT conservative, identical to
    the XLA solvers' semantics.

    ``round_limit >= 0`` enables **staged escalation** (global mode
    only): every block first runs at most ``round_limit`` DFS rounds; the
    lanes still mid-search — a block otherwise runs as long as its WORST
    lane — are compacted across all blocks (one stable sort + one packed
    row gather) and re-solved from scratch in a second unbounded call
    that prunes against the first pass's TOI.  A strictly-ascending
    TUPLE of limits (e.g. ``(32, 128)``) is a multi-stage ladder: each
    stage pools the previous stage's stragglers and re-solves them at
    the next limit, the final stage unbounded — deeper lanes re-pay
    their (bounded) prefix once per stage, but easy blocks retire after
    a SHORT first pass instead of idling on their worst lane.  Absent stack/dim-cap
    overflow conservative-accepts, the returned TOI is bitwise identical
    to the unbounded single-pass result (pruning only ever discards
    domains with ``min_t >=`` the final TOI), so this is a pure
    skew/latency knob; when an overflow accept does fire its value
    depends on the running-bound trajectory, so the TOI and overflow
    flag may diverge from the single pass — both stay conservative.
    The second stage is count-proportional (``lax.cond``): nothing runs
    when no lane escalates; up to one solver block of stragglers is
    pooled with a cumsum + searchsorted + K-row gather (no argsort, no
    full-grid call); only a straggler count above one block falls back
    to the full stable-sorted pass.  Remaining always-on overhead is the
    bounded pass's own ``unfin`` plane + the count reduction.
    ``total_checks`` counts both passes (a
    re-solved lane's pass-1 checks are retained, as real work done).
    Ignored in ``toi_per_query`` and bounded-``max_iterations`` modes,
    whose per-lane semantics the restart would change.

    ``block_sub`` sets the queries-per-grid-step block to
    ``block_sub * 128`` (also the escalation pool size).  Semantics are
    identical for any value — only block-TOI sharing granularity and the
    round-overhead/worst-lane-skew tradeoff move; the hardware-measured
    default lives in the pipeline (``fused.py``).
    """
    qrows = pack_query_rows(queries, is_vf, ms, tolerance)

    common = dict(
        is_vf=is_vf, toi_init=toi_init, tolerance=tolerance,
        allow_zero_toi=allow_zero_toi, interpret=interpret,
        toi_per_query=toi_per_query, max_iterations=max_iterations,
        block_sub=block_sub,
    )
    limits = _normalize_round_limits(round_limit)
    if limits and not toi_per_query and max_iterations < 0:
        return _escalate_ladder(qrows, valid, limits, common)
    return _find_roots_packed(qrows, valid, round_limit=-1, **common)


def pack_query_rows(queries: CCDQueries, is_vf: bool, ms, tolerance):
    """(Q, 31) f32 packed rows in the kernel's field order: the eight
    corner points, per-dim tolerance, per-dim error filter, ms.  The
    frame-level straggler pool stores these rows directly, so a pooled
    re-solve needs no record decode or endpoint gather."""
    dt = jnp.float32
    Q = queries.n
    ms_arr = jnp.broadcast_to(jnp.asarray(ms, dt), (Q,))
    err = jnp.where(
        jnp.any(ms_arr > 0),
        numerical_error_bound(queries, is_vf, True),
        numerical_error_bound(queries, is_vf, False),
    )
    tol = compute_tolerance(queries, is_vf, tolerance)
    return jnp.concatenate(
        [queries.p0s, queries.p1s, queries.p2s, queries.p3s,
         queries.p0e, queries.p1e, queries.p2e, queries.p3e,
         tol, err, ms_arr[:, None]],
        axis=1,
    ).astype(dt)


def pallas_find_roots_bounded(
    queries: CCDQueries,
    valid: jax.Array,
    is_vf: bool,
    toi_init,
    ms,
    tolerance,
    round_limit: int,
    allow_zero_toi: bool = True,
    interpret: bool = False,
    block_sub: int = _SUB,
):
    """One bounded global-mode pass, RAW: no in-call escalation.

    Returns ``(toi, overflowed, checks, unfin, qrows)`` — the per-lane
    ``unfin`` plane marks lanes still mid-search at ``round_limit`` (the
    kernel reports them instead of folding a conservative accept), and
    ``qrows`` is the packed (Q, 31) row array so the caller can pool
    straggler rows across MANY batches and re-solve them densely later
    (the frame-level escalation pool in ``pipeline/fused.py``) — the
    per-batch ladder in :func:`pallas_find_roots` pays its pooling glue
    per batch; this form amortizes it per frame."""
    qrows = pack_query_rows(queries, is_vf, ms, tolerance)
    toi, ovf, checks, unfin = _find_roots_packed(
        qrows, valid, is_vf=is_vf, toi_init=toi_init, tolerance=tolerance,
        allow_zero_toi=allow_zero_toi, interpret=interpret,
        toi_per_query=False, max_iterations=-1,
        round_limit=int(round_limit), block_sub=block_sub,
    )
    return toi, ovf, checks, unfin, qrows


def pallas_solve_packed(
    qrows,
    valid: jax.Array,
    is_vf: bool,
    toi_init,
    tolerance,
    allow_zero_toi: bool = True,
    interpret: bool = False,
    block_sub: int = _SUB,
):
    """Unbounded global-mode solve of pre-packed (Q, 31) rows (see
    :func:`pack_query_rows`); returns ``(toi, overflowed, checks)``.
    Used by the frame-level straggler pool's dense second pass."""
    return _find_roots_packed(
        qrows, valid, is_vf=is_vf, toi_init=toi_init, tolerance=tolerance,
        allow_zero_toi=allow_zero_toi, interpret=interpret,
        toi_per_query=False, max_iterations=-1,
        round_limit=-1, block_sub=block_sub,
    )


def _normalize_round_limits(round_limit) -> tuple:
    """``round_limit`` as a tuple of bounded-pass limits: ``-1``/``None``
    -> ``()`` (single unbounded pass), ``int >= 0`` -> one bounded stage,
    a tuple/list of ints -> a multi-stage ladder (strictly ascending, so
    each stage's re-solve prefix is bounded by the previous limit)."""
    if round_limit is None:
        return ()
    if isinstance(round_limit, (tuple, list)):
        limits = tuple(int(r) for r in round_limit)
        if not limits:
            return ()
        if any(r < 0 for r in limits):
            raise ValueError(f"negative round limit in ladder {limits!r}")
        if any(a >= b for a, b in zip(limits, limits[1:])):
            raise ValueError(
                f"escalation ladder must be strictly ascending: {limits!r}"
            )
        return limits
    return (int(round_limit),) if round_limit >= 0 else ()


def _escalate_ladder(qrows, valid, limits, common):
    """One bounded pass at ``limits[0]``, then pool the unfinished lanes
    and recurse on ``limits[1:]`` (final stage unbounded).

    Each stage is count-proportional (round-4: the always-on Q argsort +
    full-Q gather + full-grid second call cost +2.4-4.5 ms PER narrow
    batch — ~10% of a bench frame — even with zero stragglers).
    lax.cond executes exactly one branch on device:
      count == 0  -> skip: this pass's result is already the answer;
      count <= K  -> pool the stragglers (in original order, so sweep
                     locality survives) into a few solver blocks via
                     cumsum + searchsorted + a K-row gather — no argsort,
                     no full-grid call — then run the REST of the ladder
                     on the pool;
      count >  K  -> the full stable-sorted unbounded pass (pathological
                     skew; stragglers first, emptied trailing blocks
                     exit their while loop on round one).
    A pooled stage re-solves its lanes from scratch, so a multi-stage
    ladder re-pays each straggler's prefix once per stage it survives —
    the strictly-ascending limits bound that waste by the previous limit
    while letting every easy block retire at a SHORT first pass instead
    of idling until the per-block worst lane finishes (lane-occupancy
    lever, PERF.md remaining-candidate 2)."""
    block_sub = common["block_sub"]
    Q = qrows.shape[0]
    toi1, ovf1, checks1, unfin = _find_roots_packed(
        qrows, valid, round_limit=limits[0], **common
    )
    count = jnp.sum(unfin)
    # pooled-branch capacity: a few solver blocks, not just one — at
    # large narrow batches a low first limit can strand a few thousand
    # stragglers, and falling into the full argsort pass would re-pay
    # the v1 always-on overhead every batch.  The pool is dense (deep
    # lanes only), so its blocks run at high utilization regardless of
    # size.
    K = min(4 * block_sub * _LANE, -(-Q // (block_sub * _LANE))
            * (block_sub * _LANE))
    common2 = dict(common, toi_init=toi1)

    def _skip(_):
        return toi1, jnp.zeros((), bool), jnp.zeros_like(checks1)

    def _small(_):
        cum = jnp.cumsum(unfin)
        idx = jnp.searchsorted(
            cum, jnp.arange(1, K + 1, dtype=cum.dtype), side="left"
        )
        idx = jnp.minimum(idx, Q - 1)
        q2 = jnp.take(qrows, idx, axis=0)
        v2 = (jnp.arange(K, dtype=jnp.int32) < count).astype(jnp.int32)
        if len(limits) > 1:
            return _escalate_ladder(q2, v2, limits[1:], common2)
        return _find_roots_packed(q2, v2, round_limit=-1, **common2)

    def _full(_):
        order = jnp.argsort(-unfin)
        qrows2 = jnp.take(qrows, order, axis=0)
        v2 = jnp.take(unfin, order)
        return _find_roots_packed(qrows2, v2, round_limit=-1, **common2)

    toi, ovf2, checks2 = jax.lax.cond(
        count == 0,
        _skip,
        lambda op: jax.lax.cond(count <= K, _small, _full, op),
        None,
    )
    return toi, ovf1 | ovf2, checks1 + checks2
