"""Queue-based root finder — the TPU fast path.

This is the direct TPU-native analogue of the reference's narrow-phase work
queue (``ccd_buffer.cuh:7-83`` + the BFS driver loop
``root_finder.cu:431-447``): the CUDA version keeps a global ring buffer of
(t,u,v) domains, launches one thread per domain per level, and advances the
ring head with ``shift_queue_start``; the TPU version keeps a **dense
stack** of domains as structure-of-arrays and pops a fixed-size **tile**
per ``lax.while_loop`` round:

    pop the top TILE rows (one contiguous dynamic slice — no gather) ->
    evaluate the 8-corner inclusion test on the whole tile -> accept /
    prune / split -> surviving children are sort-compacted and written
    back over the popped region with one contiguous dynamic-update-slice
    -> repeat until the stack drains.

Per-round memory traffic is O(tile), and no scatters touch the stack: XLA
lowers general scatters to ~40 ns/row on TPU (serialized), while
multi-operand sorts, contiguous slices, and in-place updates run at full
throughput — see ``scalable_ccd_tpu/ops``.  Low-t children are placed
nearest the stack top, so exploration order approximates the reference
DFS's earliest-time-first descent and the global TOI bound tightens
quickly.  Work is proportional to the number of domains actually evaluated
(the reference's ``nbr_checks`` metric), NOT to queue capacity and NOT to
the worst query's work — no lane waits for a pathological neighbor (unlike
the companion depth-first solver
:func:`scalable_ccd_tpu.narrow_phase.root_finder.find_roots`, kept as the
exact-order oracle twin).

Two statically-selected modes:

- **global mode** (``toi_per_query=False``, ``max_iterations<0``): entirely
  scatter-free; queries are pruned against the running global TOI (the
  reference's default build, where ``atomicMin(toi)`` is visible to every
  thread, ``root_finder.cu:295,323``).  ``per_query_toi`` degrades to the
  global lower-bound certificate and ``overflow`` to a broadcast flag.
- **exact mode** (``toi_per_query=True`` or a finite ``max_iterations``):
  per-query TOI / check-count arrays are maintained with small scatters —
  the reference's ``SCALABLE_CCD_TOI_PER_QUERY`` build.

Overflow protocol: domains that do not fit the queue are *conservatively
accepted* (their earliest time is reported as a hit), which can only make
the reported TOI earlier — never a missed collision.  The same applies to
domains still alive at the round cap.  (The reference instead re-runs the
chunk after rebalancing, ``narrow_phase.cu:146-195``.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from scalable_ccd_tpu.narrow_phase.root_finder import RootFinderResult, _inclusion
from scalable_ccd_tpu.narrow_phase.types import (
    CCDQueries,
    compute_tolerance,
    numerical_error_bound,
)
from scalable_ccd_tpu.ops import compact_rows

__all__ = ["find_roots_bfs"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_vf",
        "max_iterations",
        "allow_zero_toi",
        "toi_per_query",
        "frontier_capacity",
        "tile",
        "max_rounds",
        "compensated",
    ),
)
def find_roots_bfs(
    queries: CCDQueries,
    valid: jax.Array,
    is_vf: bool,
    toi_init,
    ms,
    tolerance,
    max_iterations: int = -1,
    allow_zero_toi: bool = True,
    toi_per_query: bool = False,
    frontier_capacity: int = 0,
    tile: int = 0,
    max_rounds: int = 1 << 14,
    compensated: bool = False,
) -> RootFinderResult:
    """Batched earliest-TOI solve, queue formulation.

    Same contract as :func:`find_roots`; ``frontier_capacity`` (default
    ``8 * Q``) is the queue size — the analogue of the reference's
    ``MAX_UNIT_SIZE`` (``memory_handler.cpp:81-122``) — and ``tile``
    (default ``min(max(Q, 256), 65536)``) the domains evaluated per round.
    """
    dt = queries.p0s.dtype
    Q = queries.n
    F = frontier_capacity if frontier_capacity > 0 else 8 * Q
    T = tile if tile > 0 else min(max(Q, 256), 1 << 16)
    T = min(T, F)
    assert F >= Q, "queue must hold one root domain per query"
    exact = toi_per_query or max_iterations >= 0

    ms_arr = jnp.broadcast_to(jnp.asarray(ms, dt), (Q,))
    err = jnp.where(
        jnp.any(ms_arr > 0),
        numerical_error_bound(queries, is_vf, True, compensated),
        numerical_error_bound(queries, is_vf, False, compensated),
    )
    tol = compute_tolerance(queries, is_vf, tolerance)
    # one packed row per query: 8 endpoints + tol + err + ms = 31 floats.
    # Per-round per-query state is fetched with ONE row gather instead of
    # eleven (row gathers cost ~10 ms per million rows on v5e, regardless
    # of row width).
    qpack = jnp.concatenate(
        [queries.p0s, queries.p1s, queries.p2s, queries.p3s,
         queries.p0e, queries.p1e, queries.p2e, queries.p3e,
         tol, err, ms_arr[:, None]],
        axis=1,
    )  # (Q, 31)
    co_tol = jnp.asarray(tolerance, dt)
    inf = jnp.asarray(jnp.inf, dt)
    one_over_1meps = jnp.asarray(1.0, dt) / (jnp.asarray(1.0, dt) - jnp.finfo(dt).eps)

    # queue: (F + 2T, ...) with 2T slack rows so child blocks always append
    # with an unclamped dynamic-update-slice; live rows are [0, count).
    pad = F + 2 * T - Q
    count, qid0 = compact_rows(valid, jnp.arange(Q, dtype=jnp.int32))
    dom_lo = jnp.zeros((F + 2 * T, 3), dt)
    dom_hi = jnp.concatenate([jnp.ones((Q, 3), dt), jnp.zeros((pad, 3), dt)])
    qid = jnp.concatenate([qid0, jnp.zeros((pad,), jnp.int32)])

    toi_pq = jnp.full((Q,), inf)
    checks = jnp.zeros((Q,), jnp.int32)
    total_checks = jnp.zeros((), jnp.int32)
    overflow_pq = jnp.zeros((Q,), bool)
    overflow_g = jnp.zeros((), bool)
    toi_g = jnp.asarray(toi_init, dt)
    lane = jnp.arange(T, dtype=jnp.int32)

    def cond(state):
        count = state[3]
        rounds = state[-1]
        return (count > 0) & (rounds < max_rounds)

    def body(state):
        (dom_lo, dom_hi, qid, count, toi_pq, toi_g, checks, total_checks,
         overflow_pq, overflow_g, rounds) = state

        m = jnp.minimum(count, jnp.int32(T))
        start = count - m  # stack top tile: rows [start, count)
        q_lo = jax.lax.dynamic_slice_in_dim(dom_lo, start, T, axis=0)
        q_hi = jax.lax.dynamic_slice_in_dim(dom_hi, start, T, axis=0)
        qq = jax.lax.dynamic_slice_in_dim(qid, start, T, axis=0)
        active = lane < m

        qd = qpack[qq]  # (T, 31) — the round's only query-data gather
        dq = CCDQueries(
            p0s=qd[:, 0:3], p1s=qd[:, 3:6], p2s=qd[:, 6:9], p3s=qd[:, 9:12],
            p0e=qd[:, 12:15], p1e=qd[:, 15:18], p2e=qd[:, 18:21],
            p3e=qd[:, 21:24],
        )
        d_tol = qd[:, 24:27]
        d_err = qd[:, 27:30]
        d_ms = qd[:, 30]

        if exact:
            # pre-increment counts: the reference compares the counter
            # BEFORE this pop (root_finder.cu:302) — capture before the add.
            # Same-query lanes within one tile all see the same pre-count
            # (a sequential DFS would see incrementing values); this can
            # only examine MORE domains than the reference, never fewer,
            # which errs on the conservative side.
            pre_checks = checks[qq]
            checks = checks.at[qq].add(active.astype(jnp.int32))
        total_checks = total_checks + m

        min_t = q_lo[:, 0]
        if toi_per_query:
            bound = toi_pq[qq]
        else:
            bound = toi_g
        live = active & (min_t < bound)
        if max_iterations >= 0:
            live = live & (pre_checks <= max_iterations)

        hit, box_in, true_tol = _inclusion(
            dq, q_lo, q_hi, d_err, d_ms, is_vf, compensated
        )
        widths = q_hi - q_lo
        pos_ok = allow_zero_toi | (min_t > 0)

        cond1 = jnp.all(widths <= d_tol, axis=1)
        cond2 = box_in & pos_ok
        cond3 = (true_tol <= co_tol) & pos_ok

        split = jnp.argmax(widths / d_tol, axis=1)
        # static 3-way select, not take_along_axis: per-row dynamic lane
        # indexing is a cross-lane permute XLA:TPU lowers badly
        # (~5x the row-gather law, PERF.md round-5 decode finding)
        s_lo = jnp.where(split == 0, q_lo[:, 0],
                         jnp.where(split == 1, q_lo[:, 1], q_lo[:, 2]))
        s_hi = jnp.where(split == 0, q_hi[:, 0],
                         jnp.where(split == 1, q_hi[:, 1], q_hi[:, 2]))
        mid = (s_lo + s_hi) / 2
        degenerate = (s_lo >= mid) | (mid >= s_hi)

        accept = live & hit & (cond1 | cond2 | cond3 | degenerate)
        do_split = live & hit & ~accept

        u_lo, v_lo = q_lo[:, 1], q_lo[:, 2]
        if is_vf:
            other = jnp.where(split == 1, v_lo, u_lo)
            push2 = jnp.where(split == 0, mid <= bound, (mid + other) <= one_over_1meps)
        else:
            push2 = jnp.where(split == 0, mid <= bound, True)
        push2 = push2 & do_split

        # capacity check per popped lane (children must fit the free space)
        n_child = do_split.astype(jnp.int32) + push2.astype(jnp.int32)
        ends = jnp.cumsum(n_child)
        space = jnp.int32(F) - (count - m)
        fits = ends <= space
        spilled = do_split & ~fits
        accept = accept | spilled  # conservative accept
        do_split = do_split & fits
        push2 = push2 & fits
        if exact:
            overflow_pq = overflow_pq.at[qq].max(spilled)
            toi_pq = toi_pq.at[qq].min(jnp.where(accept, min_t, inf))
        overflow_g = overflow_g | jnp.any(spilled)
        toi_g = jnp.minimum(toi_g, jnp.min(jnp.where(accept, min_t, inf)))

        onehot = split[:, None] == jnp.arange(3)[None, :]
        lo2 = jnp.where(onehot, mid[:, None], q_lo)  # child2 lower
        hi1 = jnp.where(onehot, mid[:, None], q_hi)  # child1 upper

        # interleave (child2, child1) per lane — child1 ([s_lo, mid], the
        # earlier-time half) lands nearer the stack top and pops first —
        # compact, and write back over the popped region: one sort + one
        # contiguous in-place update, no scatter, O(tile) traffic.
        c_keep = jnp.stack([push2, do_split], axis=1).reshape(-1)
        c_lo = jnp.stack([lo2, q_lo], axis=1).reshape(-1, 3)
        c_hi = jnp.stack([q_hi, hi1], axis=1).reshape(-1, 3)
        c_qid = jnp.stack([qq, qq], axis=1).reshape(-1)
        n_new, b_lo, b_hi, b_qid = compact_rows(c_keep, c_lo, c_hi, c_qid)

        at = count - m
        dom_lo = jax.lax.dynamic_update_slice_in_dim(dom_lo, b_lo, at, axis=0)
        dom_hi = jax.lax.dynamic_update_slice_in_dim(dom_hi, b_hi, at, axis=0)
        qid = jax.lax.dynamic_update_slice_in_dim(qid, b_qid, at, axis=0)
        count = at + n_new

        return (dom_lo, dom_hi, qid, count, toi_pq, toi_g, checks,
                total_checks, overflow_pq, overflow_g, rounds + 1)

    state = (dom_lo, dom_hi, qid, count, toi_pq, toi_g, checks, total_checks,
             overflow_pq, overflow_g, jnp.int32(0))
    state = jax.lax.while_loop(cond, body, state)
    (dom_lo, _, qid_f, count, toi_pq, toi_g, checks, total_checks,
     overflow_pq, overflow_g, _) = state

    # round-cap leftovers: conservative accept of whatever is still alive
    leftover = jnp.arange(F + 2 * T, dtype=jnp.int32) < count
    lo_t = jnp.where(leftover, dom_lo[:, 0], inf)
    toi_g = jnp.minimum(toi_g, jnp.min(lo_t))
    overflow_g = overflow_g | (count > 0)
    if exact:
        toi_pq = toi_pq.at[qid_f].min(lo_t)
        overflow_pq = overflow_pq.at[qid_f].max(leftover)

    toi_out = jnp.minimum(jnp.asarray(toi_init, dt), toi_g)
    if exact:
        toi_out = jnp.minimum(toi_out, jnp.min(toi_pq, initial=inf))
        overflow_out = overflow_pq
    else:
        # global mode: per-query TOI degrades to the global lower-bound
        # certificate (documented in RootFinderResult); inf where invalid
        toi_pq = jnp.where(valid, toi_out, inf)
        overflow_out = jnp.broadcast_to(overflow_g, (Q,)) & valid
    return RootFinderResult(
        toi=toi_out, per_query_toi=toi_pq, checks=checks,
        overflow=overflow_out, total_checks=total_checks,
    )
