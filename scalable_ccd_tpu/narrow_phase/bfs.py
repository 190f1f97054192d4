"""Level-synchronous frontier root finder — the TPU fast path.

This is the direct TPU-native analogue of the reference's narrow-phase BFS
(``root_finder.cu:431-447``): the CUDA version keeps a global ring buffer of
(t,u,v) domains and launches one thread per domain per level, giving perfect
load balance across queries; the TPU version keeps a **dense frontier** of
domains as structure-of-arrays and advances all of them one bisection level
per ``lax.while_loop`` round:

    evaluate all domains -> accept/prune/split decisions -> children are
    compacted to the front of the next frontier with an exclusive prefix sum
    (the functional replacement for ``atomicInc`` queue pushes,
    ``ccd_buffer.cuh:25-34``) -> repeat until the frontier drains.

Round count is bounded by the bisection depth (each domain's depth grows by
one per round; ~25 splits per dimension at f32), NOT by the per-query work
count — unlike the companion depth-first solver
(:func:`scalable_ccd_tpu.narrow_phase.root_finder.find_roots`, which is kept
as the exact-order oracle twin), no lane waits for a pathological neighbor.

Differences from the CUDA design, by construction:

- ``atomicMin(toi)`` becomes a scatter-min into the per-query TOI array plus
  a global ``jnp.min`` folded into every round's prune bound.
- Buffer overflow does not re-run with a rebalanced buffer
  (``narrow_phase.cu:146-195``); domains that do not fit are *conservatively
  accepted* (their earliest time is reported as a hit), which can only make
  the reported TOI earlier — never a missed collision.  The same applies to
  domains still alive at the round cap.
- ``max_iterations`` counts per-query domain evaluations like the
  reference's ``nbr_checks`` (``root_finder.cu:289``), but accumulated
  per level; the reference's increment is racy across threads anyway.
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

__all__ = ["find_roots_bfs"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_vf",
        "max_iterations",
        "allow_zero_toi",
        "toi_per_query",
        "frontier_capacity",
        "max_rounds",
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
    max_rounds: int = 160,
) -> RootFinderResult:
    """Batched earliest-TOI solve, frontier formulation.

    Same contract as :func:`find_roots`; ``frontier_capacity`` (default
    ``4 * Q``) is the domain buffer size — the analogue of the reference's
    ``MAX_UNIT_SIZE`` (``memory_handler.cpp:81-122``).
    """
    dt = queries.p0s.dtype
    Q = queries.n
    F = frontier_capacity if frontier_capacity > 0 else 4 * Q
    assert F >= Q, "frontier must hold one root domain per query"

    ms_arr = jnp.broadcast_to(jnp.asarray(ms, dt), (Q,))
    err = jnp.where(
        jnp.any(ms_arr > 0),
        numerical_error_bound(queries, is_vf, True),
        numerical_error_bound(queries, is_vf, False),
    )
    tol = compute_tolerance(queries, is_vf, tolerance)
    co_tol = jnp.asarray(tolerance, dt)
    inf = jnp.asarray(jnp.inf, dt)
    one_over_1meps = jnp.asarray(1.0, dt) / (jnp.asarray(1.0, dt) - jnp.finfo(dt).eps)

    pad = F - Q
    dom_lo = jnp.concatenate([jnp.zeros((Q, 3), dt), jnp.zeros((pad, 3), dt)])
    dom_hi = jnp.concatenate([jnp.ones((Q, 3), dt), jnp.zeros((pad, 3), dt)])
    qid = jnp.concatenate(
        [jnp.arange(Q, dtype=jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )
    # invalid queries: empty (lo==hi==0) domains are dropped by the pruning
    # below because their min_t is forced to +inf
    root_live = valid
    count = jnp.sum(valid, dtype=jnp.int32)
    # compact the live roots to the front
    order = jnp.argsort(~root_live, stable=True)
    dom_lo = dom_lo.at[:Q].set(dom_lo[:Q][order])
    dom_hi = dom_hi.at[:Q].set(dom_hi[:Q][order])
    qid = qid.at[:Q].set(qid[:Q][order])

    toi_pq = jnp.full((Q,), inf)
    checks = jnp.zeros((Q,), jnp.int32)
    overflow = jnp.zeros((Q,), bool)
    toi_g = jnp.asarray(toi_init, dt)
    slot = jnp.arange(F, dtype=jnp.int32)

    def cond(state):
        _, _, _, count, _, _, _, _, rounds = state
        return (count > 0) & (rounds < max_rounds)

    def body(state):
        dom_lo, dom_hi, qid, count, toi_pq, toi_g, checks, overflow, rounds = state

        active = slot < count
        q_lo = dom_lo
        q_hi = dom_hi
        qq = qid

        # gather per-domain query data
        g = lambda a: a[qq]
        dq = CCDQueries(
            p0s=g(queries.p0s), p1s=g(queries.p1s),
            p2s=g(queries.p2s), p3s=g(queries.p3s),
            p0e=g(queries.p0e), p1e=g(queries.p1e),
            p2e=g(queries.p2e), p3e=g(queries.p3e),
        )
        d_tol = tol[qq]
        d_err = err[qq]
        d_ms = ms_arr[qq]

        checks = checks.at[qq].add(active.astype(jnp.int32))

        min_t = q_lo[:, 0]
        if toi_per_query:
            bound = toi_pq[qq]
        else:
            bound = jnp.minimum(toi_pq[qq], toi_g)
        live = active & (min_t < bound)
        if max_iterations >= 0:
            live = live & (checks[qq] <= max_iterations)

        hit, box_in, true_tol = _inclusion(dq, q_lo, q_hi, d_err, d_ms, is_vf)
        widths = q_hi - q_lo
        pos_ok = allow_zero_toi | (min_t > 0)

        cond1 = jnp.all(widths <= d_tol, axis=1)
        cond2 = box_in & pos_ok
        cond3 = (true_tol <= co_tol) & pos_ok

        split = jnp.argmax(widths / d_tol, axis=1)
        s_lo = jnp.take_along_axis(q_lo, split[:, None], axis=1)[:, 0]
        s_hi = jnp.take_along_axis(q_hi, split[:, None], axis=1)[:, 0]
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

        # children placement via exclusive prefix sum (compaction)
        n_child = do_split.astype(jnp.int32) + push2.astype(jnp.int32)
        ends = jnp.cumsum(n_child)
        starts = ends - n_child
        fits = do_split & (ends <= F)
        spilled = do_split & ~fits
        overflow = overflow.at[qq].max(spilled)
        # conservative accept for spilled domains
        accept = accept | spilled
        do_split2 = fits
        push2 = push2 & fits

        toi_pq = toi_pq.at[qq].min(jnp.where(accept, min_t, inf))
        toi_g = jnp.minimum(toi_g, jnp.min(jnp.where(accept, min_t, inf)))

        onehot = split[:, None] == jnp.arange(3)[None, :]
        lo2 = jnp.where(onehot, mid[:, None], q_lo)  # child2 lower
        hi1 = jnp.where(onehot, mid[:, None], q_hi)  # child1 upper

        idx1 = jnp.where(do_split2, starts, F)
        idx2 = jnp.where(push2, starts + 1, F)
        new_lo = jnp.zeros_like(dom_lo)
        new_hi = jnp.zeros_like(dom_hi)
        new_qid = jnp.zeros_like(qid)
        new_lo = new_lo.at[idx1].set(q_lo, mode="drop")
        new_hi = new_hi.at[idx1].set(hi1, mode="drop")
        new_qid = new_qid.at[idx1].set(qq, mode="drop")
        new_lo = new_lo.at[idx2].set(lo2, mode="drop")
        new_hi = new_hi.at[idx2].set(q_hi, mode="drop")
        new_qid = new_qid.at[idx2].set(qq, mode="drop")
        new_count = jnp.minimum(
            jnp.where(count > 0, ends[count - 1], 0), jnp.int32(F)
        )

        return (
            new_lo, new_hi, new_qid, new_count,
            toi_pq, toi_g, checks, overflow, rounds + 1,
        )

    state = (
        dom_lo, dom_hi, qid, count, toi_pq, toi_g, checks, overflow,
        jnp.int32(0),
    )
    state = jax.lax.while_loop(cond, body, state)
    dom_lo, _, qid_f, count, toi_pq, toi_g, checks, overflow, _ = state

    # round-cap leftovers: conservative accept of whatever is still alive
    leftover = slot < count
    toi_pq = toi_pq.at[qid_f].min(jnp.where(leftover, dom_lo[:, 0], inf))
    overflow = overflow.at[qid_f].max(leftover)

    toi_out = jnp.minimum(jnp.asarray(toi_init, dt), jnp.min(toi_pq, initial=inf))
    return RootFinderResult(
        toi=toi_out, per_query_toi=toi_pq, checks=checks, overflow=overflow
    )
