"""FIFO ring-buffer root finder — the TPU fast path.

This is the direct TPU-native analogue of the reference's narrow-phase work
queue (``ccd_buffer.cuh:7-83`` + the BFS driver loop
``root_finder.cu:431-447``): the CUDA version keeps a global ring buffer of
(t,u,v) domains, launches one thread per domain per level, and advances the
ring head with ``shift_queue_start``; the TPU version keeps the same ring as
dense structure-of-arrays and pops a fixed-size **tile** of domains per
``lax.while_loop`` round:

    pop TILE domains at the head -> evaluate the 8-corner inclusion test on
    all of them (one dense vectorized batch) -> accept / prune / split ->
    children are appended at the tail via a cumsum + modular scatter (the
    functional replacement for ``atomicInc`` pushes) -> repeat until empty.

Properties:

- Work is proportional to the number of domains actually evaluated (the
  reference's ``nbr_checks`` metric), NOT to queue capacity and NOT to the
  worst query's work — no lane waits for a pathological neighbor (unlike the
  companion depth-first solver
  :func:`scalable_ccd_tpu.narrow_phase.root_finder.find_roots`, which is
  kept as the exact-order oracle twin).
- Capacity (``frontier_capacity``) is decoupled from the BFS level width, so
  deep or bushy searches don't spill at level boundaries; it is the analogue
  of the reference's ``MAX_UNIT_SIZE`` (``memory_handler.cpp:81-122``).

Differences from the CUDA design, by construction:

- ``atomicMin(toi)`` becomes a scatter-min into the per-query TOI array plus
  a global ``jnp.min`` folded into every round's prune bound.
- Ring overflow does not re-run with a rebalanced buffer
  (``narrow_phase.cu:146-195``); domains that do not fit are *conservatively
  accepted* (their earliest time is reported as a hit), which can only make
  the reported TOI earlier — never a missed collision.  The same applies to
  domains still alive at the round cap.  Overflows are reported per query.
- ``max_iterations`` counts per-query domain evaluations like the
  reference's ``nbr_checks`` (``root_finder.cu:289``), accumulated per
  round; the reference's increment is racy across threads anyway.
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
        "tile",
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
    tile: int = 0,
    max_rounds: int = 1 << 14,
) -> RootFinderResult:
    """Batched earliest-TOI solve, FIFO ring formulation.

    Same contract as :func:`find_roots`; ``frontier_capacity`` (default
    ``8 * Q``) is the ring size, ``tile`` (default ``min(Q, 16384)``) the
    number of domains evaluated per round.
    """
    dt = queries.p0s.dtype
    Q = queries.n
    F = frontier_capacity if frontier_capacity > 0 else 8 * Q
    T = tile if tile > 0 else min(max(Q, 256), 16384)
    assert F >= Q, "ring must hold one root domain per query"

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

    # ring initialization: live root domains compacted to the front
    order = jnp.argsort(~valid, stable=True).astype(jnp.int32)
    count = jnp.sum(valid, dtype=jnp.int32)
    pad = F - Q
    dom_lo = jnp.zeros((F, 3), dt)
    dom_hi = jnp.concatenate([jnp.ones((Q, 3), dt), jnp.zeros((pad, 3), dt)])
    qid = jnp.concatenate([order, jnp.zeros((pad,), jnp.int32)])

    toi_pq = jnp.full((Q,), inf)
    checks = jnp.zeros((Q,), jnp.int32)
    overflow = jnp.zeros((Q,), bool)
    toi_g = jnp.asarray(toi_init, dt)
    lane = jnp.arange(T, dtype=jnp.int32)

    def cond(state):
        _, _, _, _, count, _, _, _, _, rounds = state
        return (count > 0) & (rounds < max_rounds)

    def body(state):
        dom_lo, dom_hi, qid, head, count, toi_pq, toi_g, checks, overflow, rounds = state

        m = jnp.minimum(count, jnp.int32(T))
        active = lane < m
        idx = jax.lax.rem(head + lane, jnp.int32(F))
        q_lo = dom_lo[idx]  # (T, 3)
        q_hi = dom_hi[idx]
        qq = qid[idx]

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

        # children appended at the tail via exclusive prefix sum + mod scatter
        n_child = do_split.astype(jnp.int32) + push2.astype(jnp.int32)
        ends = jnp.cumsum(n_child)
        starts = ends - n_child
        space = jnp.int32(F) - (count - m)  # free slots once the tile is popped
        fits = do_split & (ends <= space)
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

        tail = head + count  # un-wrapped; rem applied per write
        idx1 = jax.lax.rem(tail + starts, jnp.int32(F))
        idx2 = jax.lax.rem(tail + starts + 1, jnp.int32(F))
        idx1 = jnp.where(do_split2, idx1, jnp.int32(F))  # OOB -> dropped
        idx2 = jnp.where(push2, idx2, jnp.int32(F))
        dom_lo = dom_lo.at[idx1].set(q_lo, mode="drop")
        dom_hi = dom_hi.at[idx1].set(hi1, mode="drop")
        qid = qid.at[idx1].set(qq, mode="drop")
        dom_lo = dom_lo.at[idx2].set(lo2, mode="drop")
        dom_hi = dom_hi.at[idx2].set(q_hi, mode="drop")
        qid = qid.at[idx2].set(qq, mode="drop")

        n_new = jnp.where(m > 0, ends[m - 1], 0)
        n_new = jnp.minimum(n_new, space)
        head = jax.lax.rem(head + m, jnp.int32(F))
        count = count - m + n_new

        return (
            dom_lo, dom_hi, qid, head, count,
            toi_pq, toi_g, checks, overflow, rounds + 1,
        )

    state = (
        dom_lo, dom_hi, qid, jnp.int32(0), count,
        toi_pq, toi_g, checks, overflow, jnp.int32(0),
    )
    state = jax.lax.while_loop(cond, body, state)
    dom_lo, _, qid_f, head, count, toi_pq, toi_g, checks, overflow, _ = state

    # round-cap leftovers: conservative accept of whatever is still alive
    slot = jnp.arange(F, dtype=jnp.int32)
    live_ring = jax.lax.rem(slot - head + 2 * jnp.int32(F), jnp.int32(F)) < count
    toi_pq = toi_pq.at[qid_f].min(jnp.where(live_ring, dom_lo[:, 0], inf))
    overflow = overflow.at[qid_f].max(live_ring)

    toi_out = jnp.minimum(jnp.asarray(toi_init, dt), jnp.min(toi_pq, initial=inf))
    return RootFinderResult(
        toi=toi_out, per_query_toi=toi_pq, checks=checks, overflow=overflow
    )
