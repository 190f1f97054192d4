"""Tight-inclusion interval root finder, TPU-native.

Re-design of the reference's CUDA narrow phase
(``src/scalable_ccd/cuda/narrow_phase/root_finder.cu``): the CUDA version
runs a level-synchronous BFS over a global ring buffer of (t,u,v) domains
(``ccd_buffer.cuh:7-83``) with one thread per domain and ``atomicMin`` on a
global time of impact; a global dynamic work queue has no efficient XLA
equivalent, so here every query runs its own **depth-first bisection with a
bounded per-query stack**, all queries advanced in lockstep by one
``lax.while_loop`` over batched ``(Q, ...)`` arrays:

- DFS explores the lower-t child first, so the earliest certified domain is
  found quickly and prunes the rest — the final result is the minimum over
  all *accepted* domains, identical to the reference's BFS + atomicMin.
- The reference's cross-thread pruning (``atomicMin(toi)`` + ``min_t >= toi``
  early-out, ``root_finder.cu:295,323``) becomes a per-iteration global
  ``jnp.min`` over the per-query best TOIs, folded into every query's prune
  bound — batched SIMD's free replacement for atomics.
- The global buffer's overflow flag + host re-run protocol
  (``narrow_phase.cu:146-195``) is replaced by a *conservative accept*: if a
  query's stack would overflow, the current domain's earliest time is
  accepted as a hit.  This can only make the reported TOI earlier, never
  later, preserving the no-missed-collision contract without re-runs.

Acceptance conditions exactly mirror ``ccd_kernel`` (``root_finder.cu:
311-368``): (1) domain widths below per-dimension tolerance; (2) codomain box
inside the +-(err+ms) envelope; (3) achieved codomain width below the
co-domain tolerance; (4) bisection underflow (midpoint degenerates).  Same
feasibility culls on children: second t-half only if it can beat the current
TOI, and for VF only if u+v can still satisfy u+v <= 1
(``bisect``, ``root_finder.cu:213-254``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scalable_ccd_tpu.narrow_phase.types import (
    CCDQueries,
    compute_tolerance,
    domain_corners,
    numerical_error_bound,
)

__all__ = ["RootFinderResult", "find_roots"]


class RootFinderResult(NamedTuple):
    #: () global earliest time of impact (min over queries and the initial
    #: bound); stays at the initial bound if nothing is hit.
    toi: jax.Array
    #: (Q,) per-query earliest certified TOI, +inf where no contact. Exact
    #: per-query only when ``toi_per_query=True``; otherwise a valid
    #: lower-bound certificate (matches the reference's two build modes,
    #: ``config.hpp.in:13``).
    per_query_toi: jax.Array
    #: (Q,) number of domains examined per query (``CCDData::nbr_checks``).
    checks: jax.Array
    #: (Q,) True where the per-query stack overflowed and a conservative
    #: accept was taken.
    overflow: jax.Array
    #: () int32 — total domains evaluated across the batch.  Equals
    #: ``checks.sum()`` in exact modes; in the BFS solver's scatter-free
    #: global mode it is the only work counter (``checks`` stays zero).
    total_checks: jax.Array


def _inclusion(q, lo, hi, err, ms, is_vf, compensated=False):
    """8-corner inclusion test (``origin_in_inclusion_function``,
    ``root_finder.cu:157-198``).

    Returns (hit, box_in, true_tol): hit = the +-(err+ms) envelope intersects
    the corner box (a root is possible); box_in = the corner box lies fully
    inside the envelope; true_tol = widest codomain extent.

    With ``compensated``, corners are evaluated in double-word f32
    (:func:`scalable_ccd_tpu.narrow_phase.types.domain_corners_df`) and the
    envelope tests become exact sign tests on double-word differences — the
    ``err`` passed in must then be the compensated bound
    (``numerical_error_bound(compensated=True)``).
    """
    if compensated:
        from scalable_ccd_tpu.ops import twofloat as tf
        from scalable_ccd_tpu.narrow_phase.types import domain_corners_df

        chw, clw = domain_corners_df(q, lo, hi, is_vf)
        Q = chw.shape[0]
        chw = chw.reshape(Q, 8, 3)
        clw = clw.reshape(Q, 8, 3)
        cmin = (chw[:, 0], clw[:, 0])
        cmax = (chw[:, 0], clw[:, 0])
        for i in range(1, 8):
            ci = (chw[:, i], clw[:, i])
            cmin = tf.minimum(cmin, ci)
            cmax = tf.maximum(cmax, ci)
        true_tol = jnp.maximum(
            jnp.max(tf.sign_hi(tf.sub(cmax, cmin)), axis=1), 0.0
        )
        ms_ = ms[:, None]
        # sign tests on normalized double-word differences are exact
        # (the hi word carries the value's sign)
        lo_m = tf.sub_f(tf.sub_f(cmin, ms_), err)  # cmin - ms - err
        hi_p = tf.add_f(tf.add_f(cmax, ms_), err)  # cmax + ms + err
        miss = (
            jnp.any(tf.sign_hi(lo_m) > 0, axis=1)
            | jnp.any(tf.sign_hi(hi_p) < 0, axis=1)
        )
        lo_in = tf.add_f(tf.add_f(cmin, ms_), err)  # cmin + ms + err
        hi_in = tf.sub_f(tf.sub_f(cmax, ms_), err)  # cmax - ms - err
        box_in = ~(
            jnp.any(tf.sign_hi(lo_in) < 0, axis=1)
            | jnp.any(tf.sign_hi(hi_in) > 0, axis=1)
        )
        return ~miss, box_in, true_tol
    c = domain_corners(q, lo, hi, is_vf)  # (Q, 2, 2, 2, 3)
    cmin = jnp.min(c, axis=(1, 2, 3))  # (Q, 3)
    cmax = jnp.max(c, axis=(1, 2, 3))
    true_tol = jnp.maximum(jnp.max(cmax - cmin, axis=1), 0.0)
    ms_ = ms[:, None]
    miss = jnp.any(cmin - ms_ > err, axis=1) | jnp.any(cmax + ms_ < -err, axis=1)
    box_in = ~(
        jnp.any(cmin + ms_ < -err, axis=1) | jnp.any(cmax - ms_ > err, axis=1)
    )
    return ~miss, box_in, true_tol


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_vf",
        "max_iterations",
        "allow_zero_toi",
        "toi_per_query",
        "stack_capacity",
        "compensated",
    ),
)
def find_roots(
    queries: CCDQueries,
    valid: jax.Array,
    is_vf: bool,
    toi_init,
    ms,
    tolerance,
    max_iterations: int = -1,
    allow_zero_toi: bool = True,
    toi_per_query: bool = False,
    stack_capacity: int = 96,
    compensated: bool = False,
) -> RootFinderResult:
    """Solve a batch of CCD queries for their earliest time of impact.

    Counterpart of the host driver + kernel loop ``ccd<is_vf>()``
    (``root_finder.cu:372-457``).  ``valid`` is a (Q,) bool mask (False rows
    are chunk padding and are skipped); ``toi_init`` is the running global
    TOI from earlier chunks (the reference threads ``Scalar& toi`` through
    every chunk, ``ccd.cu:66-73``); ``ms`` is the per-batch minimum
    separation; all of (t, u, v) start at [0, 1]^3.

    ``compensated`` evaluates the inclusion function in double-word f32
    (~48-bit mantissa) with the matching error filter — the TPU
    counterpart of the reference's default ``Scalar=double`` build
    (``CMakeLists.txt:69``); see :mod:`scalable_ccd_tpu.ops.twofloat`.
    """
    dt = queries.p0s.dtype
    Q = queries.n
    S = stack_capacity

    ms_arr = jnp.broadcast_to(jnp.asarray(ms, dt), (Q,))
    use_ms = True  # trace-time: err bound selected by runtime ms below
    # The reference picks the filter constant from `use_ms = ms > 0`
    # (narrow_phase.cu:128). Both bounds are cheap; select per batch.
    err_ms = numerical_error_bound(queries, is_vf, True, compensated)
    err_nms = numerical_error_bound(queries, is_vf, False, compensated)
    any_ms = jnp.any(ms_arr > 0)
    err = jnp.where(any_ms, err_ms, err_nms)
    del use_ms

    tol = compute_tolerance(queries, is_vf, tolerance)  # (Q, 3)
    co_tol = jnp.asarray(tolerance, dt)
    inf = jnp.asarray(jnp.inf, dt)
    # u + v <= 1 slack test (`sum_less_than_one`, root_finder.cu:21-29)
    one_over_1meps = jnp.asarray(1.0, dt) / (jnp.asarray(1.0, dt) - jnp.finfo(dt).eps)

    # Stack of domains: lo/hi (Q, S, 3). Entry 0 = the unit cube.
    stack_lo = jnp.zeros((Q, S, 3), dt)
    stack_hi = jnp.zeros((Q, S, 3), dt)
    stack_hi = stack_hi.at[:, 0, :].set(1.0)
    size = jnp.where(valid, jnp.int32(1), jnp.int32(0))

    toi_pq = jnp.full((Q,), inf)
    checks = jnp.zeros((Q,), jnp.int32)
    overflow = jnp.zeros((Q,), bool)
    toi_g = jnp.asarray(toi_init, dt)

    rows = jnp.arange(Q)

    def cond(state):
        _, _, size, *_ = state
        return jnp.any(size > 0)

    def body(state):
        stack_lo, stack_hi, size, toi_pq, toi_g, checks, overflow = state

        active = size > 0
        top = jnp.maximum(size - 1, 0)
        lo = stack_lo[rows, top]  # (Q, 3)
        hi = stack_hi[rows, top]
        size = jnp.where(active, size - 1, size)
        checks = checks + active.astype(jnp.int32)

        min_t = lo[:, 0]
        if toi_per_query:
            prune_bound = toi_pq
        else:
            # global running TOI visible to every query, like atomicMin
            prune_bound = jnp.minimum(toi_pq, toi_g)
        pruned = min_t >= prune_bound
        if max_iterations >= 0:
            # reference compares the pre-increment counter (root_finder.cu:289,303)
            pruned = pruned | ((checks - 1) > max_iterations)
        live = active & ~pruned

        hit, box_in, true_tol = _inclusion(
            queries, lo, hi, err, ms_arr, is_vf, compensated
        )
        widths = hi - lo
        pos_ok = allow_zero_toi | (min_t > 0)

        cond1 = jnp.all(widths <= tol, axis=1)
        cond2 = box_in & pos_ok
        cond3 = (true_tol <= co_tol) & pos_ok

        # split dimension: argmax of widths / tol, first index on ties
        # (`split_dimension`, root_finder.cu:200-211)
        split = jnp.argmax(widths / tol, axis=1)  # (Q,)
        # static 3-way select, not take_along_axis: per-row dynamic lane
        # indexing is a cross-lane permute XLA:TPU lowers badly
        # (~5x the row-gather law, PERF.md round-5 decode finding)
        s_lo = jnp.where(split == 0, lo[:, 0],
                         jnp.where(split == 1, lo[:, 1], lo[:, 2]))
        s_hi = jnp.where(split == 0, hi[:, 0],
                         jnp.where(split == 1, hi[:, 1], hi[:, 2]))
        mid = (s_lo + s_hi) / 2
        degenerate = (s_lo >= mid) | (mid >= s_hi)  # bisection underflow

        accept = live & hit & (cond1 | cond2 | cond3 | degenerate)
        do_split = live & hit & ~accept

        # -- children -------------------------------------------------------
        # child1 = [s_lo, mid] (explored first => pushed last/on top)
        # child2 = [mid, s_hi], pushed only if feasible (bisect, :227-251)
        u_lo, v_lo = lo[:, 1], lo[:, 2]
        if is_vf:
            other = jnp.where(split == 1, v_lo, u_lo)
            uv_ok = (mid + other) <= one_over_1meps
            push2_ok = jnp.where(
                split == 0, mid <= prune_bound, uv_ok
            )
        else:
            push2_ok = jnp.where(split == 0, mid <= prune_bound, True)

        push2 = do_split & push2_ok
        n_push = do_split.astype(jnp.int32) + push2.astype(jnp.int32)
        would_overflow = do_split & (size + n_push > S)
        overflow = overflow | would_overflow
        # conservative accept on overflow (see module docstring)
        accept = accept | would_overflow
        do_split = do_split & ~would_overflow
        push2 = push2 & ~would_overflow

        toi_pq = jnp.where(accept, jnp.minimum(toi_pq, min_t), toi_pq)
        toi_g = jnp.minimum(toi_g, jnp.min(jnp.where(accept, toi_pq, inf)))

        # child bounds: replace the split dimension's bound with the midpoint
        onehot = split[:, None] == jnp.arange(3)[None, :]  # (Q, 3) bool
        lo2 = jnp.where(onehot, mid[:, None], lo)  # lower corner of child2
        hi1 = jnp.where(onehot, mid[:, None], hi)  # upper corner of child1

        # scatter children; index S is dropped (mode="drop")

        idx2 = jnp.where(push2, size, S)
        stack_lo = stack_lo.at[rows, idx2].set(lo2, mode="drop")
        stack_hi = stack_hi.at[rows, idx2].set(hi, mode="drop")
        idx1 = jnp.where(do_split, size + push2.astype(jnp.int32), S)
        stack_lo = stack_lo.at[rows, idx1].set(lo, mode="drop")
        stack_hi = stack_hi.at[rows, idx1].set(hi1, mode="drop")
        size = size + jnp.where(do_split, n_push, 0)

        return stack_lo, stack_hi, size, toi_pq, toi_g, checks, overflow

    state = (stack_lo, stack_hi, size, toi_pq, toi_g, checks, overflow)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, toi_pq, toi_g, checks, overflow = state

    toi_out = jnp.minimum(jnp.asarray(toi_init, dt), jnp.min(toi_pq, initial=inf))
    return RootFinderResult(
        toi=toi_out, per_query_toi=toi_pq, checks=checks, overflow=overflow,
        total_checks=jnp.sum(checks),
    )
