"""Narrow-phase query data, tolerances, and conservative error bounds.

TPU-native counterpart of the reference's narrow-phase data preparation:
``CCDData`` (``src/scalable_ccd/cuda/narrow_phase/ccd_data.cuh:8-26``), the
``add_data`` gather kernel (``cuda/narrow_phase/narrow_phase.cu:24-74``), the
per-query domain tolerances (``cuda/narrow_phase/root_finder.cu:48-88``) and
the floating-point error filters (``root_finder.cu:90-135``).

The reference stores an array-of-structs of eight ``Vector3`` endpoints per
query; here the natural JAX layout is structure-of-arrays: eight ``(Q, 3)``
arrays.  Semantics of the four points for the two query types
(``narrow_phase.cu:41-66``):

- VF (vertex-face): p0 = vertex, p1/p2/p3 = the face's three vertices.
- EE (edge-edge):   p0/p1 = edge A endpoints, p2/p3 = edge B endpoints.

Each point moves linearly from its ``*s`` (t=0) to its ``*e`` (t=1) position.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "CCDQueries",
    "gather_vf_queries",
    "gather_ee_queries",
    "pack_face_table",
    "pack_edge_table",
    "domain_corners",
    "domain_corners_df",
    "compute_tolerance",
    "numerical_error_bound",
    "COMPENSATED_EPS",
]


class CCDQueries(NamedTuple):
    """A batch of Q narrow-phase queries, structure-of-arrays.

    Counterpart of ``CCDData`` (``ccd_data.cuh:8-26``) minus the derived
    fields (``err``/``tol``/``nbr_checks``), which are computed on the fly.
    """

    p0s: jax.Array  # (Q, 3) point 0 at t=0
    p1s: jax.Array
    p2s: jax.Array
    p3s: jax.Array
    p0e: jax.Array  # (Q, 3) point 0 at t=1
    p1e: jax.Array
    p2e: jax.Array
    p3e: jax.Array

    @property
    def n(self) -> int:
        return self.p0s.shape[0]


def concat_frames(vertices_t0: jax.Array, vertices_t1: jax.Array, dtype=None):
    """``(n, 6)`` concatenation of the two vertex frames.

    Row gathers on TPU cost ~10 ns/row regardless of row width (PERF.md),
    so gathering both endpoints of a vertex with ONE 6-wide gather instead
    of two 3-wide ones nearly halves the narrow phase's gather bill.  Pass
    the result to :func:`gather_vf_queries` / :func:`gather_ee_queries` as
    ``vcat`` when calling them repeatedly (e.g. per narrow batch).
    """
    v0 = jnp.asarray(vertices_t0)
    v1 = jnp.asarray(vertices_t1)
    if dtype is not None:
        v0 = v0.astype(dtype)
        v1 = v1.astype(dtype)
    return jnp.concatenate([v0, v1], axis=1)


def pack_face_table(vcat: jax.Array, faces: jax.Array) -> jax.Array:
    """``(nf, 18)`` both-frame endpoints of every face's three vertices.

    Row gathers cost ~10 ns/row regardless of width (PERF.md), so
    pre-gathering each face's vertex data ONCE turns the per-query cost of
    :func:`gather_vf_queries` from 4 gathers (face row + 3 vertex rows)
    into 1 table row.  Pays for itself as soon as the candidate count
    exceeds the face count — always true on contact-rich scenes — and the
    table is built once per phase, outside the narrow-batch loop.
    """
    f = jnp.asarray(faces, jnp.int32)
    return jnp.concatenate([vcat[f[:, 0]], vcat[f[:, 1]], vcat[f[:, 2]]],
                           axis=1)


def pack_edge_table(vcat: jax.Array, edges: jax.Array) -> jax.Array:
    """``(ne, 12)`` both-frame endpoints of every edge's two vertices.

    Same one-row-per-query trick as :func:`pack_face_table` for the
    edge-edge phase: 1 table row per query side instead of 3 gathers.
    """
    e = jnp.asarray(edges, jnp.int32)
    return jnp.concatenate([vcat[e[:, 0]], vcat[e[:, 1]]], axis=1)


def gather_vf_queries(
    vertices_t0: jax.Array,
    vertices_t1: jax.Array,
    faces: jax.Array,
    overlaps: jax.Array,
    dtype=None,
    vcat: jax.Array = None,
    ftab: jax.Array = None,
) -> CCDQueries:
    """Gather vertex-face query endpoints from candidate pairs.

    ``overlaps`` is an int32 ``(Q, 2)`` array of (vertex_id, face_id) pairs —
    the reference's ``add_data<true>`` kernel (``narrow_phase.cu:41-53``) as a
    pure gather.  Out-of-range ids (chunk padding) are clamped; padded rows
    must be masked downstream.  ``vcat`` (from :func:`concat_frames`)
    halves the row-gather count; ``ftab`` (from :func:`pack_face_table`)
    drops it to 2 gathers per query — pass both when calling repeatedly
    (e.g. per narrow batch).
    """
    if vcat is None:
        vcat = concat_frames(vertices_t0, vertices_t1, dtype)
    vi = jnp.clip(overlaps[:, 0], 0, vcat.shape[0] - 1)
    p0 = vcat[vi]
    if ftab is None:
        f = jnp.asarray(faces, jnp.int32)
        fi = jnp.clip(overlaps[:, 1], 0, f.shape[0] - 1)
        fv = f[fi]  # (Q, 3)
        p1 = vcat[fv[:, 0]]
        p2 = vcat[fv[:, 1]]
        p3 = vcat[fv[:, 2]]
    else:
        fi = jnp.clip(overlaps[:, 1], 0, ftab.shape[0] - 1)
        frow = ftab[fi]  # (Q, 18)
        p1, p2, p3 = frow[:, 0:6], frow[:, 6:12], frow[:, 12:18]
    return CCDQueries(
        p0s=p0[:, 0:3], p1s=p1[:, 0:3], p2s=p2[:, 0:3], p3s=p3[:, 0:3],
        p0e=p0[:, 3:6], p1e=p1[:, 3:6], p2e=p2[:, 3:6], p3e=p3[:, 3:6],
    )


def gather_ee_queries(
    vertices_t0: jax.Array,
    vertices_t1: jax.Array,
    edges: jax.Array,
    overlaps: jax.Array,
    dtype=None,
    vcat: jax.Array = None,
    etab: jax.Array = None,
) -> CCDQueries:
    """Gather edge-edge query endpoints from candidate (edgeA, edgeB) pairs.

    The reference's ``add_data<false>`` kernel (``narrow_phase.cu:54-66``);
    6 row gathers per query with ``vcat`` (see :func:`concat_frames`), 2
    with ``etab`` (see :func:`pack_edge_table`).
    """
    if vcat is None:
        vcat = concat_frames(vertices_t0, vertices_t1, dtype)
    if etab is None:
        e = jnp.asarray(edges, jnp.int32)
        ea = jnp.clip(overlaps[:, 0], 0, e.shape[0] - 1)
        eb = jnp.clip(overlaps[:, 1], 0, e.shape[0] - 1)
        a, b = e[ea], e[eb]
        p0 = vcat[a[:, 0]]
        p1 = vcat[a[:, 1]]
        p2 = vcat[b[:, 0]]
        p3 = vcat[b[:, 1]]
    else:
        ea = jnp.clip(overlaps[:, 0], 0, etab.shape[0] - 1)
        eb = jnp.clip(overlaps[:, 1], 0, etab.shape[0] - 1)
        arow, brow = etab[ea], etab[eb]  # (Q, 12) each
        p0, p1 = arow[:, 0:6], arow[:, 6:12]
        p2, p3 = brow[:, 0:6], brow[:, 6:12]
    return CCDQueries(
        p0s=p0[:, 0:3], p1s=p1[:, 0:3], p2s=p2[:, 0:3], p3s=p3[:, 0:3],
        p0e=p0[:, 3:6], p1e=p1[:, 3:6], p2e=p2[:, 3:6], p3e=p3[:, 3:6],
    )


def domain_corners(
    q: CCDQueries,
    lo: jax.Array,
    hi: jax.Array,
    is_vf: bool,
) -> jax.Array:
    """Evaluate the residual F at the 8 corners of a (t, u, v) box.

    F is the multilinear distance residual whose roots are contacts
    (``calculate_vf`` / ``calculate_ee``, ``root_finder.cu:137-155``):

    - VF: ``F = v(t) - t0(t) - (t1(t)-t0(t))*u - (t2(t)-t0(t))*v``
    - EE: ``F = (a0(t) + (a1(t)-a0(t))*u) - (b0(t) + (b1(t)-b0(t))*v)``

    where every point is the linear interpolation ``p(t) = (pe-ps)*t + ps``.
    F is affine in each of t, u, v separately, so its range over a box is
    attained at the corners — the corner min/max *is* the exact interval
    image, up to floating-point rounding covered by
    :func:`numerical_error_bound`.

    ``lo``/``hi``: ``(Q, 3)`` lower/upper bounds of (t, u, v).
    Returns ``(Q, 2, 2, 2, 3)`` with axes (query, t-corner, u-corner,
    v-corner, xyz); expression association follows the reference so rounding
    behavior matches.
    """
    t = jnp.stack([lo[:, 0], hi[:, 0]], axis=1)[:, :, None]  # (Q, 2, 1)

    def lerp(ps, pe):
        return (pe - ps)[:, None, :] * t + ps[:, None, :]  # (Q, 2, 3)

    p0 = lerp(q.p0s, q.p0e)
    p1 = lerp(q.p1s, q.p1e)
    p2 = lerp(q.p2s, q.p2e)
    p3 = lerp(q.p3s, q.p3e)

    u = jnp.stack([lo[:, 1], hi[:, 1]], axis=1)[:, None, :, None, None]  # (Q,1,2,1,1)
    v = jnp.stack([lo[:, 2], hi[:, 2]], axis=1)[:, None, None, :, None]  # (Q,1,1,2,1)

    def bc(p):  # (Q, 2, 3) -> (Q, 2, 1, 1, 3)
        return p[:, :, None, None, :]

    if is_vf:
        # v - (t1 - t0) * u - (t2 - t0) * v - t0   (root_finder.cu:144)
        return bc(p0) - bc(p2 - p1) * u - bc(p3 - p1) * v - bc(p1)
    else:
        # ((a1 - a0) * u + a0) - ((b1 - b0) * v + b0)   (root_finder.cu:154)
        return (bc(p1 - p0) * u + bc(p0)) - (bc(p3 - p2) * v + bc(p2))


def domain_corners_df(
    q: CCDQueries,
    lo: jax.Array,
    hi: jax.Array,
    is_vf: bool,
):
    """Double-word (two-float) corner evaluation — the compensated twin of
    :func:`domain_corners` for ``precision="compensated"`` mode.

    Same residual F and corner enumeration, computed in double-word f32
    (:mod:`scalable_ccd_tpu.ops.twofloat`): ~48 effective mantissa bits,
    the TPU stand-in for the reference's default double build
    (``CMakeLists.txt:69``, ``root_finder.cu:92-100``).  The domain bounds
    ``lo``/``hi`` are dyadic rationals, exact in f32; the endpoints are the
    exact f32 inputs — so the only rounding is the double-word ops' own
    O(u^2) terms, covered by ``numerical_error_bound(compensated=True)``.

    Returns an ``(hi_words, lo_words)`` pair, each ``(Q, 2, 2, 2, 3)``.
    """
    from scalable_ccd_tpu.ops import twofloat as tf

    t = jnp.stack([lo[:, 0], hi[:, 0]], axis=1)[:, :, None]  # (Q, 2, 1)

    def lerp(ps, pe):
        d = tf.f_sub(pe, ps)  # exact (Q, 3) double-word
        d = (d[0][:, None, :], d[1][:, None, :])
        return tf.add_f(tf.mul_f(d, t), ps[:, None, :])  # (Q, 2, 3)

    p0 = lerp(q.p0s, q.p0e)
    p1 = lerp(q.p1s, q.p1e)
    p2 = lerp(q.p2s, q.p2e)
    p3 = lerp(q.p3s, q.p3e)

    u = jnp.stack([lo[:, 1], hi[:, 1]], axis=1)[:, None, :, None, None]
    v = jnp.stack([lo[:, 2], hi[:, 2]], axis=1)[:, None, None, :, None]

    def bc(p):  # (Q, 2, 3) dw -> (Q, 2, 1, 1, 3) dw
        return p[0][:, :, None, None, :], p[1][:, :, None, None, :]

    if is_vf:
        # p0 - (p2 - p1) * u - (p3 - p1) * v - p1   (root_finder.cu:144)
        e21 = bc(tf.sub(p2, p1))
        e31 = bc(tf.sub(p3, p1))
        return tf.sub(
            tf.sub(tf.sub(bc(p0), tf.mul_f(e21, u)), tf.mul_f(e31, v)),
            bc(p1),
        )
    # ((p1 - p0) * u + p0) - ((p3 - p2) * v + p2)   (root_finder.cu:154)
    e10 = bc(tf.sub(p1, p0))
    e32 = bc(tf.sub(p3, p2))
    return tf.sub(
        tf.add(tf.mul_f(e10, u), bc(p0)),
        tf.add(tf.mul_f(e32, v), bc(p2)),
    )


def compute_tolerance(q: CCDQueries, is_vf: bool, co_domain_tolerance) -> jax.Array:
    """Per-query (t, u, v) domain tolerances, shape (Q, 3).

    ``tol[d] = co_domain_tolerance / (3 * max edge-difference along d)`` where
    the max is the L∞ norm over the four edges of the unit-domain corner cube
    in direction d (``compute_face_vertex_tolerance`` /
    ``compute_edge_edge_tolerance``, ``root_finder.cu:48-88``).  The corner
    values pXYZ in the reference are exactly F at the corners of [0,1]^3, so
    we evaluate them with :func:`domain_corners`.

    Reference quirk kept for parity (``root_finder.cu:71-87`` — flagged
    there as an intentional deviation from the original Tight-Inclusion):
    the EE variant's corner lists give tol = (ext_t, ext_t, ext_u) — the
    t-extent is reused for the u slot and the u-extent lands in the v slot
    (its tol[2] argument list pairs corners across the u index, identical
    to the VF tol[1] list).
    """
    dt = q.p0s.dtype
    zero = jnp.zeros((q.n, 3), dt)
    one = jnp.ones((q.n, 3), dt)
    c = domain_corners(q, zero, one, is_vf)  # (Q, 2, 2, 2, 3)

    def extent(axis):
        # max over the 4 cube edges along `axis` of the Linf edge difference
        d = jnp.abs(jnp.take(c, 1, axis=axis) - jnp.take(c, 0, axis=axis))
        return jnp.max(d, axis=(1, 2, 3))  # (Q,)

    ext_t = extent(1)
    ext_u = extent(2)
    ext_v = extent(3)
    co = jnp.asarray(co_domain_tolerance, dt)
    if is_vf:
        return jnp.stack([co / (3 * ext_t), co / (3 * ext_u), co / (3 * ext_v)], axis=1)
    else:
        return jnp.stack([co / (3 * ext_t), co / (3 * ext_t), co / (3 * ext_u)], axis=1)


#: per-op-chain epsilon of the double-word corner evaluation: each dw op
#: carries <= 3 u^2 relative error (u = 2^-24, Joldes et al. 2017) and the
#: longest chain is ~10 ops, so 2^-44 = 256 u^2 is conservative by ~8x
#: (twofloat module docstring)
COMPENSATED_EPS = 2.0 ** -44


def numerical_error_bound(
    q: CCDQueries, is_vf: bool, use_ms: bool, compensated: bool = False
) -> jax.Array:
    """Conservative bound on the FP evaluation error of F, shape (Q, 3).

    The reference hard-codes eight filter constants
    (``get_numerical_error``, ``root_finder.cu:90-135``); each equals
    ``k * machine_epsilon`` with k = 30 (VF) / 28 (EE), plus 4 when a minimum
    separation is used — derived from the Tight-Inclusion forward error
    analysis of the multilinear evaluation (one eps per rounding along the
    longest evaluation chain, scaled by the cube of the coordinate
    magnitude).  Deriving from eps keeps the bound correct for any working
    dtype: ``err[d] = max_d^3 * k * eps`` with ``max_d`` the largest absolute
    coordinate (clamped to >= 1) among all eight endpoints.

    With ``compensated`` (the double-word evaluation of
    :func:`domain_corners_df`), eps is :data:`COMPENSATED_EPS` — between
    f32's 2^-24 and f64's 2^-53, reflecting the ~48-bit effective mantissa.
    """
    dt = q.p0s.dtype
    eps = COMPENSATED_EPS if compensated else jnp.finfo(dt).eps
    k = (30 if is_vf else 28) + (4 if use_ms else 0)
    pts = jnp.stack(
        [q.p0s, q.p1s, q.p2s, q.p3s, q.p0e, q.p1e, q.p2e, q.p3e], axis=1
    )  # (Q, 8, 3)
    m = jnp.maximum(jnp.max(jnp.abs(pts), axis=1), jnp.asarray(1.0, dt))
    return m * m * m * (k * eps)
