"""Narrow-phase root finder tests.

The reference's narrow-phase test is a golden-value check on downloaded
simulation frames (``tests/test_narrow_phase.cu:65``: toi == 2^-18 on
cloth-ball).  Offline, the same guarantees are checked three ways:
analytic scenes with known impact times, exact agreement between the batched
TPU solver and an independently written scalar float64 oracle, and the
conservativeness contract (reported TOI never later than the true contact).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.narrow_phase import (
    CCDQueries,
    find_roots,
    gather_ee_queries,
    gather_vf_queries,
)
from scalable_ccd_tpu.narrow_phase.oracle import ccd_query_oracle


def _queries_from_pts(pts_batch):
    pts = jnp.asarray(np.asarray(pts_batch, np.float64))
    return CCDQueries(
        p0s=pts[:, 0], p1s=pts[:, 1], p2s=pts[:, 2], p3s=pts[:, 3],
        p0e=pts[:, 4], p1e=pts[:, 5], p2e=pts[:, 6], p3e=pts[:, 7],
    )


def _solve(pts_batch, is_vf, **kw):
    q = _queries_from_pts(pts_batch)
    valid = jnp.ones((q.n,), bool)
    kw.setdefault("toi_init", jnp.inf)
    kw.setdefault("ms", 0.0)
    kw.setdefault("tolerance", 1e-6)
    return find_roots(q, valid, is_vf, **kw)


def vf_drop_query(height=1.0, drop=2.0, tilt=0.0):
    """Vertex falling straight down onto a unit static triangle.

    Vertex starts at (0.25, 0.25, height), moves down by ``drop``; the
    triangle spans (0,0,0),(1,0,0),(0,1,0).  True impact: t = height/drop
    (for tilt=0).  ``tilt`` raises two triangle corners slightly: exact
    axis-aligned tangency with a minimum separation makes the contact
    manifold 2-dimensional, which is the algorithm's (and the reference's)
    exponential worst case — tilting makes contact generic.
    """
    v0 = [0.25, 0.25, height]
    v1 = [0.25, 0.25, height - drop]
    tri = [[0, 0, 0], [1, 0, tilt], [0, 1, 2 * tilt]]
    return [v0] + tri + [v1] + tri


def ee_cross_query(gap=1.0, drop=2.0, tilt=0.0):
    """Edge A falling straight down onto crossing static edge B.

    A spans x in [-1,1] at z=gap, B spans y in [-1,1] at z=0 (tilted by
    ``tilt`` across its length, see :func:`vf_drop_query`).
    True impact: t = gap/drop for tilt=0.
    """
    a0s, a1s = [-1, 0, gap], [1, 0, gap]
    b0, b1 = [0, -1, -tilt], [0, 1, tilt]
    a0e, a1e = [-1, 0, gap - drop], [1, 0, gap - drop]
    return [a0s, a1s, b0, b1, a0e, a1e, b0, b1]


class TestAnalytic:
    def test_vf_hit_time(self):
        res = _solve([vf_drop_query(1.0, 2.0)], is_vf=True)
        toi = float(res.toi)
        # conservative: never later than the true 0.5; within tolerance below
        assert toi <= 0.5
        assert toi > 0.5 - 1e-3

    def test_ee_hit_time(self):
        res = _solve([ee_cross_query(1.0, 2.0)], is_vf=False)
        toi = float(res.toi)
        assert toi <= 0.5
        assert toi > 0.5 - 1e-3

    def test_vf_miss(self):
        # vertex moves up and away — no contact
        pts = vf_drop_query(1.0, -1.0)
        res = _solve([pts], is_vf=True)
        assert np.isinf(float(res.toi))
        assert np.isinf(float(res.per_query_toi[0]))

    def test_ee_parallel_miss(self):
        a0, a1 = [-1, 0, 1], [1, 0, 1]
        b0, b1 = [-1, 0, 0], [1, 0, 0]
        pts = [a0, a1, b0, b1, [-1, 0, 0.5], [1, 0, 0.5], b0, b1]
        res = _solve([pts], is_vf=False)
        assert np.isinf(float(res.toi))

    def test_vf_touching_at_zero(self):
        # vertex starts exactly on the triangle plane inside the triangle
        pts = vf_drop_query(0.0, 1.0)
        res = _solve([pts], is_vf=True, allow_zero_toi=True)
        assert float(res.toi) == 0.0
        res2 = _solve([pts], is_vf=True, allow_zero_toi=False)
        # with zero disallowed the solver must still terminate; any result
        # must be >= 0 (it may still find t=0 via the width-based condition 1)
        assert float(res2.toi) >= 0.0

    def test_min_separation_hits_earlier(self):
        pts = vf_drop_query(1.0, 2.0, tilt=0.05)
        plain = float(_solve([pts], is_vf=True).toi)
        with_ms = float(_solve([pts], is_vf=True, ms=0.1).toi)
        # the 0.1 separation threshold is reached strictly earlier
        assert with_ms < plain
        assert with_ms <= 0.4502

    def test_toi_init_prunes(self):
        # a bound earlier than any possible impact suppresses work
        res = _solve([vf_drop_query(1.0, 2.0)], is_vf=True, toi_init=0.1)
        assert float(res.toi) == pytest.approx(0.1)
        assert int(res.checks[0]) <= 4

    def test_invalid_rows_skipped(self):
        q = _queries_from_pts([vf_drop_query(1.0, 2.0)] * 2)
        valid = jnp.array([True, False])
        res = find_roots(q, valid, True, toi_init=jnp.inf, ms=0.0, tolerance=1e-6)
        assert np.isfinite(float(res.per_query_toi[0]))
        assert np.isinf(float(res.per_query_toi[1]))
        assert int(res.checks[1]) == 0


def _random_queries(n, seed, is_vf):
    """Random motions biased towards near-contact configurations."""
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(n):
        if is_vf:
            base = vf_drop_query(
                height=rng.uniform(-0.2, 1.0), drop=rng.uniform(-0.5, 2.0)
            )
        else:
            base = ee_cross_query(
                gap=rng.uniform(-0.2, 1.0), drop=rng.uniform(-0.5, 2.0)
            )
        p = np.asarray(base, np.float64)
        p += rng.normal(scale=0.15, size=p.shape)
        pts.append(p)
    return np.asarray(pts)


# Near-degenerate random inputs can legitimately require millions of domain
# checks (tight-inclusion's worst case — tangential contact has a >0-dim
# contact manifold); parity tests cap max_iterations, which is itself part of
# the contract being checked (reference drops domains past the cap,
# root_finder.cu:303).
PARITY_CAP = 20_000


class TestOracleParity:
    """Batched f64 solver vs the scalar oracle: identical semantics."""

    @pytest.mark.parametrize("is_vf", [True, False], ids=["vf", "ee"])
    def test_parity(self, is_vf):
        pts = _random_queries(48, seed=3 if is_vf else 4, is_vf=is_vf)
        res = _solve(
            pts, is_vf=is_vf, toi_per_query=True, max_iterations=PARITY_CAP
        )
        got = np.asarray(res.per_query_toi)
        checks = np.asarray(res.checks)
        for i in range(len(pts)):
            want, want_checks, _ = ccd_query_oracle(
                pts[i], is_vf, max_iterations=PARITY_CAP
            )
            assert got[i] == pytest.approx(want, rel=1e-9, abs=1e-12), i
            # identical exploration order => identical work counts
            assert checks[i] == want_checks, i

    @pytest.mark.parametrize("is_vf", [True, False], ids=["vf", "ee"])
    def test_parity_with_ms(self, is_vf):
        pts = _random_queries(24, seed=11, is_vf=is_vf)
        res = _solve(
            pts, is_vf=is_vf, toi_per_query=True, ms=0.05,
            max_iterations=PARITY_CAP,
        )
        got = np.asarray(res.per_query_toi)
        for i in range(len(pts)):
            want, _, _ = ccd_query_oracle(
                pts[i], is_vf, ms=0.05, max_iterations=PARITY_CAP
            )
            assert got[i] == pytest.approx(want, rel=1e-9, abs=1e-12), i

    def test_max_iterations_parity(self):
        pts = _random_queries(16, seed=7, is_vf=True)
        res = _solve(pts, is_vf=True, toi_per_query=True, max_iterations=20)
        got = np.asarray(res.per_query_toi)
        for i in range(len(pts)):
            want, _, _ = ccd_query_oracle(pts[i], True, max_iterations=20)
            assert got[i] == pytest.approx(want, rel=1e-9, abs=1e-12), i

    def test_global_pruning_same_min(self):
        """Global pruning may change per-query values but never the min."""
        pts = _random_queries(48, seed=5, is_vf=True)
        per_query = _solve(
            pts, is_vf=True, toi_per_query=True, max_iterations=PARITY_CAP
        )
        pruned = _solve(
            pts, is_vf=True, toi_per_query=False, max_iterations=PARITY_CAP
        )
        assert float(pruned.toi) == pytest.approx(float(per_query.toi), rel=1e-12)
        # pruning can only reduce work
        assert int(pruned.checks.sum()) <= int(per_query.checks.sum())


class TestConservativeness:
    """Reported TOI is never later than an actual contact."""

    def test_vf_true_contact_bounded(self):
        rng = np.random.default_rng(0)
        for _ in range(25):
            h = rng.uniform(0.05, 0.9)
            drop = rng.uniform(h + 0.05, 2.5)
            true_t = h / drop
            res = _solve([vf_drop_query(h, drop)], is_vf=True)
            assert float(res.toi) <= true_t + 1e-12

    def test_ee_true_contact_bounded(self):
        rng = np.random.default_rng(1)
        for _ in range(25):
            g = rng.uniform(0.05, 0.9)
            drop = rng.uniform(g + 0.05, 2.5)
            true_t = g / drop
            res = _solve([ee_cross_query(g, drop)], is_vf=False)
            assert float(res.toi) <= true_t + 1e-12


class TestGather:
    def test_gather_vf(self):
        v0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0.25, 0.25, 1.0]])
        v1 = v0.copy()
        v1[3, 2] = -1.0
        faces = np.array([[0, 1, 2]])
        overlaps = jnp.asarray(np.array([[3, 0]], np.int32))
        q = gather_vf_queries(v0, v1, faces, overlaps)
        np.testing.assert_array_equal(np.asarray(q.p0s[0]), v0[3])
        np.testing.assert_array_equal(np.asarray(q.p1s[0]), v0[0])
        np.testing.assert_array_equal(np.asarray(q.p0e[0]), v1[3])
        res = find_roots(
            q, jnp.ones((1,), bool), True, toi_init=jnp.inf, ms=0.0, tolerance=1e-6
        )
        assert float(res.toi) == pytest.approx(0.5, abs=1e-3)

    def test_gather_ee(self):
        v0 = np.array([[-1, 0, 1], [1, 0, 1], [0, -1, 0], [0, 1, 0]], np.float64)
        v1 = v0.copy()
        v1[:2, 2] = -1.0
        edges = np.array([[0, 1], [2, 3]])
        overlaps = jnp.asarray(np.array([[0, 1]], np.int32))
        q = gather_ee_queries(v0, v1, edges, overlaps)
        res = find_roots(
            q, jnp.ones((1,), bool), False, toi_init=jnp.inf, ms=0.0, tolerance=1e-6
        )
        assert float(res.toi) == pytest.approx(0.5, abs=1e-3)

    def test_packed_tables_match_direct_gathers(self):
        """pack_face_table/pack_edge_table-based gathers must reproduce the
        direct per-query gathers bit-for-bit on random candidate sets."""
        from scalable_ccd_tpu.narrow_phase import (
            concat_frames,
            pack_edge_table,
            pack_face_table,
        )

        rng = np.random.default_rng(11)
        nv, nf, ne, q = 40, 25, 30, 64
        v0 = rng.normal(size=(nv, 3))
        v1 = v0 + 0.1 * rng.normal(size=(nv, 3))
        faces = rng.integers(0, nv, size=(nf, 3)).astype(np.int32)
        edges = rng.integers(0, nv, size=(ne, 2)).astype(np.int32)
        vcat = concat_frames(v0, v1, jnp.float32)

        ovf = jnp.asarray(np.stack([
            rng.integers(0, nv, q), rng.integers(0, nf, q)
        ], 1).astype(np.int32))
        a = gather_vf_queries(v0, v1, faces, ovf, dtype=jnp.float32)
        b = gather_vf_queries(
            v0, v1, faces, ovf, dtype=jnp.float32, vcat=vcat,
            ftab=pack_face_table(vcat, faces),
        )
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

        ove = jnp.asarray(rng.integers(0, ne, size=(q, 2)).astype(np.int32))
        a = gather_ee_queries(v0, v1, edges, ove, dtype=jnp.float32)
        b = gather_ee_queries(
            v0, v1, edges, ove, dtype=jnp.float32, vcat=vcat,
            etab=pack_edge_table(vcat, edges),
        )
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_ee_tolerance_matches_reference_corner_lists():
    """Independent check of the EE tolerance quirk (root_finder.cu:69-88):
    the reference's corner-difference lists give tol = (ext_t, ext_t, ext_u)
    — the u extent lands in the v slot.  Computed here directly from the
    reference's p_tuv corner algebra, not via the library's extent helper."""
    from scalable_ccd_tpu.narrow_phase.types import compute_tolerance

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(3, 8, 3))
    co = 1e-6

    v0s, v1s, v2s, v3s, v0e, v1e, v2e, v3e = (pts[:, i] for i in range(8))
    # p[tuv] = F at the corner (EE: F = (a0 + (a1-a0)u) - (b0 + (b1-b0)v))
    p = {}
    for t, (a0, a1, b0, b1) in enumerate(((v0s, v1s, v2s, v3s), (v0e, v1e, v2e, v3e))):
        p[(t, 0, 0)] = a0 - b0
        p[(t, 0, 1)] = a0 - b1
        p[(t, 1, 0)] = a1 - b0
        p[(t, 1, 1)] = a1 - b1

    def max_linf_4(quads):
        return np.max([np.abs(p[b] - p[a]).max(axis=-1) for a, b in quads], axis=0)

    # reference argument lists, compute_edge_edge_tolerance (root_finder.cu:69-88)
    t_pairs = [((0, u, v), (1, u, v)) for u in (0, 1) for v in (0, 1)]
    u_pairs = [((t, 0, v), (t, 1, v)) for t in (0, 1) for v in (0, 1)]
    expected = np.stack(
        [co / (3 * max_linf_4(t_pairs)),
         co / (3 * max_linf_4(t_pairs)),
         co / (3 * max_linf_4(u_pairs))], axis=1)

    tol = np.asarray(compute_tolerance(_queries_from_pts(pts), False, co))
    np.testing.assert_allclose(tol, expected, rtol=1e-12)
