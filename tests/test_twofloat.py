"""Double-word f32 arithmetic and the compensated inclusion function.

The compensated mode is the TPU stand-in for the reference's default
``Scalar=double`` build (``CMakeLists.txt:69``): these tests check the
error-free transforms against exact f64, the compensated corner evaluation
against the f64 corner evaluation, and that the compensated solvers recover
the f64-oracle TOI on a scene where plain f32 demonstrably collapses to 0
(the committed dense-cluster golden scene).
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.ops import twofloat as tf

RNG = np.random.default_rng(7)


def _rand_f32(n, scale_pow_range=(-6, 6)):
    """f32 values across many binades (magnitude diversity stresses the
    splits and renormalizations)."""
    m = RNG.uniform(-1, 1, n)
    e = RNG.integers(*scale_pow_range, n)
    return (m * (2.0 ** e)).astype(np.float32)


class TestPrimitives:
    def test_two_sum_error_free(self):
        a, b = _rand_f32(4096), _rand_f32(4096)
        s, e = tf.two_sum(jnp.asarray(a), jnp.asarray(b))
        # the sum of two f32 is exact in f64, so s + e must equal it exactly
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        want = a.astype(np.float64) + b.astype(np.float64)
        np.testing.assert_array_equal(got, want)

    def test_two_prod_error_free(self):
        a, b = _rand_f32(4096), _rand_f32(4096)
        p, e = tf.two_prod(jnp.asarray(a), jnp.asarray(b))
        # the product of two f32 (<= 48 mantissa bits) is exact in f64
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        want = a.astype(np.float64) * b.astype(np.float64)
        np.testing.assert_array_equal(got, want)

    def test_dw_chain_accuracy(self):
        """A chain of dw ops tracks f64 to ~2^-44 relative — far beyond
        f32's 2^-24."""
        n = 4096
        xs = [_rand_f32(n) for _ in range(4)]
        fs = [_rand_f32(n, (-2, 2)) for _ in range(2)]
        # ((x0 - x1) * f0 + x2) - (x3 * f1)  in dw and in f64
        d = tf.f_sub(jnp.asarray(xs[0]), jnp.asarray(xs[1]))
        d = tf.add_f(tf.mul_f(d, jnp.asarray(fs[0])), jnp.asarray(xs[2]))
        d = tf.sub(d, tf.mul_f(tf.from_f(jnp.asarray(xs[3])), jnp.asarray(fs[1])))
        got = np.asarray(d[0], np.float64) + np.asarray(d[1], np.float64)
        x64 = [x.astype(np.float64) for x in xs]
        f64 = [f.astype(np.float64) for f in fs]
        want = ((x64[0] - x64[1]) * f64[0] + x64[2]) - x64[3] * f64[1]
        scale = np.maximum.reduce(
            [np.abs(v) for v in (x64[0], x64[1], x64[2], x64[3], want)]
        ) + 1e-30
        rel = np.abs(got - want) / scale
        assert rel.max() < 2.0 ** -44

    def test_minimum_maximum(self):
        a, b = _rand_f32(1024), _rand_f32(1024)
        x = tf.two_sum(jnp.asarray(a), jnp.asarray(b))
        y = tf.two_sum(jnp.asarray(b), jnp.asarray(-a))
        xa = np.asarray(x[0], np.float64) + np.asarray(x[1], np.float64)
        ya = np.asarray(y[0], np.float64) + np.asarray(y[1], np.float64)
        mn = tf.minimum(x, y)
        mx = tf.maximum(x, y)
        np.testing.assert_array_equal(
            np.asarray(mn[0], np.float64) + np.asarray(mn[1], np.float64),
            np.minimum(xa, ya),
        )
        np.testing.assert_array_equal(
            np.asarray(mx[0], np.float64) + np.asarray(mx[1], np.float64),
            np.maximum(xa, ya),
        )


class TestCompensatedCorners:
    @pytest.mark.parametrize("is_vf", [True, False])
    def test_matches_f64_corners(self, is_vf):
        """domain_corners_df (f32 inputs) vs domain_corners in f64: the
        double-word result must sit within the compensated error filter of
        the f64 value."""
        from scalable_ccd_tpu.narrow_phase.types import (
            CCDQueries,
            COMPENSATED_EPS,
            domain_corners,
            domain_corners_df,
        )

        n = 512
        pts32 = [
            jnp.asarray(_rand_f32(3 * n, (-3, 3)).reshape(n, 3))
            for _ in range(8)
        ]
        q32 = CCDQueries(*pts32)
        q64 = CCDQueries(*[p.astype(jnp.float64) for p in pts32])
        # random dyadic domain bounds (exact in both dtypes)
        lo = RNG.integers(0, 8, (n, 3)).astype(np.float32) / 16
        hi = lo + RNG.integers(1, 8, (n, 3)).astype(np.float32) / 16
        ch, cl = domain_corners_df(
            q32, jnp.asarray(lo), jnp.asarray(hi), is_vf
        )
        got = np.asarray(ch, np.float64) + np.asarray(cl, np.float64)
        want = np.asarray(
            domain_corners(
                q64, jnp.asarray(lo, jnp.float64),
                jnp.asarray(hi, jnp.float64), is_vf,
            )
        )
        m = np.maximum(
            np.max(np.abs(np.stack([np.asarray(p) for p in pts32])), axis=(0, 2)),
            1.0,
        )  # (n,)
        bound = (m ** 3 * 30 * COMPENSATED_EPS)[:, None, None, None, None]
        assert np.all(np.abs(got - want) <= bound)


class TestCompensatedSolver:
    def _dense_cluster_queries(self):
        """The committed dense-cluster golden scene: plain f32 collapses its
        TOI to 0 (tests/test_golden_data.py), the f64 oracle says 7.17e-4."""
        here = os.path.dirname(os.path.abspath(__file__))
        base = os.path.join(here, "golden", "dense-cluster")
        from scalable_ccd_tpu.geometry import (
            build_edge_boxes,
            build_face_boxes,
            build_vertex_boxes,
            edges_from_faces,
            read_ply,
        )
        from scalable_ccd_tpu.broad_phase import brute_force_overlaps

        v0, f = read_ply(os.path.join(base, "frames", "f0.ply"))
        v1, _ = read_ply(os.path.join(base, "frames", "f1.ply"))
        edges = edges_from_faces(f)
        with open(os.path.join(base, "toi.json")) as fh:
            golden = json.load(fh)
        vb = build_vertex_boxes(v0, v1, dtype=jnp.float64)
        eb = build_edge_boxes(vb, edges)
        fb = build_face_boxes(vb, f)
        vf = brute_force_overlaps(vb, fb)
        ee = brute_force_overlaps(eb)
        return v0, v1, edges, f, vf, ee, golden["toi"]

    @pytest.mark.parametrize("solver", ["dfs", "bfs"])
    def test_recovers_f64_oracle_where_f32_fails(self, solver):
        from scalable_ccd_tpu.narrow_phase import (
            find_roots,
            find_roots_bfs,
            gather_ee_queries,
            gather_vf_queries,
        )

        v0, v1, edges, faces, vf, ee, golden_toi = (
            self._dense_cluster_queries()
        )
        solve = find_roots if solver == "dfs" else find_roots_bfs

        tois = {}
        for compensated in (False, True):
            toi = 1.0
            for is_vf, cands in ((True, vf), (False, ee)):
                if not len(cands):
                    continue
                gather = gather_vf_queries if is_vf else gather_ee_queries
                prim = faces if is_vf else edges
                q = gather(v0, v1, prim, jnp.asarray(cands), dtype=jnp.float32)
                res = solve(
                    q, jnp.ones((q.n,), bool), is_vf, toi_init=toi, ms=0.0,
                    tolerance=1e-6, compensated=compensated,
                )
                toi = float(res.toi)
            tois[compensated] = toi

        # plain f32: the error envelope swallows the scene -> t = 0
        assert tois[False] == 0.0
        # compensated: recovers the f64 oracle value (conservative + tight)
        assert 0.0 < tois[True] <= golden_toi * (1 + 1e-4) + 1e-9
        assert tois[True] == pytest.approx(golden_toi, rel=2e-2)

    def test_agrees_with_f32_where_f32_suffices(self):
        """On a well-separated scene the compensated mode must match the
        plain-f32 result (same acceptance semantics, tighter envelope)."""
        from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
        from scalable_ccd_tpu.broad_phase import brute_force_overlaps
        from scalable_ccd_tpu.geometry import (
            build_edge_boxes,
            build_face_boxes,
            build_vertex_boxes,
        )
        from scalable_ccd_tpu.narrow_phase import (
            find_roots_bfs,
            gather_vf_queries,
        )

        scene = cloth_on_sphere(grid_n=10, sphere_subdiv=1, drop=0.6)
        vb = build_vertex_boxes(
            scene.vertices_t0, scene.vertices_t1, dtype=jnp.float32
        )
        fb = build_face_boxes(vb, scene.faces)
        vf = brute_force_overlaps(vb, fb)
        q = gather_vf_queries(
            scene.vertices_t0, scene.vertices_t1, scene.faces,
            jnp.asarray(vf), dtype=jnp.float32,
        )
        kw = dict(toi_init=1.0, ms=0.0, tolerance=1e-6)
        r32 = find_roots_bfs(q, jnp.ones((q.n,), bool), True, **kw)
        rdw = find_roots_bfs(
            q, jnp.ones((q.n,), bool), True, compensated=True, **kw
        )
        assert float(rdw.toi) == pytest.approx(float(r32.toi), rel=1e-3)

    def test_sharded_compensated_matches_single_chip(self):
        """precision='compensated' through the 8-shard pooled narrow loop
        equals the single-chip compensated fused result on the scene where
        plain f32 collapses."""
        from scalable_ccd_tpu.parallel.sharded import sharded_ccd
        from scalable_ccd_tpu.pipeline.fused import fused_ccd

        v0, v1, edges, faces, *_ , golden_toi = self._dense_cluster_queries()
        single = fused_ccd(
            v0, v1, edges, faces, precision="compensated",
            dtype=jnp.float32,
        )
        multi = sharded_ccd(
            v0, v1, edges, faces, precision="compensated",
            vf_budget_per_shard=1 << 12, ee_budget_per_shard=1 << 12,
        )
        assert not bool(multi.overflowed)
        assert float(multi.toi) == pytest.approx(float(single.toi), abs=1e-7)
        assert float(multi.toi) == pytest.approx(golden_toi, rel=2e-2)
