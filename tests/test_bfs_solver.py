"""Frontier (BFS) solver vs the DFS oracle twin.

With unbounded iterations and no buffer overflow the accepted-domain set is
exploration-order independent, so the two solvers must agree exactly on every
per-query TOI.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.narrow_phase import find_roots, find_roots_bfs
from tests.test_narrow_phase import _queries_from_pts, _random_queries, vf_drop_query


def _solve_both(pts, is_vf, **kw):
    q = _queries_from_pts(pts)
    valid = jnp.ones((q.n,), bool)
    kw.setdefault("toi_init", jnp.inf)
    kw.setdefault("ms", 0.0)
    kw.setdefault("tolerance", 1e-6)
    dfs = find_roots(q, valid, is_vf, toi_per_query=True, **kw)
    bfs = find_roots_bfs(
        q, valid, is_vf, toi_per_query=True, frontier_capacity=512 * q.n, **kw
    )
    return dfs, bfs


@pytest.mark.parametrize("is_vf", [True, False], ids=["vf", "ee"])
def test_bfs_matches_dfs(is_vf):
    pts = _random_queries(48, seed=13 if is_vf else 14, is_vf=is_vf)
    dfs, bfs = _solve_both(pts, is_vf)
    assert not bool(np.any(np.asarray(bfs.overflow)))
    np.testing.assert_allclose(
        np.asarray(bfs.per_query_toi), np.asarray(dfs.per_query_toi),
        rtol=0, atol=0,
    )
    # total work is comparable (same domains modulo pruning-order effects)
    assert int(bfs.checks.sum()) <= 4 * int(dfs.checks.sum()) + 100


@pytest.mark.parametrize("is_vf", [True, False], ids=["vf", "ee"])
def test_bfs_matches_dfs_with_ms(is_vf):
    pts = _random_queries(24, seed=21, is_vf=is_vf)
    cap = 20_000
    dfs, bfs = _solve_both(pts, is_vf, ms=0.05, max_iterations=cap)
    # the cap binds at different points for different exploration orders;
    # queries that completed under the cap in BOTH solvers explored their
    # full tree and must agree exactly
    done = (np.asarray(dfs.checks) < cap) & (np.asarray(bfs.checks) < cap)
    assert done.sum() >= len(pts) // 2  # most queries are generic
    d = np.asarray(dfs.per_query_toi)[done]
    b = np.asarray(bfs.per_query_toi)[done]
    np.testing.assert_allclose(b, d, rtol=0, atol=0)


def test_bfs_global_mode_matches():
    pts = _random_queries(48, seed=5, is_vf=True)
    q = _queries_from_pts(pts)
    valid = jnp.ones((q.n,), bool)
    dfs = find_roots(q, valid, True, toi_init=jnp.inf, ms=0.0, tolerance=1e-6)
    bfs = find_roots_bfs(
        q, valid, True, toi_init=jnp.inf, ms=0.0, tolerance=1e-6,
        frontier_capacity=512 * q.n,
    )
    assert float(bfs.toi) == float(dfs.toi)


def test_bfs_invalid_rows_and_toi_init():
    q = _queries_from_pts([vf_drop_query(1.0, 2.0)] * 3)
    valid = jnp.array([True, False, True])
    res = find_roots_bfs(
        q, valid, True, toi_init=0.1, ms=0.0, tolerance=1e-6,
        frontier_capacity=4096,
    )
    assert np.isinf(float(res.per_query_toi[1]))
    assert int(res.checks[1]) == 0
    # toi_init prunes everything later than 0.1
    assert float(res.toi) == pytest.approx(0.1)


def test_bfs_overflow_is_conservative():
    """A tiny frontier forces spills; the result may only get earlier."""
    pts = _random_queries(16, seed=3, is_vf=True)
    q = _queries_from_pts(pts)
    valid = jnp.ones((q.n,), bool)
    big = find_roots_bfs(
        q, valid, True, toi_init=jnp.inf, ms=0.0, tolerance=1e-6,
        toi_per_query=True, frontier_capacity=8192,
    )
    tiny = find_roots_bfs(
        q, valid, True, toi_init=jnp.inf, ms=0.0, tolerance=1e-6,
        toi_per_query=True, frontier_capacity=16,
    )
    assert bool(np.any(np.asarray(tiny.overflow)))
    b = np.asarray(big.per_query_toi)
    t = np.asarray(tiny.per_query_toi)
    # conservative: overflowed answers are never LATER than the exact ones
    assert np.all(t <= b + 1e-15)
