"""Sort-based data-movement primitives vs numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.ops import compact_rows, searchsorted_sorted


@pytest.mark.parametrize("seed", range(5))
def test_searchsorted_sorted_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 300))
    b = int(rng.integers(1, 400))
    arr = np.sort(rng.integers(0, 60, n)).astype(np.int32)
    q = np.sort(rng.integers(-5, 65, b)).astype(np.int32)
    for side in ("left", "right"):
        got = np.asarray(searchsorted_sorted(jnp.asarray(arr), jnp.asarray(q), side))
        np.testing.assert_array_equal(got, np.searchsorted(arr, q, side=side))


def test_searchsorted_sorted_floats():
    rng = np.random.default_rng(42)
    arr = np.sort(rng.random(257).astype(np.float32))
    q = np.sort(np.concatenate([rng.random(100).astype(np.float32), arr[:20]]))
    got = np.asarray(searchsorted_sorted(jnp.asarray(arr), jnp.asarray(q), "right"))
    np.testing.assert_array_equal(got, np.searchsorted(arr, q, side="right"))


@pytest.mark.parametrize("seed", range(5))
def test_compact_rows_stable(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 500))
    keep = rng.random(n) < 0.35
    a = rng.integers(0, 1000, n).astype(np.int32)
    b = rng.random((n, 3)).astype(np.float32)
    c, oa, ob = compact_rows(jnp.asarray(keep), jnp.asarray(a), jnp.asarray(b))
    c = int(c)
    assert c == keep.sum()
    np.testing.assert_array_equal(np.asarray(oa[:c]), a[keep])
    np.testing.assert_array_equal(np.asarray(ob[:c]), b[keep])


def test_compact_rows_all_and_none():
    a = jnp.arange(8, dtype=jnp.int32)
    c, out = compact_rows(jnp.ones((8,), bool), a)
    assert int(c) == 8 and np.asarray(out).tolist() == list(range(8))
    c, out = compact_rows(jnp.zeros((8,), bool), a)
    assert int(c) == 0
