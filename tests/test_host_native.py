"""Native C++ host broad phase vs the in-repo oracles.

Mirrors the reference's CPU broad-phase test (``tests/test_broad_phase.cpp``):
exact candidate sets on a contact scene, both pairings, plus agreement with
the brute-force oracle and the TPU sweep.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu import host
from scalable_ccd_tpu.broad_phase import (
    brute_force_overlaps,
    detect_overlaps,
    merge_two_lists,
    sort_boxes,
)
from scalable_ccd_tpu.geometry.aabb import (
    AABBs,
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere

pytestmark = pytest.mark.skipif(
    not host.native_available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def scene():
    return cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.6)


def _vertex_ids(n):
    ids = np.arange(n, dtype=np.int32)
    return np.stack([ids, -ids - 1, -ids - 1], axis=1)


def _edge_vertex_ids(e):
    return np.stack([e[:, 0], e[:, 1], -e[:, 0] - 1], axis=1).astype(np.int32)


def _native_boxes(scene):
    vmin, vmax = host.build_vertex_boxes(scene.vertices_t0, scene.vertices_t1)
    emin, emax = host.build_element_boxes(vmin, vmax, scene.edges)
    fmin, fmax = host.build_element_boxes(vmin, vmax, scene.faces)
    return (vmin, vmax), (emin, emax), (fmin, fmax)


def test_boxes_match_jax(scene):
    # XLA:CPU flushes f64 denormals to zero while C++ keeps them, so bounds
    # at exactly-0 coordinates differ by ~5e-324; equal otherwise.
    denormal = 1e-300

    (vmin, vmax), (emin, emax), (fmin, fmax) = _native_boxes(scene)
    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float64)
    np.testing.assert_allclose(vmin, np.asarray(vb.min), rtol=0, atol=denormal)
    np.testing.assert_allclose(vmax, np.asarray(vb.max), rtol=0, atol=denormal)
    eb = build_edge_boxes(vb, scene.edges)
    np.testing.assert_allclose(emin, np.asarray(eb.min), rtol=0, atol=denormal)
    np.testing.assert_allclose(emax, np.asarray(eb.max), rtol=0, atol=denormal)
    fb = build_face_boxes(vb, scene.faces)
    np.testing.assert_allclose(fmin, np.asarray(fb.min), rtol=0, atol=denormal)
    np.testing.assert_allclose(fmax, np.asarray(fb.max), rtol=0, atol=denormal)


def test_ee_one_list_matches_oracle(scene):
    (vmin, vmax), (emin, emax), _ = _native_boxes(scene)
    e = scene.edges
    pairs, next_axis = host.sort_and_sweep(
        emin, emax, _edge_vertex_ids(e), np.arange(len(e), dtype=np.int32)
    )
    got = set(map(tuple, pairs.tolist()))

    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float64)
    eb = build_edge_boxes(vb, e)
    want = set(map(tuple, brute_force_overlaps(eb).tolist()))
    assert got == want
    assert next_axis in (0, 1, 2)


def test_vf_two_list_matches_tpu_sweep(scene):
    (vmin, vmax), _, (fmin, fmax) = _native_boxes(scene)
    nv, nf = len(vmin), len(fmin)
    # merged two-list input: list A (vertices) id-flipped, list B (faces)
    bmin = np.concatenate([vmin, fmin])
    bmax = np.concatenate([vmax, fmax])
    vids = np.concatenate(
        [_vertex_ids(nv), np.asarray(scene.faces, np.int32)]
    )
    eids = np.concatenate(
        [-np.arange(nv, dtype=np.int32) - 1, np.arange(nf, dtype=np.int32)]
    )
    pairs, _ = host.sort_and_sweep(bmin, bmax, vids, eids, two_lists=True)
    got = set(map(tuple, pairs.tolist()))

    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float64)
    fb = build_face_boxes(vb, scene.faces)
    tpu = detect_overlaps(sort_boxes(merge_two_lists(vb, fb)), is_two_lists=True)
    assert got == set(map(tuple, tpu.tolist()))


def test_threading_invariance(scene):
    _, (emin, emax), _ = _native_boxes(scene)
    e = scene.edges
    vids = _edge_vertex_ids(e)
    eids = np.arange(len(e), dtype=np.int32)
    p1, _ = host.sort_and_sweep(emin, emax, vids, eids, n_threads=1)
    p8, _ = host.sort_and_sweep(emin, emax, vids, eids, n_threads=8)
    assert set(map(tuple, p1.tolist())) == set(map(tuple, p8.tolist()))


def test_empty():
    pairs, _ = host.sort_and_sweep(
        np.zeros((0, 3)), np.zeros((0, 3)),
        np.zeros((0, 3), np.int32), np.zeros((0,), np.int32),
    )
    assert pairs.shape == (0, 2)


def test_batched_sweep_matches_unbatched(monkeypatch):
    """SCCD_HOST_BATCH forces the adaptive box batching (the reference's
    halve-on-OOM loop, sort_and_sweep.cpp:144-196); the pair set must be
    identical to the single-batch run."""
    import os

    import numpy as np

    from scalable_ccd_tpu import host
    from scalable_ccd_tpu.geometry.scenes import triangle_soup

    if not host.native_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    scene = triangle_soup(150, motion=0.2, seed=7)
    vmin, vmax = host.build_vertex_boxes(scene.vertices_t0, scene.vertices_t1)
    f = np.asarray(scene.faces, np.int32)
    emin, emax = host.build_element_boxes(vmin, vmax, f)
    vids = np.stack([f[:, 0], f[:, 1], f[:, 2]], axis=1).astype(np.int32)
    eids = np.arange(len(f), dtype=np.int32)

    full, ax_full = host.sort_and_sweep(emin, emax, vids, eids)
    monkeypatch.setenv("SCCD_HOST_BATCH", "7")
    batched, ax_b = host.sort_and_sweep(emin, emax, vids, eids)
    assert ax_b == ax_full
    assert set(map(tuple, full.tolist())) == set(map(tuple, batched.tolist()))
    assert len(full) > 0
