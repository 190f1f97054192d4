"""Broad-phase tests: sweep vs brute-force oracle, exact pair-set parity.

The reference checks its broad phases are a *superset* of downloaded ground
truth (``tests/ground_truth.cpp:55-63``).  With the in-repo brute-force
oracle we can assert something stronger: the sweep must produce *exactly*
the filtered AABB-overlap set (same boxes, same filters), on both the
one-list (edge-edge) and two-list (vertex-face) paths, across chunk-size
boundaries.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scalable_ccd_tpu.broad_phase import (
    brute_force_overlaps,
    detect_overlaps,
    merge_two_lists,
    sort_boxes,
)
from scalable_ccd_tpu.geometry import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere, triangle_soup


def _pair_set(pairs: np.ndarray) -> set:
    return set(map(tuple, np.asarray(pairs).tolist()))


def _build(scene, dtype=jnp.float64, ms=0.0):
    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, ms, dtype=dtype)
    eb = build_edge_boxes(vb, scene.edges)
    fb = build_face_boxes(vb, scene.faces)
    return vb, eb, fb


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_ee_one_list_matches_brute_force(seed, dtype):
    scene = triangle_soup(150, motion=0.15, seed=seed)
    _, eb, _ = _build(scene, dtype)
    expected = _pair_set(brute_force_overlaps(eb))
    got = _pair_set(detect_overlaps(sort_boxes(eb), is_two_lists=False))
    assert got == expected
    assert len(expected) > 0


@pytest.mark.parametrize("seed", [0, 1])
def test_vf_two_list_matches_brute_force(seed):
    scene = triangle_soup(120, motion=0.15, seed=seed)
    vb, _, fb = _build(scene)
    expected = _pair_set(brute_force_overlaps(vb, fb))
    merged = merge_two_lists(vb, fb)
    got = _pair_set(detect_overlaps(sort_boxes(merged), is_two_lists=True))
    assert got == expected
    assert len(expected) > 0


def test_chunked_sweep_matches_unchunked():
    """Tiny chunk sizes must not change the pair set (the reference's
    MAX_OVERLAP_CUTOFF chunking contract, broad_phase.cu:121-224)."""
    scene = triangle_soup(200, motion=0.2, seed=3)
    _, eb, _ = _build(scene)
    sb = sort_boxes(eb)
    full = _pair_set(detect_overlaps(sb, is_two_lists=False))
    tiny = _pair_set(
        detect_overlaps(sb, is_two_lists=False, box_chunk_size=64, pair_chunk_size=128)
    )
    assert tiny == full


def test_padded_sort_matches():
    """Sentinel padding must not introduce or drop pairs."""
    scene = triangle_soup(100, motion=0.2, seed=4)
    _, eb, _ = _build(scene)
    unpadded = _pair_set(detect_overlaps(sort_boxes(eb), is_two_lists=False))
    padded_boxes = sort_boxes(eb, pad_to=1024)
    padded = _pair_set(
        detect_overlaps(padded_boxes, is_two_lists=False, n_real_boxes=int(eb.n))
    )
    assert padded == unpadded


@pytest.mark.parametrize("bucket_minor", [False, True])
def test_sort_boxes_reorder_sort_bitexact(bucket_minor):
    """reorder="sort" (one multi-operand stable lax.sort) must be
    bit-identical to the default argsort + stacked-gather path: both are
    stable over the same key, so every field — including the f32 bit
    patterns — must match exactly."""
    scene = cloth_on_sphere(grid_n=16, sphere_subdiv=1, drop=0.3)
    vb, eb, _ = _build(scene, jnp.float32)
    for boxes in (eb, vb):
        a = sort_boxes(boxes, bucket_minor=bucket_minor, reorder="gather")
        b = sort_boxes(boxes, bucket_minor=bucket_minor, reorder="sort")
        for fa, fb_ in zip(a, b):
            assert np.array_equal(
                np.asarray(fa).view(np.int32), np.asarray(fb_).view(np.int32)
            )


def test_cloth_scene_smoke_counts():
    """Contact-rich scene: VF and EE candidate sets are non-empty and exact."""
    scene = cloth_on_sphere(grid_n=24, sphere_subdiv=2, drop=0.3)
    vb, eb, fb = _build(scene, jnp.float32)
    vf = detect_overlaps(sort_boxes(merge_two_lists(vb, fb)), is_two_lists=True)
    ee = detect_overlaps(sort_boxes(eb), is_two_lists=False)
    assert _pair_set(vf) == _pair_set(brute_force_overlaps(vb, fb))
    assert _pair_set(ee) == _pair_set(brute_force_overlaps(eb))
    assert len(vf) > 100 and len(ee) > 100


def test_shared_vertex_pairs_excluded():
    """Adjacent faces sharing vertices must never appear as VF candidates for
    their own vertices (covertex filter, collision.cuh:17-21)."""
    scene = cloth_on_sphere(grid_n=8, sphere_subdiv=1, drop=0.0)
    vb, _, fb = _build(scene)
    vf = detect_overlaps(sort_boxes(merge_two_lists(vb, fb)), is_two_lists=True)
    faces = scene.faces
    for v_id, f_id in map(tuple, np.asarray(vf).tolist()):
        assert v_id not in faces[f_id], (v_id, f_id)


def test_detect_overlaps_fused_matches_chunked():
    """Single-dispatch broad phase == chunked collection, as sets."""
    import jax.numpy as jnp
    import numpy as np

    from scalable_ccd_tpu.broad_phase import detect_overlaps, sort_boxes
    from scalable_ccd_tpu.broad_phase import merge_two_lists
    from scalable_ccd_tpu.geometry.aabb import (
        build_face_boxes,
        build_vertex_boxes,
    )
    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
    from scalable_ccd_tpu.pipeline.fused import detect_overlaps_fused

    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.5)
    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float32)
    fb = build_face_boxes(vb, scene.faces)
    sb = sort_boxes(merge_two_lists(vb, fb))
    want = set(map(tuple, detect_overlaps(sb, is_two_lists=True).tolist()))
    pairs, count, overflow = detect_overlaps_fused(sb, True, pair_budget=1 << 16)
    assert not bool(overflow)
    got = set(map(tuple, np.asarray(pairs[: int(count)]).tolist()))
    assert got == want


def test_sweep_chunks_fast_overflow_fallback():
    """Tiny pair budget forces the per-chunk exact fallback; set unchanged."""
    import jax.numpy as jnp
    import numpy as np

    from scalable_ccd_tpu.broad_phase import detect_overlaps, merge_two_lists, sort_boxes
    from scalable_ccd_tpu.geometry.aabb import build_face_boxes, build_vertex_boxes
    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
    from scalable_ccd_tpu.pipeline.fused import sweep_chunks_fast

    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.5)
    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float32)
    fb = build_face_boxes(vb, scene.faces)
    sb = sort_boxes(merge_two_lists(vb, fb))
    want = set(map(tuple, detect_overlaps(sb, is_two_lists=True).tolist()))
    got = set()
    for pairs, count in sweep_chunks_fast(sb, True, box_chunk_size=256, pair_budget=64):
        got.update(map(tuple, np.asarray(pairs[:count]).tolist()))
    assert got == want


def test_box_chunk_halving_preserves_pair_set():
    """A tiny max_pairs_per_box_chunk forces host-side box-chunk halving
    (the int32-safety valve mirroring handleBroadPhaseOverflow,
    memory_handler.cpp:55-79); the pair set must be unchanged."""
    from scalable_ccd_tpu.broad_phase import sweep_chunks

    scene = triangle_soup(200, motion=0.2, seed=5)
    _, eb, _ = _build(scene)
    sb = sort_boxes(eb)
    full = _pair_set(detect_overlaps(sb, is_two_lists=False))

    out = []
    for pairs, count in sweep_chunks(
        sb, False, box_chunk_size=256, pair_chunk_size=128,
        max_pairs_per_box_chunk=64,  # far below any real chunk total
    ):
        if count:
            out.append(np.asarray(pairs[:count]))
    halved = _pair_set(np.concatenate(out) if out else np.zeros((0, 2), np.int32))
    assert halved == full


def test_pad_rows_have_zero_runs():
    """Sentinel pad rows must have genuinely empty major runs: no pad-pad
    slot is ever enumerated (they carry an inverted major interval)."""
    from scalable_ccd_tpu.broad_phase.sweep import count_major_runs

    scene = triangle_soup(50, motion=0.2, seed=6)
    _, eb, _ = _build(scene)
    n = int(eb.n)
    padded = sort_boxes(eb, pad_to=n + 257)
    k = np.asarray(count_major_runs(padded, jnp.int32(0), padded.n))
    assert (k[n:] == 0).all()
