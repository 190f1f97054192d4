"""Golden-data parity tests against the Sample-Scalable-CCD-Data set.

Port of the reference's dataset harness so that, when the pinned dataset
(github.com/Continuous-Collision-Detection/Sample-Scalable-CCD-Data,
commit f24a3b15) is available, this repo checks the exact same bars:

- ``compare_mathematica`` (``tests/ground_truth.cpp:27-64``): the computed
  overlap set must be a **superset** of the ground-truth positive pairs
  (conservativeness — false positives allowed, misses are failures).
- PLY fixture loading (``tests/io.cpp:10-38``): both frames +
  ``igl::edges``-style edge extraction, via the in-repo
  :func:`scalable_ccd_tpu.geometry.mesh.read_ply` / ``edges_from_faces``.
- The 5 scenes and element-id offset convention of
  ``tests/test_broad_phase.cu:31-65,109-118`` (ee ids += n_vertices,
  vf face ids += n_vertices + n_edges).
- Box counts 46,598 / 138,825 / 92,230 and the full-pipeline TOI
  2^-18 = 3.814697265625e-06 on cloth-ball 92->93
  (``tests/test_broad_phase.cpp:36-38``, ``tests/test_narrow_phase.cu:65``).
- Candidate-count parity 1,655,541 / 5,197,332
  (``tests/test_broad_phase.cpp:62-63``) as a strict=False xfail: the hard
  contract is the superset; count equality additionally requires
  bit-identical conservative inflation.

The dataset is not retrievable offline (DNS fails in this environment);
every test here skips unless ``SCALABLE_CCD_DATA_DIR`` points at the data
(or it sits in ``tests/data/``), mirroring
``SCALABLE_CCD_USE_EXISTING_DATA_DIR`` (``cmake/recipes/sample_data.cmake``).
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.broad_phase import (
    detect_overlaps,
    merge_two_lists,
    sort_boxes,
)
from scalable_ccd_tpu.geometry import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
    edges_from_faces,
    read_ply,
)

# --------------------------------------------------------------------------
# Data location (sample_data.cmake:11-23 allows an existing dir; here the
# env var is the only hook since there is no configure step)

_HERE = os.path.dirname(os.path.abspath(__file__))
DATA_DIR = os.environ.get(
    "SCALABLE_CCD_DATA_DIR", os.path.join(_HERE, "data")
)

#: scene -> (frame_t0, frame_t1, vf_truth, ee_truth), matching
#: tests/test_broad_phase.cu:31-65
SCENES = {
    "armadillo-rollers": (
        "frames/326.ply", "frames/327.ply",
        "boxes/326vf.json", "boxes/326ee.json",
    ),
    "cloth-ball": (
        "frames/cloth_ball92.ply", "frames/cloth_ball93.ply",
        "boxes/92vf.json", "boxes/92ee.json",
    ),
    "cloth-funnel": (
        "frames/227.ply", "frames/228.ply",
        "boxes/227vf.json", "boxes/227ee.json",
    ),
    "n-body-simulation": (
        "frames/balls16_18.ply", "frames/balls16_19.ply",
        "boxes/18vf.json", "boxes/18ee.json",
    ),
    "rod-twist": (
        "frames/3036.ply", "frames/3037.ply",
        "boxes/3036vf.json", "boxes/3036ee.json",
    ),
}


def _scene_paths(scene):
    t0, t1, vf, ee = SCENES[scene]
    base = os.path.join(DATA_DIR, scene)
    return tuple(os.path.join(base, p) for p in (t0, t1, vf, ee))


def _have(scene):
    return all(os.path.exists(p) for p in _scene_paths(scene))


needs_data = pytest.mark.skipif(
    not os.path.isdir(DATA_DIR),
    reason="Sample-Scalable-CCD-Data not available "
    "(set SCALABLE_CCD_DATA_DIR or clone into tests/data/)",
)


def parse_mesh(file_t0, file_t1):
    """PLY fixture loader (``tests/io.cpp:10-38``): (V0, V1, E, F)."""
    v0, f0 = read_ply(file_t0)
    v1, f1 = read_ply(file_t1)
    assert f0.shape == f1.shape
    return v0, v1, edges_from_faces(f0), f0


def compare_mathematica(overlaps, ground_truth_file):
    """Superset check (``tests/ground_truth.cpp:27-64``): every ground-truth
    positive pair must appear in the computed overlaps."""
    with open(ground_truth_file) as fh:
        truth = {(int(a), int(b)) for a, b in json.load(fh)}
    computed = set(map(tuple, np.asarray(overlaps, dtype=np.int64).tolist()))
    missing = truth - computed
    assert not missing, (
        f"{len(missing)}/{len(truth)} ground-truth pairs missing "
        f"(e.g. {sorted(missing)[:5]}) vs {ground_truth_file}"
    )


def _offset_for_truth(vf, ee, n_vertices, n_edges):
    """Element-id offsets into the ground truth's global id space
    (``tests/test_broad_phase.cu:109-118``)."""
    ee = np.asarray(ee, np.int64) + n_vertices
    vf = np.asarray(vf, np.int64).copy()
    vf[:, 1] += n_vertices + n_edges
    return vf, ee


def _broad_phase_overlaps(v0, v1, edges, faces, dtype=jnp.float64):
    vb = build_vertex_boxes(v0, v1, dtype=dtype)
    eb = build_edge_boxes(vb, edges)
    fb = build_face_boxes(vb, faces)
    vf = detect_overlaps(sort_boxes(merge_two_lists(vb, fb)), is_two_lists=True)
    ee = detect_overlaps(sort_boxes(eb), is_two_lists=False)
    return vf, ee, int(vb.n), int(eb.n), int(fb.n)


# --------------------------------------------------------------------------


def _check_scene_superset(scene):
    if not _have(scene):
        pytest.skip(f"{scene} files missing under {DATA_DIR}")
    f0, f1, vf_truth, ee_truth = _scene_paths(scene)
    v0, v1, edges, faces = parse_mesh(f0, f1)
    vf, ee, nv, ne, _ = _broad_phase_overlaps(v0, v1, edges, faces)
    vf, ee = _offset_for_truth(vf, ee, nv, ne)
    compare_mathematica(vf, vf_truth)
    compare_mathematica(ee, ee_truth)


@needs_data
@pytest.mark.parametrize("scene", sorted(SCENES))
def test_broad_phase_superset_of_ground_truth(scene):
    """The conservativeness bar on all 5 scenes, VF + EE
    (``tests/test_broad_phase.cu``)."""
    _check_scene_superset(scene)


@needs_data
def test_cloth_ball_box_counts():
    """Mesh-scale parity (``tests/test_broad_phase.cpp:36-38``)."""
    if not _have("cloth-ball"):
        pytest.skip(f"cloth-ball files missing under {DATA_DIR}")
    f0, f1, _, _ = _scene_paths("cloth-ball")
    v0, v1, edges, faces = parse_mesh(f0, f1)
    assert v0.shape[0] == 46_598
    assert edges.shape[0] == 138_825
    assert faces.shape[0] == 92_230


@needs_data
@pytest.mark.xfail(
    strict=False,
    reason="count parity needs bit-identical conservative inflation; the "
    "hard contract is the ground-truth superset "
    "(SURVEY.md §7 M2: superset required, count parity stretch)",
)
def test_cloth_ball_candidate_count_parity():
    """1,655,541 VF / 5,197,332 EE (``tests/test_broad_phase.cpp:62-63``)."""
    if not _have("cloth-ball"):
        pytest.skip(f"cloth-ball files missing under {DATA_DIR}")
    f0, f1, _, _ = _scene_paths("cloth-ball")
    v0, v1, edges, faces = parse_mesh(f0, f1)
    vf, ee, *_ = _broad_phase_overlaps(v0, v1, edges, faces)
    assert len(vf) == 1_655_541
    assert len(ee) == 5_197_332


@needs_data
def test_cloth_ball_full_pipeline_toi():
    """Full-pipeline TOI == 2^-18 on cloth-ball 92->93
    (``tests/test_narrow_phase.cu:41-65``: tol=1e-6, ms=0, max_iter=-1,
    allow_zero_toi).  Run in f32 (the TPU working dtype) with a relative
    tolerance; the value is a bisection artifact at a power of two, so f32
    reproduces it when acceptance agrees."""
    if not _have("cloth-ball"):
        pytest.skip(f"cloth-ball files missing under {DATA_DIR}")
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    f0, f1, _, _ = _scene_paths("cloth-ball")
    v0, v1, edges, faces = parse_mesh(f0, f1)
    res = fused_ccd(
        v0, v1, edges, faces,
        vf_budget=1 << 22, ee_budget=1 << 23,
        max_iterations=-1, tolerance=1e-6, dtype=jnp.float32,
    )
    assert not bool(res.overflowed)
    assert float(res.toi) == pytest.approx(3.814697265625e-06, rel=1e-3)


# --------------------------------------------------------------------------
# Committed golden dataset (tests/golden/, generated by tools/gen_golden.py):
# the compare_mathematica superset assertion and a full-pipeline golden TOI
# run in EVERY suite, against files that are an independent anchor in git —
# not recomputed by the code under test (VERDICT r4 missing #2).  The real
# pinned dataset stays env-gated above.

GOLDEN_DIR = os.path.join(_HERE, "golden")

#: same tuple layout as SCENES; truth from the f64 brute-force oracle,
#: TOI from the f64 per-query DFS root finder (scalar-oracle spot-checked
#: at generation time — tools/gen_golden.py)
GOLDEN_SCENES = {
    "cloth-sphere-16": (
        "frames/f0.ply", "frames/f1.ply",
        "boxes/f0vf.json", "boxes/f0ee.json",
    ),
    "soup-60": (
        "frames/f0.ply", "frames/f1.ply",
        "boxes/f0vf.json", "boxes/f0ee.json",
    ),
    "dense-cluster": (
        "frames/f0.ply", "frames/f1.ply",
        "boxes/f0vf.json", "boxes/f0ee.json",
    ),
}


def _golden_paths(scene):
    t0, t1, vf, ee = GOLDEN_SCENES[scene]
    base = os.path.join(GOLDEN_DIR, scene)
    return tuple(os.path.join(base, p) for p in (t0, t1, vf, ee))


@pytest.mark.parametrize("scene", sorted(GOLDEN_SCENES))
@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_committed_golden_superset(scene, dtype):
    """Broad-phase conservativeness vs the committed ground truth, both in
    the oracle dtype (must be an exact superset — in fact equal) and in the
    TPU working dtype f32 (whose ulp-inflated boxes must still cover every
    f64 truth pair)."""
    f0, f1, vf_truth, ee_truth = _golden_paths(scene)
    v0, v1, edges, faces = parse_mesh(f0, f1)
    vf, ee, nv, ne, _ = _broad_phase_overlaps(
        v0, v1, edges, faces, dtype=getattr(jnp, dtype)
    )
    vf, ee = _offset_for_truth(vf, ee, nv, ne)
    compare_mathematica(vf, vf_truth)
    compare_mathematica(ee, ee_truth)


#: scenes where plain f32 reproduces the f64 oracle TOI tightly.  The
#: dense-cluster scene is the demonstrated f32 FAILURE case: its co-located
#: geometry makes the f32 error bound (~30 eps_f32 m^3) swallow the true
#: separation and the pipeline conservative-accepts t=0 (oracle: 7.17e-4)
#: — the motivating scene for ``precision="compensated"`` (the reference's
#: USE_DOUBLE default, ``CMakeLists.txt:69``, has no plain-f32 answer here).
_TIGHT_F32 = {"cloth-sphere-16", "soup-60"}


@pytest.mark.parametrize("scene", sorted(GOLDEN_SCENES))
def test_committed_golden_toi(scene):
    """Full fused pipeline vs the committed f64-oracle earliest TOI (the
    role of ``test_narrow_phase.cu:65``'s 2^-18 cloth-ball value; f32
    pipeline, so a relative tolerance)."""
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    f0, f1, _, _ = _golden_paths(scene)
    with open(os.path.join(GOLDEN_DIR, scene, "toi.json")) as fh:
        golden = json.load(fh)
    v0, v1, edges, faces = parse_mesh(f0, f1)
    res = fused_ccd(
        v0, v1, edges, faces,
        max_iterations=-1, tolerance=golden["tolerance"],
        min_distance=golden["min_distance"],
        allow_zero_toi=golden["allow_zero_toi"], dtype=jnp.float32,
    )
    assert not bool(res.overflowed)
    # conservative: never later than the f64 oracle (the hard contract) —
    # and, where f32 suffices, not uselessly early (f32's wider error
    # bounds accept ~0.3% sooner on these scenes)
    assert float(res.toi) <= golden["toi"] * (1 + 1e-4) + 1e-7
    if scene in _TIGHT_F32:
        assert float(res.toi) == pytest.approx(
            golden["toi"], rel=2e-2, abs=1e-6
        )


def test_committed_golden_toi_compensated():
    """``precision="compensated"`` (double-word f32 — the TPU stand-in for
    the reference's default ``Scalar=double`` build) recovers the
    dense-cluster f64-oracle TOI through the FULL pipelines, where plain
    f32 collapses to 0 (the test above)."""
    from scalable_ccd_tpu import ccd
    from scalable_ccd_tpu.config import CCDConfig
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    scene = "dense-cluster"
    f0, f1, _, _ = _golden_paths(scene)
    with open(os.path.join(GOLDEN_DIR, scene, "toi.json")) as fh:
        golden = json.load(fh)
    v0, v1, edges, faces = parse_mesh(f0, f1)

    res = fused_ccd(
        v0, v1, edges, faces, max_iterations=-1,
        tolerance=golden["tolerance"], dtype=jnp.float32,
        precision="compensated",
    )
    assert not bool(res.overflowed)
    assert 0.0 < float(res.toi) <= golden["toi"] * (1 + 1e-4) + 1e-9
    assert float(res.toi) == pytest.approx(golden["toi"], rel=2e-2)

    toi_c = ccd(
        v0, v1, edges, faces, tolerance=golden["tolerance"],
        config=CCDConfig(precision="compensated"),
    )
    assert 0.0 < toi_c <= golden["toi"] * (1 + 1e-4) + 1e-9
    assert toi_c == pytest.approx(golden["toi"], rel=2e-2)


# --------------------------------------------------------------------------
# Offline self-tests of the harness itself (always run)


def test_compare_mathematica_superset_semantics(tmp_path):
    """compare_mathematica passes on supersets and fails on misses, exactly
    like the set_intersection check in ground_truth.cpp:55-63."""
    truth = [[1, 2], [3, 4]]
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(truth))
    compare_mathematica([(1, 2), (3, 4), (9, 9)], p)  # superset: ok
    with pytest.raises(AssertionError, match="missing"):
        compare_mathematica([(1, 2), (9, 9)], p)  # miss: fail


def test_ply_roundtrip_matches_fixture_loader(tmp_path):
    """read_ply/parse_mesh on a written mesh reproduces vertices, faces,
    and igl::edges-style unique edges."""
    from scalable_ccd_tpu.geometry import write_ply
    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere

    scene = cloth_on_sphere(grid_n=6, sphere_subdiv=0, drop=0.2)
    p0 = str(tmp_path / "f0.ply")
    p1 = str(tmp_path / "f1.ply")
    write_ply(p0, scene.vertices_t0, scene.faces)
    write_ply(p1, scene.vertices_t1, scene.faces)
    v0, v1, edges, faces = parse_mesh(p0, p1)
    np.testing.assert_allclose(v0, scene.vertices_t0, rtol=1e-6)
    np.testing.assert_allclose(v1, scene.vertices_t1, rtol=1e-6)
    assert np.array_equal(faces, scene.faces)
    assert np.array_equal(edges, edges_from_faces(scene.faces))


def test_harness_end_to_end_on_synthetic_dataset(tmp_path, monkeypatch):
    """Drive the full golden-data path (PLY frames + boxes/*.json + id
    offsets) on a synthetic scene whose ground truth comes from the
    brute-force oracle, proving the harness consumes a mounted dataset
    correctly without the real download."""
    from scalable_ccd_tpu.broad_phase import brute_force_overlaps
    from scalable_ccd_tpu.geometry import write_ply
    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere

    scene = cloth_on_sphere(grid_n=10, sphere_subdiv=1, drop=0.3)
    base = tmp_path / "synth-scene"
    (base / "frames").mkdir(parents=True)
    (base / "boxes").mkdir()
    write_ply(str(base / "frames" / "f0.ply"), scene.vertices_t0, scene.faces)
    write_ply(str(base / "frames" / "f1.ply"), scene.vertices_t1, scene.faces)

    # ground truth in the dataset's global-id space, from the oracle
    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float64)
    eb = build_edge_boxes(vb, scene.edges)
    fb = build_face_boxes(vb, scene.faces)
    vf_t, ee_t = _offset_for_truth(
        brute_force_overlaps(vb, fb), brute_force_overlaps(eb),
        int(vb.n), int(eb.n),
    )
    (base / "boxes" / "f0vf.json").write_text(json.dumps(vf_t.tolist()))
    (base / "boxes" / "f0ee.json").write_text(json.dumps(ee_t.tolist()))

    monkeypatch.setitem(
        SCENES, "synth-scene",
        ("frames/f0.ply", "frames/f1.ply", "boxes/f0vf.json", "boxes/f0ee.json"),
    )
    monkeypatch.setattr(
        __import__("sys").modules[__name__], "DATA_DIR", str(tmp_path)
    )
    assert _have("synth-scene")
    _check_scene_superset("synth-scene")
