"""Mesh helpers: edge extraction semantics and PLY round trip."""

import numpy as np

from scalable_ccd_tpu.geometry.mesh import edges_from_faces, read_ply, write_ply


def test_edges_from_faces_unique_sorted():
    faces = np.array([[0, 1, 2], [2, 1, 3]], np.int32)
    e = edges_from_faces(faces)
    # shared edge (1, 2) appears once; rows sorted; lexicographic order
    want = np.array([[0, 1], [0, 2], [1, 2], [1, 3], [2, 3]], np.int32)
    np.testing.assert_array_equal(e, want)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    v = rng.random((17, 3))
    f = rng.integers(0, 17, (9, 3)).astype(np.int32)
    p = str(tmp_path / "m.ply")
    write_ply(p, v, f)
    v2, f2 = read_ply(p)
    np.testing.assert_allclose(v2, v, rtol=0, atol=0)
    np.testing.assert_array_equal(f2, f)
