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


def test_validate_rejects_nan_vertices():
    """NaN input must raise, not silently return toi=1.0 (the reference's
    error surface is gpuErrchk, assert.cuh:5-28)."""
    import numpy as np
    import pytest

    from scalable_ccd_tpu import ccd, fused_ccd
    from scalable_ccd_tpu.geometry.scenes import triangle_soup

    scene = triangle_soup(10, motion=0.1, seed=0)
    v0 = np.array(scene.vertices_t0)
    v0[3, 1] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        ccd(v0, scene.vertices_t1, scene.edges, scene.faces)
    with pytest.raises(ValueError, match="non-finite"):
        fused_ccd(v0, scene.vertices_t1, scene.edges, scene.faces)


def test_validate_rejects_bad_connectivity():
    import numpy as np
    import pytest

    from scalable_ccd_tpu.geometry.mesh import validate_mesh_inputs
    from scalable_ccd_tpu.geometry.scenes import triangle_soup

    scene = triangle_soup(10, motion=0.1, seed=0)
    v0, v1 = scene.vertices_t0, scene.vertices_t1
    bad_f = np.array(scene.faces)
    bad_f[0, 0] = v0.shape[0] + 5
    with pytest.raises(ValueError, match="faces index out of range"):
        validate_mesh_inputs(v0, v1, scene.edges, bad_f)
    with pytest.raises(ValueError, match="must be .m, 2."):
        validate_mesh_inputs(v0, v1, scene.edges[:, :1], scene.faces)
    with pytest.raises(ValueError, match="integer"):
        validate_mesh_inputs(v0, v1, scene.edges.astype(np.float32), scene.faces)
    with pytest.raises(ValueError, match="frames must match"):
        validate_mesh_inputs(v0[:-1], v1, scene.edges, scene.faces)
    # device-resident path: one scalar fetch, same rejection
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="out of range"):
        validate_mesh_inputs(
            jnp.asarray(v0), jnp.asarray(v1),
            jnp.asarray(scene.edges), jnp.asarray(bad_f),
        )
    validate_mesh_inputs(
        jnp.asarray(v0), jnp.asarray(v1),
        jnp.asarray(scene.edges), jnp.asarray(scene.faces),
    )
