"""Geometry-layer tests: conservative box construction and id encoding.

Mirrors what the reference asserts implicitly through its box builders
(``src/scalable_ccd/broad_phase/aabb.cpp``) plus ulp-conservativeness checks
the reference lacks (SURVEY.md section 7 hard parts: conservative rounding
without directed-rounding hardware).
"""

import jax.numpy as jnp
import numpy as np

from scalable_ccd_tpu.geometry import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
    intersects,
)
from scalable_ccd_tpu.geometry.scenes import triangle_soup


def test_vertex_boxes_cover_endpoints_f32():
    rng = np.random.default_rng(0)
    v0 = rng.normal(scale=100.0, size=(1000, 3))
    v1 = v0 + rng.normal(scale=1.0, size=(1000, 3))
    boxes = build_vertex_boxes(v0, v1, inflation_radius=0.0, dtype=jnp.float32)
    lo = np.asarray(boxes.min, dtype=np.float64)
    hi = np.asarray(boxes.max, dtype=np.float64)
    # The f32 box must strictly contain the f64 endpoints despite the cast.
    assert (lo <= np.minimum(v0, v1)).all()
    assert (hi >= np.maximum(v0, v1)).all()
    # And must be tight to within ~2 ulp of the f32 values.
    width_slack = hi - np.maximum(v0, v1)
    scale = np.maximum(1.0, np.abs(hi))
    assert (width_slack <= 4 * np.finfo(np.float32).eps * scale).all()


def test_inflation_radius_applied_conservatively():
    v = np.array([[0.0, 0.0, 0.0]])
    ms = 0.125
    boxes = build_vertex_boxes(v, v, inflation_radius=ms, dtype=jnp.float64)
    assert float(boxes.min[0, 0]) <= -ms
    assert float(boxes.max[0, 0]) >= ms


def test_vertex_id_encoding():
    scene = triangle_soup(10)
    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float64)
    eb = build_edge_boxes(vb, scene.edges)
    fb = build_face_boxes(vb, scene.faces)

    vids = np.asarray(vb.vertex_ids)
    assert (vids[:, 0] == np.arange(len(vids))).all()
    assert (vids[:, 1] == -np.arange(len(vids)) - 1).all()

    eids = np.asarray(eb.vertex_ids)
    assert (eids[:, :2] == scene.edges).all()
    assert (eids[:, 2] == -scene.edges[:, 0] - 1).all()

    fids = np.asarray(fb.vertex_ids)
    assert (fids == scene.faces).all()


def test_edge_face_boxes_are_unions():
    scene = triangle_soup(50)
    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float32)
    fb = build_face_boxes(vb, scene.faces)
    vmin = np.asarray(vb.min)
    fmin = np.asarray(fb.min)
    expect = np.minimum.reduce([vmin[scene.faces[:, i]] for i in range(3)])
    assert (fmin == expect).all()


def test_intersects_is_closed_interval():
    a_min = jnp.array([0.0, 0.0, 0.0])
    a_max = jnp.array([1.0, 1.0, 1.0])
    b_min = jnp.array([1.0, 0.0, 0.0])  # touching counts (closed intervals)
    b_max = jnp.array([2.0, 1.0, 1.0])
    assert bool(intersects(a_min, a_max, b_min, b_max))
    c_min = jnp.array([1.0000001, 0.0, 0.0])
    assert not bool(intersects(a_min, a_max, c_min, b_max))
