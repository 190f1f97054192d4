"""axis="auto" sweep: identical pair set, major axis = max variance."""

import numpy as np

import jax.numpy as jnp

from scalable_ccd_tpu.broad_phase import detect_overlaps
from scalable_ccd_tpu.broad_phase.sweep import sort_boxes
from scalable_ccd_tpu.geometry.aabb import build_vertex_boxes
from scalable_ccd_tpu.geometry.scenes import triangle_soup


def _stretched_boxes(axis):
    soup = triangle_soup(n_triangles=120, motion=0.05, seed=8)
    v0 = np.asarray(soup.vertices_t0).copy()
    v1 = np.asarray(soup.vertices_t1).copy()
    v0[:, axis] *= 50.0
    v1[:, axis] *= 50.0
    return build_vertex_boxes(jnp.asarray(v0), jnp.asarray(v1), dtype=jnp.float32)


def test_auto_matches_every_fixed_axis():
    boxes = _stretched_boxes(axis=1)
    want = set(map(tuple, detect_overlaps(sort_boxes(boxes, axis=0), False).tolist()))
    for ax in (1, 2, "auto"):
        got = set(map(tuple, detect_overlaps(sort_boxes(boxes, axis=ax), False).tolist()))
        assert got == want, ax


def test_auto_picks_max_variance_axis():
    for stretch in (0, 1, 2):
        boxes = _stretched_boxes(axis=stretch)
        sb = sort_boxes(boxes, axis="auto")
        fixed = sort_boxes(boxes, axis=stretch)
        np.testing.assert_array_equal(
            np.asarray(sb.major_min), np.asarray(fixed.major_min)
        )
