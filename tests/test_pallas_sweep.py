"""Pallas sweep-filter kernel vs the XLA reference, interpret mode on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.broad_phase.sweep import (
    count_major_runs,
    merge_two_lists,
    pad_boxes_for_shifts,
    shifted_pair_filters,
    sort_boxes,
)
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.ops.pallas_sweep import (
    pack_boxes_for_pallas,
    pallas_shifted_pair_filters,
)


@pytest.fixture(scope="module", params=["vf", "ee"])
def setup(request):
    scene = cloth_on_sphere(grid_n=10, sphere_subdiv=1, drop=0.5)
    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float32)
    if request.param == "vf":
        fb = build_face_boxes(vb, scene.faces)
        sb = sort_boxes(merge_two_lists(vb, fb))
        two = True
    else:
        sb = sort_boxes(build_edge_boxes(vb, scene.edges))
        two = False
    k = count_major_runs(sb, jnp.int32(0), sb.n)
    return sb, k, two


def test_kernel_matches_xla(setup):
    sb, k, two = setup
    W, B = 8, 128
    boxes = pad_boxes_for_shifts(sb, shift_cap=int(k.max()) + W, window=W, box_tile=B)
    k_pad = jnp.concatenate(
        [k, jnp.zeros((boxes.element_id.shape[0] - sb.n,), k.dtype)]
    )
    packed_f, packed_i = pack_boxes_for_pallas(boxes, k_pad)
    max_k = int(k.max())
    for shift0 in range(0, max_k + W, W):
        for bs in range(0, sb.n, B):
            args = (boxes, k_pad, jnp.int32(bs), B, jnp.int32(shift0), W, two)
            fx, sx, kx = shifted_pair_filters(*args, box_limit=jnp.int32(sb.n))
            fp, sp, kp = pallas_shifted_pair_filters(
                packed_f, packed_i,
                jnp.int32(bs), jnp.int32(shift0), jnp.int32(sb.n),
                box_tile=B, window=W, is_two_lists=two, interpret=True,
            )
            np.testing.assert_array_equal(np.asarray(kp), np.asarray(kx))
            mk = np.asarray(kx)
            np.testing.assert_array_equal(np.asarray(fp)[mk], np.asarray(fx)[mk])
            np.testing.assert_array_equal(np.asarray(sp)[mk], np.asarray(sx)[mk])
