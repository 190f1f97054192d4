"""The three sweep enumerations must produce identical pair sets.

- slot decode (``decode_pair_slots``) — chunked-pipeline path
- unit decode (``decode_pair_units``) — ragged window batching
- shift-block filters (``shifted_pair_filters``) — the fused gather-free path
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.broad_phase.sweep import (
    count_major_runs,
    count_window_units,
    decode_pair_slots,
    decode_pair_units,
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


def _pairs_via_slots(sb, k, two):
    offsets = jnp.cumsum(k, dtype=jnp.int32)
    total = int(offsets[-1])
    slots = jnp.arange(max(total, 1), dtype=jnp.int32)
    f, s, keep = decode_pair_slots(sb, jnp.int32(0), offsets, slots, offsets[-1], two)
    m = np.asarray(keep)
    return set(zip(np.asarray(f)[m].tolist(), np.asarray(s)[m].tolist()))


def _pairs_via_units(sb, k, two, window):
    ku = count_window_units(k, window)
    uoff = jnp.cumsum(ku, dtype=jnp.int32)
    total = int(uoff[-1])
    units = jnp.arange(max(total, 1), dtype=jnp.int32)
    f, s, keep = decode_pair_units(sb, uoff, units, uoff[-1], k, window, two)
    m = np.asarray(keep)
    return set(zip(np.asarray(f)[m].tolist(), np.asarray(s)[m].tolist()))


def _pairs_via_shifts(sb, k, two, window, box_tile):
    boxes = pad_boxes_for_shifts(sb, shift_cap=int(k.max()) + 1,
                                 window=window, box_tile=box_tile)
    k_pad = jnp.concatenate(
        [k, jnp.zeros((boxes.element_id.shape[0] - sb.n,), k.dtype)]
    )
    out = set()
    n_tiles = -(-sb.n // box_tile)
    max_k = int(k.max())
    for shift0 in range(0, max_k + window, window):
        for t in range(n_tiles):
            f, s, keep = shifted_pair_filters(
                boxes, k_pad, jnp.int32(t * box_tile), box_tile,
                jnp.int32(shift0), window, two, box_limit=jnp.int32(sb.n),
            )
            m = np.asarray(keep)
            out.update(zip(np.asarray(f)[m].tolist(), np.asarray(s)[m].tolist()))
    return out


def test_unit_decode_matches_slot_decode(setup):
    sb, k, two = setup
    want = _pairs_via_slots(sb, k, two)
    for window in (16, 64):
        assert _pairs_via_units(sb, k, two, window) == want


def test_shift_filters_match_slot_decode(setup):
    sb, k, two = setup
    want = _pairs_via_slots(sb, k, two)
    assert _pairs_via_shifts(sb, k, two, window=32, box_tile=128) == want
