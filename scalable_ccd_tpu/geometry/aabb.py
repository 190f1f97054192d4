"""Conservative axis-aligned bounding boxes, structure-of-arrays.

TPU-native counterpart of the reference's host AABB + box builders
(``src/scalable_ccd/broad_phase/aabb.hpp:13-111``, ``aabb.cpp:38-133``) and
its GPU twin (``cuda/broad_phase/aabb.cuh:81-150``).  The reference stores an
array-of-structs and splits it into (major-interval, minibox) pairs with a
CUDA kernel; in JAX the natural layout *is* structure-of-arrays, so the
``split_boxes`` kernel disappears entirely.

Conservativeness contract (reference ``AABB::conservative_inflation``,
``aabb.cpp:31-36``): every box is widened by one ulp in each direction via
``nextafter`` plus an up-rounded inflation radius, so that rounding in the
box build can never cause a missed overlap.  When the working dtype is
float32 but inputs are float64, the cast rounds to nearest (error <= 0.5 ulp)
and the subsequent one-ulp ``nextafter`` widening covers it.

Vertex-id encoding (reference ``aabb.cpp:57,107-108,128-129``):
vertex i  -> (i, -i-1, -i-1);  edge (a,b) -> (a, b, -a-1);
face (a,b,c) -> (a, b, c).  With this encoding "do two simplices share a
vertex" is nine integer equality tests, because negative slots can never
match a real (non-negative) vertex id of the other simplex type.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "AABBs",
    "build_vertex_boxes",
    "build_edge_boxes",
    "build_face_boxes",
    "intersects",
]


class AABBs(NamedTuple):
    """A batch of n boxes (all fields length-n arrays)."""

    #: (n, 3) lower corners (conservatively rounded down).
    min: jax.Array
    #: (n, 3) upper corners (conservatively rounded up).
    max: jax.Array
    #: (n, 3) int32 vertex ids in the encoding described above.
    vertex_ids: jax.Array
    #: (n,) int32 id of the vertex/edge/face this box bounds.
    element_id: jax.Array

    @property
    def n(self) -> int:
        return self.min.shape[0]


def _conservative_bounds(lo, hi, inflation_radius, dtype):
    """Widen [lo, hi] outward by one ulp and an up-rounded inflation radius."""
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)
    inf_r = jnp.nextafter(jnp.asarray(inflation_radius, dtype), jnp.asarray(jnp.inf, dtype))
    lo = jnp.nextafter(lo, jnp.asarray(-jnp.inf, dtype)) - inf_r
    hi = jnp.nextafter(hi, jnp.asarray(jnp.inf, dtype)) + inf_r
    return lo, hi


def build_vertex_boxes(
    vertices_t0: jax.Array,
    vertices_t1: Optional[jax.Array] = None,
    inflation_radius: float = 0.0,
    dtype=jnp.float32,
) -> AABBs:
    """Boxes around (possibly linearly moving) vertices.

    Reference: ``build_vertex_boxes`` (``aabb.cpp:38-92``), both the static
    and the t0->t1 overload.  The min/max over the two endpoint positions is
    taken in the input precision, then cast + ulp-widened.
    """
    v0 = jnp.asarray(vertices_t0)
    if vertices_t1 is None:
        lo = hi = v0
    else:
        v1 = jnp.asarray(vertices_t1)
        lo = jnp.minimum(v0, v1)
        hi = jnp.maximum(v0, v1)
    lo, hi = _conservative_bounds(lo, hi, inflation_radius, dtype)

    n = lo.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    vertex_ids = jnp.stack([ids, -ids - 1, -ids - 1], axis=1)
    return AABBs(min=lo, max=hi, vertex_ids=vertex_ids, element_id=ids)


def build_edge_boxes(vertex_boxes: AABBs, edges: jax.Array) -> AABBs:
    """Boxes around moving edges = union of the two (inflated) vertex boxes.

    Reference: ``build_edge_boxes`` (``aabb.cpp:94-112``).  Unioning already
    conservative boxes is exact (pure min/max), so no further widening.
    """
    e = jnp.asarray(edges, jnp.int32)
    lo = jnp.minimum(vertex_boxes.min[e[:, 0]], vertex_boxes.min[e[:, 1]])
    hi = jnp.maximum(vertex_boxes.max[e[:, 0]], vertex_boxes.max[e[:, 1]])
    vertex_ids = jnp.stack([e[:, 0], e[:, 1], -e[:, 0] - 1], axis=1)
    element_id = jnp.arange(e.shape[0], dtype=jnp.int32)
    return AABBs(min=lo, max=hi, vertex_ids=vertex_ids, element_id=element_id)


def build_face_boxes(vertex_boxes: AABBs, faces: jax.Array) -> AABBs:
    """Boxes around moving triangles = union of the three vertex boxes.

    Reference: ``build_face_boxes`` (``aabb.cpp:114-133``).
    """
    f = jnp.asarray(faces, jnp.int32)
    lo = jnp.minimum(
        jnp.minimum(vertex_boxes.min[f[:, 0]], vertex_boxes.min[f[:, 1]]),
        vertex_boxes.min[f[:, 2]],
    )
    hi = jnp.maximum(
        jnp.maximum(vertex_boxes.max[f[:, 0]], vertex_boxes.max[f[:, 1]]),
        vertex_boxes.max[f[:, 2]],
    )
    vertex_ids = f
    element_id = jnp.arange(f.shape[0], dtype=jnp.int32)
    return AABBs(min=lo, max=hi, vertex_ids=vertex_ids, element_id=element_id)


def intersects(a_min, a_max, b_min, b_max) -> jax.Array:
    """Closed-interval AABB overlap test (reference ``AABB::intersects``,
    ``aabb.cpp:24-29``): true iff min_a <= max_b and min_b <= max_a on all axes.
    Broadcasts over leading dimensions; reduces over the trailing (axis) dim.
    """
    return jnp.all((a_min <= b_max) & (b_min <= a_max), axis=-1)
