from scalable_ccd_tpu.geometry.aabb import (
    AABBs,
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
    intersects,
)

__all__ = [
    "AABBs",
    "build_edge_boxes",
    "build_face_boxes",
    "build_vertex_boxes",
    "intersects",
]
