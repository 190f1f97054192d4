from scalable_ccd_tpu.geometry.aabb import (
    AABBs,
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
    intersects,
)
from scalable_ccd_tpu.geometry.mesh import (
    edges_from_faces,
    read_ply,
    validate_mesh_inputs,
    write_ply,
)

__all__ = [
    "AABBs",
    "build_edge_boxes",
    "build_face_boxes",
    "build_vertex_boxes",
    "edges_from_faces",
    "intersects",
    "read_ply",
    "validate_mesh_inputs",
    "write_ply",
]
