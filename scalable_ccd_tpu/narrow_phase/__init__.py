"""Narrow phase: batched tight-inclusion interval root finding.

TPU-native re-design of ``src/scalable_ccd/cuda/narrow_phase/`` — see
:mod:`scalable_ccd_tpu.narrow_phase.root_finder` for the design mapping.
"""

from scalable_ccd_tpu.narrow_phase.bfs import find_roots_bfs
from scalable_ccd_tpu.narrow_phase.root_finder import RootFinderResult, find_roots
from scalable_ccd_tpu.narrow_phase.types import (
    CCDQueries,
    compute_tolerance,
    concat_frames,
    domain_corners,
    gather_ee_queries,
    gather_vf_queries,
    numerical_error_bound,
    pack_edge_table,
    pack_face_table,
)

__all__ = [
    "CCDQueries",
    "RootFinderResult",
    "compute_tolerance",
    "concat_frames",
    "domain_corners",
    "find_roots",
    "find_roots_bfs",
    "gather_ee_queries",
    "gather_vf_queries",
    "numerical_error_bound",
    "pack_edge_table",
    "pack_face_table",
]
