from scalable_ccd_tpu.broad_phase.brute_force import brute_force_overlaps
from scalable_ccd_tpu.broad_phase.sweep import (
    PaddedBoxes,
    SortedBoxes,
    count_major_runs,
    detect_overlaps,
    enumerate_pairs_chunk,
    merge_two_lists,
    sort_boxes,
    sweep_chunks,
)

__all__ = [
    "PaddedBoxes",
    "SortedBoxes",
    "brute_force_overlaps",
    "count_major_runs",
    "detect_overlaps",
    "enumerate_pairs_chunk",
    "merge_two_lists",
    "sort_boxes",
    "sweep_chunks",
]
