"""TPU-friendly data-movement primitives shared by both phases.

XLA TPU executes ``sort``, contiguous slice copies, and gathers at full
throughput, but lowers general scatters to ~tens of ns *per row* (measured
on v5e: a 1M-row scatter costs ~40 ms while a 1M-row multi-operand sort is
sub-millisecond).  Every hot path in this library therefore expresses
"append the surviving rows" as **stable sort by the inverted mask +
dynamic-update-slice of the dense prefix** instead of a scattered write —
the TPU replacement for the reference's ``atomicAdd`` append protocol
(``cuda/broad_phase/collision.cuh:45-54``).
"""

from scalable_ccd_tpu.ops.compact import compact_rows, searchsorted_sorted

__all__ = ["compact_rows", "searchsorted_sorted"]
