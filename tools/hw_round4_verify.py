"""Round-4 fix verification: one TPU process, ordered cheapest-first.

Verifies the two hardware-found round-4 fixes, then re-cuts the
congested frame:

1. Layout parity (raw/dense/sparse/mxu) — the mxu one-hot placement
   matmul now runs at ``precision=HIGHEST`` (the MXU's default f32
   precision truncates operands to bf16, corrupting halfwords >= 2^8;
   interpret mode stayed exact, hence the round-4 suite mismatch).
2. Canonical bench per sweep impl — re-times mxu with correct output.
3. Congested grid-600 — the first scale where the extent-class
   permutation activates; the i32-domain gather fix (f32 bitcast of
   small ids was flushed as denormals on TPU) must restore toi > 0 and
   ordering-invariant pair totals.
4. Congested grid-1000 per impl — BASELINE.md's 8.53 s row, re-cut.

ONE TPU job at a time (CLAUDE.md); start with nohup, never ``timeout``.
Sync discipline: device_get of scalars only.

Usage: python tools/hw_round4_verify.py [steps...]  (default: all)
"""
import sys
import time
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from tools.hw_round3_suite import (
    _guard, step_bench_impls, step_grid, step_sparse_check,
)


def main():
    steps = sys.argv[1:] or ["mxu", "impls", "grid600", "grid1000"]
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    if "mxu" in steps:
        _guard("1. layout parity (mxu precision fix)", step_sparse_check)
    if "impls" in steps:
        _guard("2. canonical bench per sweep impl", step_bench_impls)
    if "grid600" in steps:
        _guard("3. congested grid-600 (bitcast fix)", lambda: step_grid(600))
    if "grid1000" in steps:
        _guard("4. congested grid-1000 per impl", lambda: step_grid(1000))
    print(f"\nverify complete in {time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
