"""Hardware probe: solver-kernel per-CHECK cost at 100% lane occupancy.

A solver block runs as long as its WORST lane, so frame-level ns/check
(grid-1000 narrow residual: ~37 ns incl decode/gather glue) conflates
per-round cost with lane occupancy.  Here every lane solves the SAME
query in ``toi_per_query`` mode (lanes prune only against their own
TOI — no cross-block pruning cascade), so all lanes run in lockstep and

    per_check_at_full_occupancy = t * lanes / total_checks

is the kernel's occupancy-1 floor.  Depth is swept via ``tolerance``
(DFS refines until widths <= tol, ~3*log2(w0/tol) splits).  If the
uniform number sits near 37 ns the round itself is the lever; if far
below, occupancy (staging/escalation) is.

Reference anchor: per-thread DFS cost,
``src/scalable_ccd/cuda/narrow_phase/root_finder.cu:280-330``.

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_solver_rounds.py [n_queries_pow2=16]
"""
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import scalable_ccd_tpu  # noqa: F401  (compile cache)
from scalable_ccd_tpu.narrow_phase.types import CCDQueries
from scalable_ccd_tpu.ops.pallas_solver import pallas_find_roots


def _uniform_queries(Q):
    """Q copies of one VF hit: vertex falls through the triangle interior
    (toi = 0.5), off-center so u/v refinement is non-trivial."""
    import numpy as np

    def tile(row):
        return jnp.asarray(np.tile(np.array([row], np.float32), (Q, 1)))

    return CCDQueries(
        p0s=tile([0.31, 0.2, 0.27]), p1s=tile([0.0, 0.0, 0.0]),
        p2s=tile([1.0, 0.0, 0.0]), p3s=tile([0.0, 0.0, 1.0]),
        p0e=tile([0.29, -0.2, 0.33]), p1e=tile([0.0, 0.0, 0.0]),
        p2e=tile([1.0, 0.0, 0.0]), p3e=tile([0.0, 0.0, 1.0]),
    )


def _time(fn, reps=5):
    r = fn()
    jax.device_get(r[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        jax.device_get(r[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts), r


def main():
    qpow = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    Q = 1 << qpow
    print("devices:", jax.devices(), flush=True)
    valid = jnp.ones((Q,), jnp.int32)
    qs = _uniform_queries(Q)

    for tol in (1e-3, 1e-4, 1e-5, 1e-6):
        for bs in (8, 16):
            def run(_tol=tol, _bs=bs):
                return pallas_find_roots(
                    qs, valid, True, jnp.float32(1.0), jnp.float32(0.0),
                    _tol, toi_per_query=True, block_sub=_bs,
                )

            ms, r = _time(run)
            checks = int(jax.device_get(r[2]))
            per_lane = checks / Q
            ns = ms * 1e6 * Q / max(checks, 1)
            print(f"tol={tol:7.0e} bs={bs:2d}: {ms:8.2f} ms  "
                  f"checks/lane={per_lane:6.1f}  "
                  f"per-check@occ1={ns:6.1f} ns  "
                  f"toi={float(jax.device_get(r[0])):.6f}", flush=True)
    print("solver-rounds probe complete", flush=True)


if __name__ == "__main__":
    main()
