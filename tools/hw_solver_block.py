"""Hardware probe: solver-kernel block size (``block_sub``) sweep.

The solver's while loop pays a fixed per-round overhead (the cond's
any-reduce, scalar bookkeeping, SMEM running-TOI traffic) amortized over
``block_sub * 128`` lanes; a larger block amortizes better but waits on
a larger worst-lane round count and may spill vregs (the carry is ~24
planes).  This measures real-query solve time at block_sub in {8, 16,
32} x round_limit in {-1, 64, 128, 256}, asserting TOI equality, at two
scales (bench-like and congested grid-1000-like query distributions).

Reference anchor: one streaming narrow-phase loop,
``src/scalable_ccd/cuda/narrow_phase/narrow_phase.cu:136-195``.

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_solver_block.py [grid=128] [reps=3]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import scalable_ccd_tpu  # noqa: F401  (persistent compile cache)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.geometry import (
    build_vertex_boxes, build_face_boxes,
)
from scalable_ccd_tpu.broad_phase import (
    sort_boxes, merge_two_lists, detect_overlaps,
)
from scalable_ccd_tpu.narrow_phase.types import gather_vf_queries
from scalable_ccd_tpu.ops.pallas_solver import pallas_find_roots


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print("devices:", jax.devices(), flush=True)

    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=3, drop=0.25)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    F = jnp.asarray(scene.faces, jnp.int32)
    vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
    fb = build_face_boxes(vb, F)
    vf = detect_overlaps(
        sort_boxes(merge_two_lists(vb, fb)), is_two_lists=True)
    q = gather_vf_queries(v0, v1, F, vf)
    valid = jnp.ones((q.n,), jnp.int32)
    print(f"grid={grid}: {q.n} VF queries", flush=True)

    base = None
    for bs in (8, 16, 32):
        for rl in (-1, 64, 128, 256):
            def run():
                return pallas_find_roots(
                    q, valid, True, 1.0, 0.0, 1e-6,
                    block_sub=bs, round_limit=rl,
                )
            t0 = time.perf_counter()
            toi, ovf, ck = run()
            toi = float(jax.device_get(toi))
            first = time.perf_counter() - t0
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                toi, ovf, ck = run()
                toi = float(jax.device_get(toi))
                ts.append(time.perf_counter() - t0)
            ms = min(ts) * 1e3
            if base is None:
                base = toi
            flag = "OK" if toi == base else f"MISMATCH base={base!r}"
            print(
                f"block_sub={bs:2d} rl={rl:4d}: {ms:8.1f} ms "
                f"toi={toi:.9f} ovf={bool(jax.device_get(ovf))} [{flag}] "
                f"(first {first:.0f}s)",
                flush=True,
            )
    print("probe complete", flush=True)


if __name__ == "__main__":
    main()
