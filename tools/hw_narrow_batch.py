"""Hardware probe: ``narrow_batch`` scaling on the fused pipeline.

The fused narrow phase is a ``lax.while_loop`` over fixed-size candidate
batches; per iteration it pays record decode + endpoint gathers +
tol/err + pack-transpose + the solver dispatch.  grid-1000 runs ~920
iterations at the 16384 default (~3 ms/iter residual) — if that is
fixed-glue-dominated, widening the batch wins linearly until the solver
kernel's own work dominates.  The TOI early-exit (`toi > 0`) and
mid-loop pruning coarsen with batch size, so the bench scene is probed
too (its early batches' TOI prunes later ones — reference anchor:
``narrow_phase.cu:136`` loops chunks against a live global TOI).

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_narrow_batch.py [bench] [grid1000]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from tools.hw_round3_suite import _bench_scene, _guard, _time_fused

BATCHES = (1 << 14, 1 << 15, 1 << 16)


def step_bench():
    args = _bench_scene()
    base = None
    for nb in BATCHES:
        ms, toi, ovf, first = _time_fused(args, narrow_batch=nb)
        base = toi if base is None else base
        flag = "OK" if toi == base else f"MISMATCH {base!r}"
        print(f"narrow_batch={nb:6d}: {ms:7.1f} ms/frame toi={toi:.6f} "
              f"[{flag}] (first {first:.0f}s)", flush=True)


def step_grid(grid=1000):
    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere

    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=4, drop=0.25)
    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    print(f"grid={grid}: nv={args[0].shape[0]} ne={args[2].shape[0]} "
          f"nf={args[3].shape[0]}", flush=True)
    base = None
    for nb in BATCHES:
        ms, toi, ovf, first = _time_fused(args, reps=3, narrow_batch=nb)
        base = toi if base is None else base
        flag = "OK" if toi == base else f"MISMATCH {base!r}"
        print(f"narrow_batch={nb:6d}: {ms:7.0f} ms/frame toi={toi:.6f} "
              f"[{flag}] (first {first:.0f}s)", flush=True)


def main():
    steps = sys.argv[1:] or ["bench", "grid1000"]
    print("devices:", jax.devices(), flush=True)
    if "bench" in steps:
        _guard("1. bench narrow_batch sweep", step_bench)
    if "grid1000" in steps:
        _guard("2. grid-1000 narrow_batch sweep", lambda: step_grid(1000))
    print("\nnarrow-batch probe complete", flush=True)


if __name__ == "__main__":
    main()
