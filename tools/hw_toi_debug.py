"""Isolate the grid-scale toi=0 regression seen in the round-4 hw suite.

For each requested grid size, runs the fused pipeline in several
configurations and prints TOI at full precision plus the quality flags,
to separate sweep bugs (wrong pair set -> wrong totals) from solver bugs
(kernel vs XLA BFS disagree) from round-cap collapse (solver_capped).

ONE TPU job at a time; sync via device_get of scalars (CLAUDE.md).

Usage: python tools/hw_toi_debug.py [grid ...]   (default: 256 384 600)
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.pipeline.fused import fused_ccd


def run(tag, args, **kw):
    t0 = time.perf_counter()
    r = fused_ccd(*args, max_iterations=-1, dtype=jnp.float32,
                  validate=False, **kw)
    toi = float(jax.device_get(r.toi))
    print(
        f"  {tag}: toi={toi:.9e} vf={int(jax.device_get(r.vf_total))} "
        f"ee={int(jax.device_get(r.ee_total))} "
        f"ovf={bool(jax.device_get(r.overflowed))} "
        f"capped={bool(jax.device_get(r.solver_capped))} "
        f"checks={int(jax.device_get(r.total_checks))} "
        f"({time.perf_counter() - t0:.0f}s)",
        flush=True,
    )
    return r


def main():
    grids = [int(g) for g in sys.argv[1:]] or [256, 384, 600]
    print("devices:", jax.devices(), flush=True)
    for grid in grids:
        scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=4, drop=0.25)
        args = (
            jnp.asarray(scene.vertices_t0, jnp.float32),
            jnp.asarray(scene.vertices_t1, jnp.float32),
            jnp.asarray(scene.edges, jnp.int32),
            jnp.asarray(scene.faces, jnp.int32),
        )
        print(f"grid={grid}: nv={args[0].shape[0]} ne={args[2].shape[0]} "
              f"nf={args[3].shape[0]}", flush=True)
        run("default            ", args)
        run("bucket_minor=False ", args, bucket_minor=False)
        run("solver=bfs         ", args, solver="bfs")


if __name__ == "__main__":
    main()
