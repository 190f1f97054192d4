"""Congested-scene hardware probe: fused pipeline, sweep impl comparison.

Runs the full fused dispatch on the grid-N cloth (default 1000 → ~3M boxes,
~15M pairs) once per requested sweep impl and reports per-frame time, TOI,
pair totals.  ONE TPU job at a time; sync via device_get of scalars.

Usage: python tools/hw_grid1000_probe.py [grid] [impl ...]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.pipeline.fused import fused_ccd


def main():
    args = sys.argv[1:]
    grid = int(args[0]) if args else 1000
    impls = args[1:] or ["pallas_ap", "pallas_sparse", "pallas_mxu"]
    print("devices:", jax.devices(), flush=True)
    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=4, drop=0.25)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    E = jnp.asarray(scene.edges, jnp.int32)
    F = jnp.asarray(scene.faces, jnp.int32)
    print(f"scene: nv={v0.shape[0]} ne={E.shape[0]} nf={F.shape[0]}",
          flush=True)

    for impl in impls:
        kw = dict(max_iterations=-1, dtype=jnp.float32, validate=False,
                  sweep_impl=impl)
        t0 = time.perf_counter()
        r = fused_ccd(v0, v1, E, F, **kw)
        toi = float(jax.device_get(r.toi))
        print(f"{impl}: first call {time.perf_counter() - t0:.0f}s "
              f"toi={toi:.6f} vf={int(jax.device_get(r.vf_total))} "
              f"ee={int(jax.device_get(r.ee_total))} "
              f"ovf={bool(jax.device_get(r.overflowed))}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fused_ccd(v0, v1, E, F, **kw)
            jax.device_get(r.toi)
            ts.append(time.perf_counter() - t0)
        print(f"{impl}: {min(ts) * 1e3:.0f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
