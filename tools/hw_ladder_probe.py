"""Hardware probe: multi-stage escalation ladder vs two-stage vs off.

A solver block runs as long as its WORST lane; the ladder
(``escalate_rounds`` as an ascending tuple) lets easy blocks retire at a
short first pass and pools stragglers stage by stage (PERF.md remaining-
candidate 2).  This probe times the FULL fused frame on the congested
grid cloth for each policy, so pass-bookkeeping overhead and the
occupancy win are both in the number.  TOI/pair totals are printed for
the exactness cross-check (bitwise-identical absent overflow accepts).

Reference anchor: the reference re-runs rather than degrades
(``src/scalable_ccd/cuda/narrow_phase/narrow_phase.cu:146-195``).

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_ladder_probe.py [grid=1000]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.pipeline.fused import fused_ccd

POLICIES = [
    ("off", dict(escalate_rounds=-1)),
    ("two-stage rl=128 (default)", dict(escalate_rounds=128)),
    ("ladder (32,128)", dict(escalate_rounds=(32, 128))),
    ("frame pool rl=128", dict(escalate_rounds=128,
                               escalate_pool="frame")),
    ("frame pool rl=64", dict(escalate_rounds=64,
                              escalate_pool="frame")),
    ("frame pool rl=32", dict(escalate_rounds=32,
                              escalate_pool="frame")),
    ("frame pool rl=64 nb=64k", dict(escalate_rounds=64,
                                     escalate_pool="frame",
                                     narrow_batch=1 << 16)),
]


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    print("devices:", jax.devices(), flush=True)
    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=4, drop=0.25)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    E = jnp.asarray(scene.edges, jnp.int32)
    F = jnp.asarray(scene.faces, jnp.int32)
    print(f"scene: nv={v0.shape[0]} ne={E.shape[0]} nf={F.shape[0]}",
          flush=True)

    for name, esc in POLICIES:
        kw = dict(max_iterations=-1, dtype=jnp.float32, validate=False,
                  **esc)
        t0 = time.perf_counter()
        r = fused_ccd(v0, v1, E, F, **kw)
        toi = float(jax.device_get(r.toi))
        print(f"{name}: first call {time.perf_counter() - t0:.0f}s "
              f"toi={toi:.6f} vf={int(jax.device_get(r.vf_total))} "
              f"ee={int(jax.device_get(r.ee_total))} "
              f"capped={bool(jax.device_get(r.solver_capped))}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fused_ccd(v0, v1, E, F, **kw)
            jax.device_get(r.toi)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts) * 1e3:.0f} ms/frame", flush=True)
    print("ladder probe complete", flush=True)


if __name__ == "__main__":
    main()
