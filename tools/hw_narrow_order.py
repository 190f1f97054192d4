"""Hardware probe: depth-key candidate ordering at frame level.

hw_depth_order times the raw solve loop over pre-sorted streams; this
probe prices the PIPELINE knob (``narrow_order='key'``: budget-sized
decode + key gather + multi-operand sort + the reordered narrow loop)
against sweep order on FULL fused frames, so the up-front sort cost and
the occupancy win are both in the number.  TOI/pair totals printed for
the exactness cross-check.

Run at the congested scale it targets (grid-1000) and at bench scale
(grid-128, where auto keeps it off — the row documents why).

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_narrow_order.py [grid=1000]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.pipeline.fused import fused_ccd

POLICIES = [
    ("sweep order (default)", dict(narrow_order="sweep")),
    ("stream (pre-decode)", dict(narrow_order="stream")),
    ("stream, esc off", dict(narrow_order="stream", escalate_rounds=-1)),
    ("key order", dict(narrow_order="key")),
    ("key order, esc off", dict(narrow_order="key", escalate_rounds=-1)),
    ("sweep order, esc off", dict(narrow_order="sweep",
                                  escalate_rounds=-1)),
    # dispatch-glue lever: the residual probe saw EE 2960 -> 2206 ms
    # going 16k -> 64k batches (~1.4 ms/dispatch fixed cost), while the
    # full pipeline regressed at 64k WITHOUT ordering (hw_narrow_batch)
    # — re-test with depth-grouped blocks where escalation stages stay
    # small
    ("key order, nb=64k", dict(narrow_order="key", narrow_batch=1 << 16)),
    ("key order, nb=64k, esc off", dict(narrow_order="key",
                                        narrow_batch=1 << 16,
                                        escalate_rounds=-1)),
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

    for name, pol in POLICIES:
        kw = dict(max_iterations=-1, dtype=jnp.float32, validate=False,
                  **pol)
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
    print("narrow-order probe complete", flush=True)


if __name__ == "__main__":
    main()
