"""Per-stage TPU wall-clock breakdown of the fused CCD step.

Run on the real chip (no args):  python tools/bench_stages.py [grid] [subdiv]

Timing methodology: the axon tunnel's ``block_until_ready`` does not
actually synchronize, and fetching large arrays measures tunnel bandwidth
(~30 MB/s), so every probe returns a few scalars and is synced with
``jax.device_get``.  The first call reports compile time (highly variable —
the remote compile service has been observed taking 3 s or 300 s for the
same graph; the persistent cache in ``scalable_ccd_tpu/__init__`` makes it
once-per-machine).
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import scalable_ccd_tpu  # noqa: F401 (enables the compilation cache)
from scalable_ccd_tpu.broad_phase.sweep import (
    count_major_runs,
    merge_two_lists,
    sort_boxes,
)
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.pipeline.fused import _sweep_compact, fused_ccd


def tic(name, f, *args, reps=3):
    t0 = time.perf_counter()
    jax.device_get(jax.tree_util.tree_leaves(f(*args))[0])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree_util.tree_leaves(f(*args))[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) * 1e3:.1f}ms (first call {compile_s:.0f}s)", flush=True)


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    subdiv = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print("devices:", jax.devices(), flush=True)
    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=subdiv, drop=0.25)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    E = jnp.asarray(scene.edges, jnp.int32)
    F = jnp.asarray(scene.faces, jnp.int32)
    print(f"scene: nv={v0.shape[0]} ne={E.shape[0]} nf={F.shape[0]}", flush=True)

    @jax.jit
    def prep(v0, v1, E, F):
        vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
        eb = build_edge_boxes(vb, E)
        fb = build_face_boxes(vb, F)
        vfs = sort_boxes(merge_two_lists(vb, fb))
        ees = sort_boxes(eb)
        kv = count_major_runs(vfs, jnp.int32(0), vfs.n)
        ke = count_major_runs(ees, jnp.int32(0), ees.n)
        return vfs, ees, kv, ke

    tic("boxes+sort+runs", lambda: prep(v0, v1, E, F)[2][-1:])
    vfs, ees, kv, ke = prep(v0, v1, E, F)

    @functools.partial(jax.jit, static_argnames=("is_vf",))
    def sweep_only(sb, k, is_vf):
        _, n, of = _sweep_compact(
            sb, is_vf, k, 1 << 22, 1 << 16, 32, 1 << 13, 1 << 22, None,
            slack=1 << 16,
        )
        return n, of

    tic("sweep vf", lambda: sweep_only(vfs, kv, True))
    tic("sweep ee", lambda: sweep_only(ees, ke, False))
    print(
        "survivors vf/ee:",
        int(jax.device_get(sweep_only(vfs, kv, True)[0])),
        int(jax.device_get(sweep_only(ees, ke, False)[0])),
        flush=True,
    )

    kw = dict(vf_budget=1 << 22, ee_budget=1 << 22, narrow_batch=1 << 16)
    tic("fused full", lambda: fused_ccd(v0, v1, E, F, **kw).toi)
    r = fused_ccd(v0, v1, E, F, **kw)
    print(
        f"toi={float(jax.device_get(r.toi)):.6f} "
        f"vf={int(jax.device_get(r.vf_total))} ee={int(jax.device_get(r.ee_total))} "
        f"overflow={bool(jax.device_get(r.overflowed))}",
        flush=True,
    )


if __name__ == "__main__":
    main()
