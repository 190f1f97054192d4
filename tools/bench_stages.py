"""Per-stage TPU wall-clock breakdown of the fused CCD step.

Run on the real chip (no args):  python tools/bench_stages.py [grid] [subdiv]

Timing methodology: the axon tunnel's ``block_until_ready`` does not
actually synchronize, and fetching large arrays measures tunnel bandwidth
(~30 MB/s), so every probe returns a few scalars and is synced with
``jax.device_get``.  The first call reports compile time (highly variable —
the remote compile service has been observed taking 3 s or 300 s for the
same graph; the persistent cache in ``scalable_ccd_tpu/__init__`` makes it
once-per-machine).

Stages measured: box build + sort, the all-pairs sweep kernel per phase
(``ops/pallas_sweep_ap.py``), the narrow-phase solver kernel on the VF
candidates (``ops/pallas_solver.py``), and the full fused step.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import scalable_ccd_tpu  # noqa: F401 (enables the compilation cache)
from scalable_ccd_tpu.broad_phase.sweep import merge_two_lists, sort_boxes
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.narrow_phase import gather_vf_queries
from scalable_ccd_tpu.ops.pallas_solver import pallas_find_roots
from scalable_ccd_tpu.ops.pallas_sweep_ap import (
    decode_pairs_ap,
    pack_boxes_ap,
    pallas_sweep_pairs,
)
from scalable_ccd_tpu.pipeline.fused import fused_ccd


def tic(name, f, reps=3):
    t0 = time.perf_counter()
    jax.device_get(jax.tree_util.tree_leaves(f())[0])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree_util.tree_leaves(f())[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) * 1e3:.1f}ms (first call {compile_s:.0f}s)", flush=True)


def sharded_probe(grid, subdiv, budget, narrow_batch):
    """Mesh-of-1 run through the shard_map kernel code path on the chip."""
    import numpy as np
    from jax.sharding import Mesh

    from scalable_ccd_tpu.parallel.sharded import AXIS, make_sharded_ccd

    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=subdiv, drop=0.25)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    E = jnp.asarray(scene.edges, jnp.int32)
    F = jnp.asarray(scene.faces, jnp.int32)
    mesh = Mesh(np.asarray(jax.devices()[:1]), (AXIS,))
    fn = make_sharded_ccd(
        mesh, vf_budget_per_shard=budget, ee_budget_per_shard=budget,
        narrow_batch=narrow_batch,
    )
    ms0 = jnp.float32(0.0)
    tol = jnp.float32(1e-6)
    tic("sharded mesh-of-1 full", lambda: fn(v0, v1, E, F, ms0, tol).toi)
    r = fn(v0, v1, E, F, ms0, tol)
    print(
        f"sharded toi={float(jax.device_get(r.toi)):.6f} "
        f"vf={int(jax.device_get(r.vf_total))} "
        f"ee={int(jax.device_get(r.ee_total))}",
        flush=True,
    )


def main():
    # flags may appear anywhere; numeric positionals are parsed in order
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    grid = int(nums[0]) if len(nums) > 0 else 128
    subdiv = int(nums[1]) if len(nums) > 1 else 4
    narrow_batch = int(nums[2]) if len(nums) > 2 else 1 << 14
    budget = 1 << 22
    if "--sharded" in sys.argv:
        sharded_probe(grid, subdiv, budget, narrow_batch)
        return
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
        return sort_boxes(merge_two_lists(vb, fb)), sort_boxes(eb)

    tic("boxes+sort", lambda: prep(v0, v1, E, F)[0].major_min[-1:])
    vfs, ees = prep(v0, v1, E, F)

    @functools.partial(jax.jit, static_argnames=("istwo",))
    def sweep(packed, n, istwo):
        # raw mode: time the kernel alone (decode rides the narrow batches
        # in the pipeline; it is timed separately below)
        return pallas_sweep_pairs(packed, n, istwo, budget=budget, raw=True)

    packed_vf, n_vf = pack_boxes_ap(vfs)
    packed_ee, n_ee = pack_boxes_ap(ees)
    tic("sweep kernel vf", lambda: sweep(packed_vf, n_vf, True)[1])
    tic("sweep kernel ee", lambda: sweep(packed_ee, n_ee, False)[1])

    pairs, n_pairs, _, _ = sweep(packed_vf, n_vf, True)
    npp = int(jax.device_get(n_pairs))
    Q = 1 << max((npp - 1).bit_length(), 10)

    @jax.jit
    def decode(pairs):
        return decode_pairs_ap(packed_vf, pairs[:Q], True)

    tic(f"decode vf ({npp} pairs)", lambda: decode(pairs)[:1, 0])
    chunk = decode(pairs)
    valid = jnp.arange(Q) < npp
    q = gather_vf_queries(v0, v1, F, chunk, dtype=jnp.float32)
    # one pallas_find_roots call per <= 2^21 queries: a single call's
    # per-block SMEM output window scales with the grid, and ~4096
    # blocks (8.4M queries) exceeds the 1 MB SMEM (the pipelines batch
    # at narrow_batch anyway; this standalone stage must chunk too)
    SB = 1 << 20  # with block_sub=16: 512 blocks: the per-block SMEM output windows pad to
    # (blocks, 128) lanes, and 2048 blocks alone fill the 1 MB SMEM

    def solve_chunks():
        toi = jnp.float32(1.0)
        for s in range(0, Q, SB):
            qs = jax.tree_util.tree_map(lambda a: a[s:s + SB], q)
            toi = pallas_find_roots(
                qs, valid[s:s + SB], True, toi, jnp.float32(0.0),
                jnp.float32(1e-6), block_sub=16,
            )[0]
        return toi

    tic(f"solver kernel vf ({npp} queries)", solve_chunks)

    kw = dict(
        vf_budget=budget, ee_budget=budget, validate=False,
        narrow_batch=narrow_batch,
    )
    tic("fused full", lambda: fused_ccd(v0, v1, E, F, **kw).toi)
    r = fused_ccd(v0, v1, E, F, **kw)
    print(
        f"toi={float(jax.device_get(r.toi)):.6f} "
        f"vf={int(jax.device_get(r.vf_total))} ee={int(jax.device_get(r.ee_total))} "
        f"checks={int(jax.device_get(r.total_checks))} "
        f"overflow={bool(jax.device_get(r.overflowed))}",
        flush=True,
    )


if __name__ == "__main__":
    main()
