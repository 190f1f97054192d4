"""Round-3 hardware measurement suite: everything pending, one TPU process.

Runs, in order, isolating failures so one crash doesn't lose the rest:

1. ``hw_sparse_check`` — parity + timing of the four sweep emission
   layouts (raw pops / dense / sparse / mxu bit-records) at bench scale.
2. Canonical bench (``bench.py`` scene) through the library default path.
3. Canonical bench per explicit sweep impl (raw vs record layouts end to
   end, narrow decode included — the sweep-only numbers in (1) exclude
   the per-batch record decode).
4. Congested grid-N scene per sweep impl (default 600 here; pass a grid
   to override — 1000 matches BASELINE.md's 8.53 s row).
5. Mesh-of-1 shard_map kernel path (the +9.2% row in PERF.md).

ONE TPU job at a time (CLAUDE.md); never run this under ``timeout`` — a
killed TPU client can wedge the worker for hours.  Start it with nohup,
watch the log.  Sync discipline: device_get of scalars only.

Usage: python tools/hw_round3_suite.py [grid_for_step_4]
"""
import statistics
import sys
import time
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def _section(name):
    print(f"\n===== {name} =====", flush=True)


def _guard(name, fn):
    _section(name)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"[{name}] done in {time.perf_counter() - t0:.0f}s",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"[{name}] FAILED after {time.perf_counter() - t0:.0f}s",
              flush=True)


def _bench_scene():
    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere

    scene = cloth_on_sphere(grid_n=128, sphere_subdiv=4, drop=0.25)
    return (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )


def _time_fused(args, reps=5, **kw):
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    def run():
        r = fused_ccd(*args, validate=False, **kw)
        jax.device_get(r.toi)
        return r

    t0 = time.perf_counter()
    r = run()  # compile + auto-budget retry
    first = time.perf_counter() - t0
    toi = float(jax.device_get(r.toi))
    ovf = bool(jax.device_get(r.overflowed))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts), toi, ovf, first


def step_solver_check():
    """Parity + timing of the value-free-stack solver kernel vs the XLA
    bfs solver on real bench-scale queries (interpret-green is NOT
    hardware-green — the nibble-plane shifts and dyadic unwind are new)."""
    import functools

    from scalable_ccd_tpu.geometry.aabb import (
        build_edge_boxes, build_face_boxes, build_vertex_boxes,
    )
    from scalable_ccd_tpu.broad_phase.sweep import merge_two_lists, sort_boxes
    from scalable_ccd_tpu.narrow_phase import find_roots_bfs, gather_vf_queries
    from scalable_ccd_tpu.ops.pallas_solver import pallas_find_roots
    from scalable_ccd_tpu.ops.pallas_sweep_ap import (
        decode_pairs_ap, pack_boxes_ap, pallas_sweep_pairs,
    )

    v0, v1, E, F = _bench_scene()

    @jax.jit
    def prep(v0, v1, E, F):
        vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
        fb = build_face_boxes(vb, F)
        return sort_boxes(merge_two_lists(vb, fb))

    vfs = prep(v0, v1, E, F)
    packed_vf, n_vf = pack_boxes_ap(vfs)
    pairs, n_pairs, _, _ = pallas_sweep_pairs(
        packed_vf, n_vf, True, budget=1 << 18, raw=True)
    npp = int(jax.device_get(n_pairs))
    Q = 1 << max((npp - 1).bit_length(), 10)
    chunk = decode_pairs_ap(packed_vf, pairs[:Q], True)
    valid = jnp.arange(Q) < npp
    q = gather_vf_queries(v0, v1, F, chunk, dtype=jnp.float32)

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        toi = float(jax.device_get(out))
        first = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(fn())
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{name}: {statistics.median(ts):.1f} ms toi={toi:.6f} "
              f"(first {first:.0f}s)", flush=True)
        return toi

    t_pal = timed(
        f"solver kernel vf ({npp} queries)",
        lambda: pallas_find_roots(
            q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
            jnp.float32(1e-6))[0],
    )
    t_bfs = timed(
        "bfs xla solver vf",
        lambda: find_roots_bfs(
            q, valid, True, toi_init=jnp.float32(1.0), ms=jnp.float32(0.0),
            tolerance=jnp.float32(1e-6), max_iterations=-1).toi,
    )
    assert abs(t_pal - t_bfs) <= 1e-6, (t_pal, t_bfs)
    print("solver parity OK", flush=True)


def step_sparse_check():
    from tools.hw_sparse_check import main as sparse_main

    sparse_main()


def step_bench_default():
    args = _bench_scene()
    ms, toi, ovf, first = _time_fused(args, max_iterations=-1,
                                      dtype=jnp.float32)
    print(f"default path: {ms:.1f} ms/frame toi={toi:.6f} ovf={ovf} "
          f"(first {first:.0f}s)", flush=True)


def step_bench_impls():
    args = _bench_scene()
    for impl in ("pallas_ap", "pallas_rec", "pallas_sparse", "pallas_mxu"):
        ms, toi, ovf, first = _time_fused(
            args, max_iterations=-1, dtype=jnp.float32, sweep_impl=impl)
        print(f"{impl}: {ms:.1f} ms/frame toi={toi:.6f} ovf={ovf} "
              f"(first {first:.0f}s)", flush=True)


def step_grid(grid):
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
    for impl in ("pallas_ap", "pallas_sparse", "pallas_mxu"):
        ms, toi, ovf, first = _time_fused(
            args, reps=3, max_iterations=-1, dtype=jnp.float32,
            sweep_impl=impl)
        print(f"{impl}: {ms:.0f} ms/frame toi={toi:.6f} ovf={ovf} "
              f"(first {first:.0f}s)", flush=True)


def step_sharded():
    import numpy as np
    from jax.sharding import Mesh

    from scalable_ccd_tpu.parallel.sharded import AXIS, make_sharded_ccd

    mesh = Mesh(np.asarray(jax.devices()[:1]), (AXIS,))
    fn = make_sharded_ccd(
        mesh,
        vf_budget_per_shard=1 << 18,
        ee_budget_per_shard=1 << 18,
        max_iterations=-1,
        dtype=jnp.float32,
        sweep_impl="pallas_ap",
        solver="pallas",
    )
    v0, v1, e, f = _bench_scene()
    ms0, ms1 = jnp.float32(0.0), jnp.float32(1e-6)

    def run():
        r = fn(v0, v1, e, f, ms0, ms1)
        jax.device_get(r.toi)
        return r

    t0 = time.perf_counter()
    r = run()
    first = time.perf_counter() - t0
    toi = float(jax.device_get(r.toi))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"sharded mesh-of-1 kernels: {statistics.median(ts):.1f} ms/frame "
          f"toi={toi:.6f} (first {first:.0f}s)", flush=True)


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    print("devices:", jax.devices(), flush=True)
    _guard("0. solver kernel parity + timing", step_solver_check)
    _guard("1. layout parity + sweep timing", step_sparse_check)
    _guard("2. canonical bench, default path", step_bench_default)
    _guard("3. canonical bench per sweep impl", step_bench_impls)
    _guard(f"4. congested grid-{grid} per sweep impl",
           lambda: step_grid(grid))
    _guard("5. sharded mesh-of-1 kernel path", step_sharded)
    print("\nsuite complete", flush=True)


if __name__ == "__main__":
    main()
