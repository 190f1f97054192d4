"""Round-4 performance measurements on the new default path.

1. Canonical bench through the library defaults (now: mxu record
   emission + auto budgets + staged escalation at 256) — the number the
   driver's ``bench.py`` will capture.
2. Congested grid-1000 through the defaults.
3. Narrow-batch glue ablation (VERDICT r3 item 5): for one real 16384
   narrow batch, time (a) the record-decode + query-gather + tol/err
   packing glue alone, (b) the solver kernel alone on pre-packed rows,
   (c) glue + solve together — the glue share decides whether folding
   the decode into the solver kernel's grid is worth it
   (reference anchor: one streaming loop, ``narrow_phase.cu:136-195``).
4. Tiled-record-layout compile check at a forced 2^25 pair budget on
   grid-1000 sparse — the config that OOMed at 17 GB with the (R, 8)
   layout.

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_round4_perf.py [steps...]  (default: all)
"""
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from tools.hw_round3_suite import (
    _bench_scene, _guard, _time_fused,
)


def step_bench_default():
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    args = _bench_scene()
    ms, toi, ovf, first = _time_fused(args)  # library defaults
    print(f"default path (mxu+auto+escalation): {ms:.1f} ms/frame "
          f"toi={toi:.6f} ovf={ovf} (first {first:.0f}s)", flush=True)
    # escalation ablation on the same defaults
    ms2, toi2, _, _ = _time_fused(args, escalate_rounds=-1)
    print(f"  escalate_rounds=-1: {ms2:.1f} ms/frame toi={toi2:.6f}",
          flush=True)
    assert toi2 == toi


def step_grid_default(grid=1000):
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
    ms, toi, ovf, first = _time_fused(args, reps=3)
    print(f"default path: {ms:.0f} ms/frame toi={toi:.6f} ovf={ovf} "
          f"(first {first:.0f}s)", flush=True)


def step_glue_ablation():
    import functools

    from scalable_ccd_tpu.broad_phase.sweep import (
        merge_two_lists, sort_boxes,
    )
    from scalable_ccd_tpu.geometry.aabb import (
        build_face_boxes, build_vertex_boxes,
    )
    from scalable_ccd_tpu.narrow_phase import gather_vf_queries
    from scalable_ccd_tpu.narrow_phase.types import (
        compute_tolerance, concat_frames, numerical_error_bound,
        pack_face_table,
    )
    from scalable_ccd_tpu.ops.pallas_solver import (
        _find_roots_packed, pallas_find_roots,
    )
    from scalable_ccd_tpu.ops.pallas_sweep_ap import (
        decode_records_range, pack_boxes_ap, pallas_sweep_records,
        records_pair_prefix,
    )

    v0, v1, E, F = _bench_scene()
    B = 1 << 14

    @jax.jit
    def prep(v0, v1, E, F):
        vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
        fb = build_face_boxes(vb, F)
        return sort_boxes(merge_two_lists(vb, fb))

    vfs = prep(v0, v1, E, F)
    packed, n = pack_boxes_ap(vfs)
    recs, n_r, n_p, ovf = pallas_sweep_records(
        packed, n, True, pair_budget=1 << 18, layout="mxu")
    cum = records_pair_prefix(recs, n_r)
    npp = int(jax.device_get(n_p))
    print(f"{npp} VF pairs; batch {B}", flush=True)

    vcat = concat_frames(v0, v1, jnp.float32)
    ftab = pack_face_table(vcat, F)

    @jax.jit
    def glue(start, r_lo):
        """decode + gather + tol/err + row-pack: everything run_solver
        does before the pallas_call, with the same inputs."""
        chunk, r_lo = decode_records_range(
            packed, recs, cum, start, B, n_p, r_lo, True)
        q = gather_vf_queries(v0, v1, F, chunk, dtype=jnp.float32,
                              vcat=vcat, ftab=ftab)
        ms_arr = jnp.zeros((B,), jnp.float32)
        err = numerical_error_bound(q, True, False)
        tol = compute_tolerance(q, True, jnp.float32(1e-6))
        qrows = jnp.concatenate(
            [q.p0s, q.p1s, q.p2s, q.p3s, q.p0e, q.p1e, q.p2e, q.p3e,
             tol, err, ms_arr[:, None]], axis=1)
        # consume every element so XLA cannot DCE the packing
        return jnp.sum(qrows), r_lo

    @jax.jit
    def glue_and_solve(start, r_lo):
        chunk, r_lo = decode_records_range(
            packed, recs, cum, start, B, n_p, r_lo, True)
        q = gather_vf_queries(v0, v1, F, chunk, dtype=jnp.float32,
                              vcat=vcat, ftab=ftab)
        valid = (start + jnp.arange(B)) < n_p
        out = pallas_find_roots(
            q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
            jnp.float32(1e-6))
        return out[0], r_lo

    def timed(name, fn, reps=7):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(fn())
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{name}: {statistics.median(ts):.2f} ms", flush=True)
        return statistics.median(ts)

    z = jnp.int32(0)
    t_glue = timed("glue only (decode+gather+tol/err+pack)",
                   lambda: glue(z, z))
    t_both = timed("glue + solver kernel", lambda: glue_and_solve(z, z))

    # solver alone on the same batch's pre-packed rows
    chunk, _ = decode_records_range(packed, recs, cum, z, B, n_p, z, True)
    q = gather_vf_queries(v0, v1, F, chunk, dtype=jnp.float32,
                          vcat=vcat, ftab=ftab)
    valid = (jnp.arange(B) < n_p)
    t_solve = timed("solver kernel alone", lambda: pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6))[0])
    print(f"glue share of glue+solve: "
          f"{100 * (t_both - t_solve) / t_both:.1f}% "
          f"(standalone glue {t_glue:.2f} ms incl. ~0.03 ms sync)",
          flush=True)


def step_sparse_budget_compile():
    """grid-1000 sparse at a FORCED 2^25 pair budget: the config whose
    (R, 8) record buffer hit the 16 GB HBM wall at compile; the tiled
    layout must compile and run."""
    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere

    scene = cloth_on_sphere(grid_n=1000, sphere_subdiv=4, drop=0.25)
    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    ms, toi, ovf, first = _time_fused(
        args, reps=1, sweep_impl="pallas_sparse",
        vf_budget=1 << 25, ee_budget=1 << 25,
    )
    print(f"sparse @2^25 budget: {ms:.0f} ms toi={toi:.6f} ovf={ovf} "
          f"(first {first:.0f}s)", flush=True)


def main():
    steps = sys.argv[1:] or ["bench", "glue", "grid1000", "sparse25"]
    print("devices:", jax.devices(), flush=True)
    if "bench" in steps:
        _guard("1. bench, new default path", step_bench_default)
    if "glue" in steps:
        _guard("2. narrow-batch glue ablation", step_glue_ablation)
    if "grid1000" in steps:
        _guard("3. grid-1000, new default path",
               lambda: step_grid_default(1000))
    if "sparse25" in steps:
        _guard("4. sparse @2^25 compile check", step_sparse_budget_compile)
    print("\nperf suite complete", flush=True)


if __name__ == "__main__":
    main()
