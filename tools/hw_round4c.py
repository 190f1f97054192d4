"""Round-4c: hardware verification + timing of the tuned solver block.

The pipelines now pass ``block_sub=16`` (SOLVER_BLOCK_SUB) and the auto
escalation limit moved 256 -> 128 (tools/hw_solver_block.py sweep).  The
kernel-level probe already verified the global mode at bs=16 on chip;
this suite covers what it didn't:

1. ``parity``: per-query mode (TOI_PER_QUERY) and the valid-mask path at
   block_sub=16 vs the native-vreg 8 — exact array equality on real
   bench queries (interpret-green is NOT hardware-green; the pq output
   BlockSpec shape is new at 16 sublanes).
2. ``bench``: canonical bench through the library defaults, plus the
   escalation ablation (expect ~124-128 ms if the tuned block carries
   the solver-level win through; parity toi=0.073130).
3. ``grid1000``: congested default frame, escalation on vs off in the
   SAME process, 5 reps — also settles whether the 6431 (hw_verify_r4b)
   vs 7243-7247 (perf_v2 / stages) spread was code or chip variance
   (the only intervening commits don't touch this path with escalation
   off).

Reference anchor: one streaming narrow-phase loop,
``src/scalable_ccd/cuda/narrow_phase/narrow_phase.cu:136-195``.

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_round4c.py [parity|bench|grid1000 ...]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from tools.hw_round3_suite import _bench_scene, _guard, _time_fused


def step_block_parity():
    from scalable_ccd_tpu.broad_phase import (
        detect_overlaps, merge_two_lists, sort_boxes,
    )
    from scalable_ccd_tpu.geometry.aabb import (
        build_face_boxes, build_vertex_boxes,
    )
    from scalable_ccd_tpu.narrow_phase.types import gather_vf_queries
    from scalable_ccd_tpu.ops.pallas_solver import pallas_find_roots

    v0, v1, E, F = _bench_scene()
    vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
    fb = build_face_boxes(vb, F)
    vf = detect_overlaps(
        sort_boxes(merge_two_lists(vb, fb)), is_two_lists=True)
    q = gather_vf_queries(v0, v1, F, vf)
    # a non-trivial mask exercises pad/invalid-lane handling at bs=16
    valid = (jnp.arange(q.n) % 5 != 0).astype(jnp.int32)
    print(f"{q.n} VF queries, {int(jnp.sum(valid))} valid", flush=True)

    for per_query in (False, True):
        outs = {}
        for bs in (8, 16):
            outs[bs] = pallas_find_roots(
                q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
                jnp.float32(1e-6), toi_per_query=per_query, block_sub=bs,
            )
        mode = "per-query" if per_query else "global"
        toi8, toi16 = (float(jax.device_get(o[0])) for o in outs.values())
        assert toi8 == toi16, (mode, toi8, toi16)
        if per_query:
            pq8 = np.asarray(jax.device_get(outs[8][3]))
            pq16 = np.asarray(jax.device_get(outs[16][3]))
            n_hit = int((pq8 < 1).sum())
            assert np.array_equal(pq8, pq16), (
                mode, np.flatnonzero(pq8 != pq16)[:10])
            print(f"{mode}: bs16 == bs8 exactly "
                  f"({n_hit} per-query hits), toi={toi8:.9f}", flush=True)
        else:
            print(f"{mode}: bs16 == bs8 exactly, toi={toi8:.9f}",
                  flush=True)


def step_bench_default():
    args = _bench_scene()
    ms, toi, ovf, first = _time_fused(args)  # library defaults
    print(f"default path (mxu+auto+esc128+bs16+presample): {ms:.1f} "
          f"ms/frame toi={toi:.6f} ovf={ovf} (first {first:.0f}s)",
          flush=True)
    ms2, toi2, _, _ = _time_fused(args, escalate_rounds=-1)
    print(f"  escalate_rounds=-1: {ms2:.1f} ms/frame toi={toi2:.6f}",
          flush=True)
    assert toi2 == toi
    ms3, toi3, _, _ = _time_fused(args, presample=False)
    print(f"  presample=False: {ms3:.1f} ms/frame toi={toi3:.6f}",
          flush=True)
    assert toi3 == toi


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
    ms, toi, ovf, first = _time_fused(args, reps=5)
    print(f"default path: {ms:.0f} ms/frame toi={toi:.6f} ovf={ovf} "
          f"(first {first:.0f}s)", flush=True)
    ms2, toi2, _, first2 = _time_fused(args, reps=5, escalate_rounds=-1)
    print(f"escalation off: {ms2:.0f} ms/frame toi={toi2:.6f} "
          f"(first {first2:.0f}s)", flush=True)
    assert toi2 == toi
    ms3, toi3, _, _ = _time_fused(args, reps=3, presample=False)
    print(f"presample off: {ms3:.0f} ms/frame toi={toi3:.6f}", flush=True)
    assert toi3 == toi


def main():
    steps = sys.argv[1:] or ["parity", "bench", "grid1000"]
    print("devices:", jax.devices(), flush=True)
    if "parity" in steps:
        _guard("1. solver block_sub=16 parity (per-query + mask)",
               step_block_parity)
    if "bench" in steps:
        _guard("2. bench, tuned defaults", step_bench_default)
    if "grid1000" in steps:
        _guard("3. grid-1000, tuned defaults",
               lambda: step_grid_default(1000))
    print("\nround-4c suite complete", flush=True)


if __name__ == "__main__":
    main()
