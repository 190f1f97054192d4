"""Per-stage breakdown of the congested grid-1000 frame on the MXU
record path (the round-4 TPU default).

Splits the default fused frame into:
  1. box build + sort + kernel pack, per phase;
  2. the record-emitting sweep kernel (stream + in-kernel extraction),
     per phase — compared against a count-only sweep of the same stream
     to separate "walking the slots" from "building the records";
  3. the narrow loop (per-batch record decode + endpoint gather + solver
     kernel with running TOI), per phase.

VERDICT r3 item 2's target is a <= ~5.5 s grid-1000 frame; this tells us
where the remaining time lives after the mxu flip (6431 ms measured,
hw_verify_r4b.log).  Reference anchor: emission must not dominate the
sweep (``src/scalable_ccd/cuda/broad_phase/collision.cuh:45-54``).

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_grid1000_stages.py [grid] [subdiv]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import scalable_ccd_tpu  # noqa: F401  (persistent compile cache)


def tic(name, f, reps=3):
    t0 = time.perf_counter()
    jax.device_get(jax.tree_util.tree_leaves(f())[0])
    first = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree_util.tree_leaves(f())[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) * 1e3:.1f} ms (first {first:.0f}s)", flush=True)
    return min(ts) * 1e3


def main():
    from scalable_ccd_tpu.broad_phase.sweep import (
        merge_two_lists, sort_boxes,
    )
    from scalable_ccd_tpu.geometry.aabb import (
        build_edge_boxes, build_face_boxes, build_vertex_boxes,
    )
    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
    from scalable_ccd_tpu.pipeline.fused import fused_ccd
    from scalable_ccd_tpu.ops.pallas_sweep_ap import (
        pack_boxes_ap, pallas_sweep_records,
    )

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    subdiv = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print("devices:", jax.devices(), flush=True)
    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=subdiv, drop=0.25)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    E = jnp.asarray(scene.edges, jnp.int32)
    F = jnp.asarray(scene.faces, jnp.int32)
    print(f"grid={grid}: nv={v0.shape[0]} ne={E.shape[0]} nf={F.shape[0]}",
          flush=True)

    # the default bucket_minor="auto" rule: VF-phase boxes (verts+faces)
    bm = (v0.shape[0] + F.shape[0]) >= (1 << 20)

    @jax.jit
    def prep_vf(v0, v1, F):
        vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
        fb = build_face_boxes(vb, F)
        s = sort_boxes(merge_two_lists(vb, fb), bucket_minor=bm)
        return pack_boxes_ap(s)

    @jax.jit
    def prep_ee(v0, v1, E):
        vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
        eb = build_edge_boxes(vb, E)
        s = sort_boxes(eb, bucket_minor=bm)
        return pack_boxes_ap(s)

    tic("prep VF (boxes+sort+pack)", lambda: prep_vf(v0, v1, F)[1])
    tic("prep EE (boxes+sort+pack)", lambda: prep_ee(v0, v1, E)[1])
    packed_vf, n_vf = prep_vf(v0, v1, F)
    packed_ee, n_ee = prep_ee(v0, v1, E)

    budget = 1 << 24

    def sweep(packed, n, istwo, layout):
        recs, n_r, n_p, ovf = pallas_sweep_records(
            packed, n, istwo, pair_budget=budget, layout=layout,
            any_order=bm)
        return n_p

    sweep_j = jax.jit(sweep, static_argnames=("istwo", "layout"))
    for layout in ("mxu",):
        t_vf = tic(f"sweep+records VF ({layout})",
                   lambda: sweep_j(packed_vf, n_vf, True, layout))
        t_ee = tic(f"sweep+records EE ({layout})",
                   lambda: sweep_j(packed_ee, n_ee, False, layout))
    n_p_vf = int(jax.device_get(sweep_j(packed_vf, n_vf, True, "mxu")))
    n_p_ee = int(jax.device_get(sweep_j(packed_ee, n_ee, False, "mxu")))
    print(f"pairs: VF {n_p_vf} EE {n_p_ee}", flush=True)
    print(f"  per-pair: VF {t_vf * 1e6 / max(n_p_vf, 1):.0f} ns "
          f"EE {t_ee * 1e6 / max(n_p_ee, 1):.0f} ns", flush=True)

    # count-only stream: same kernel, pair_budget=128 so record DMA and
    # staging cost ~nothing, exact n_true still reported (the overflow
    # protocol) — isolates slot-walking from record-building
    def count_only(packed, n, istwo):
        recs, n_r, n_p, ovf = pallas_sweep_records(
            packed, n, istwo, pair_budget=128, layout="mxu", any_order=bm)
        return n_p

    count_j = jax.jit(count_only, static_argnames=("istwo",))
    tic("stream-only VF (128-budget)", lambda: count_j(packed_vf, n_vf, True))
    tic("stream-only EE (128-budget)", lambda: count_j(packed_ee, n_ee, False))

    # full frames for the cut
    def frame(**kw):
        r = fused_ccd(v0, v1, E, F, vf_budget=budget, ee_budget=budget,
                      **kw)
        return r.toi

    tic("full fused (defaults, incl escalation)", lambda: frame(), reps=3)
    tic("full fused (escalate_rounds=-1)",
        lambda: frame(escalate_rounds=-1), reps=3)

    print("\nstages complete", flush=True)


if __name__ == "__main__":
    main()
