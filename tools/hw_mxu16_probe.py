"""Hardware parity + timing probe for the 16-partner mxu record layout.

The mxu16 layout (ops/pallas_sweep_ap.py) doubles the stream batch for
the one-hot placement path: 2x records per window step amortizes the ~5
scalar branches per record-bearing step that dominate the congested
record build (~200 ns/record, PERF.md round 4c), and the placement
matmul gets its full 128 candidate rows.  Hardware risks this probe
checks before any default flips: the 160-row staging ring, the 256-lane
destination one-hot (a (128, 256) x (128, 128) dot_general), the nf=3/4
fold paths, and the two-group batch-skip read.

Runs on the REAL chip: exact pair-set parity mxu16 vs the raw-pair
kernel (VF + EE, bench scale), sweep-only timing mxu vs mxu16, then the
full fused frame both impls.  ONE TPU job at a time; sync via
device_get of scalars (PERF.md).

Usage: python tools/hw_mxu16_probe.py [grid]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from scalable_ccd_tpu.broad_phase.sweep import merge_two_lists, sort_boxes
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.ops.pallas_sweep_ap import (
    decode_records_range,
    pack_boxes_ap,
    pallas_sweep_pairs,
    pallas_sweep_records,
    records_pair_prefix,
)
from scalable_ccd_tpu.pipeline.fused import fused_ccd


def timeit(fn, reps=5):
    fn()  # warm / compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print("devices:", jax.devices(), flush=True)
    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=4, drop=0.25)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    E = jnp.asarray(scene.edges, jnp.int32)
    F = jnp.asarray(scene.faces, jnp.int32)

    @jax.jit
    def prep(v0, v1, E, F):
        vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
        eb = build_edge_boxes(vb, E)
        fb = build_face_boxes(vb, F)
        return sort_boxes(merge_two_lists(vb, fb)), sort_boxes(eb)

    sb_vf, sb_ee = prep(v0, v1, E, F)
    budget = 1 << 20

    for name, sb, two in (("VF", sb_vf, True), ("EE", sb_ee, False)):
        packed, n = pack_boxes_ap(sb)
        pairs, n_p, n_t, ovf = pallas_sweep_pairs(
            packed, n, two, budget=budget
        )
        n_p = int(jax.device_get(n_p))
        assert not bool(jax.device_get(ovf))
        ref = set(map(tuple, np.asarray(
            jax.device_get(pairs[:n_p])).tolist()))
        print(f"{name}: {n_p} pairs (raw path)", flush=True)

        recs, n_r, n_pr, ovf = pallas_sweep_records(
            packed, n, two, pair_budget=budget, layout="mxu16"
        )
        n_pr_i = int(jax.device_get(n_pr))
        assert not bool(jax.device_get(ovf))
        assert n_pr_i == n_p, (n_pr_i, n_p)
        cum = records_pair_prefix(recs, n_r)
        got, r_lo, B = [], jnp.int32(0), 1 << 16
        for start in range(0, n_pr_i, B):
            chunk, r_lo = decode_records_range(
                packed, recs, cum, jnp.int32(start), B, n_pr, r_lo, two
            )
            m = min(B, n_pr_i - start)
            got.extend(map(tuple, np.asarray(
                jax.device_get(chunk[:m])).tolist()))
        assert set(got) == ref, f"{name} mxu16 pair-set mismatch"
        print(f"{name} mxu16: parity OK ({n_pr_i} pairs, "
              f"{int(jax.device_get(n_r))} records)", flush=True)

        line = f"{name} sweep-only:"
        for layout in ("mxu", "mxu16"):
            t_rec = timeit(lambda layout=layout: jax.device_get(
                pallas_sweep_records(
                    packed, n, two, pair_budget=budget, layout=layout
                )[2]))
            line += f"  {layout}={t_rec:.1f} ms"
        print(line, flush=True)

    for impl in ("pallas_mxu", "pallas_mxu16"):
        kw = dict(max_iterations=-1, dtype=jnp.float32, validate=False,
                  sweep_impl=impl)
        r = fused_ccd(v0, v1, E, F, **kw)
        toi = float(jax.device_get(r.toi))
        t = timeit(lambda: jax.device_get(
            fused_ccd(v0, v1, E, F, **kw).toi))
        print(f"fused {impl}: {t:.1f} ms/frame toi={toi:.6f} "
              f"vf={int(jax.device_get(r.vf_total))} "
              f"ee={int(jax.device_get(r.ee_total))}", flush=True)


if __name__ == "__main__":
    main()
