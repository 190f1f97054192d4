"""One-off hardware parity check for the sparse-staged record layout.

Runs the bit-record sweep kernel on the REAL chip with layout="sparse" and
layout="dense" on a mid-size scene and asserts identical pair sets against
the raw-pair kernel path, then times all three.  Times with jax.device_get
of scalars (PERF.md sync discipline).
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


def main():
    print("devices:", jax.devices(), flush=True)
    scene = cloth_on_sphere(grid_n=128, sphere_subdiv=4, drop=0.25)
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

    def timeit(fn, reps=5):
        fn()  # warm / compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3

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

        for layout in ("dense", "sparse", "mxu"):
            recs, n_r, n_pr, ovf = pallas_sweep_records(
                packed, n, two, pair_budget=budget, layout=layout
            )
            n_pr_i = int(jax.device_get(n_pr))
            assert not bool(jax.device_get(ovf)), layout
            assert n_pr_i == n_p, (layout, n_pr_i, n_p)
            cum = records_pair_prefix(recs, n_r)
            got, r_lo, B = [], jnp.int32(0), 1 << 16
            for start in range(0, n_pr_i, B):
                chunk, r_lo = decode_records_range(
                    packed, recs, cum, jnp.int32(start), B, n_pr, r_lo, two
                )
                m = min(B, n_pr_i - start)
                got.extend(map(tuple, np.asarray(
                    jax.device_get(chunk[:m])).tolist()))
            assert set(got) == ref, f"{name} {layout} pair-set mismatch"
            print(f"{name} {layout}: parity OK ({n_pr_i} pairs, "
                  f"{int(jax.device_get(n_r))} records)", flush=True)

        t_raw = timeit(lambda: jax.device_get(
            pallas_sweep_pairs(packed, n, two, budget=budget, raw=True)[1]))
        line = f"{name}: raw={t_raw:.1f} ms"
        for layout in ("dense", "sparse", "mxu"):
            t_rec = timeit(lambda layout=layout: jax.device_get(
                pallas_sweep_records(
                    packed, n, two, pair_budget=budget, layout=layout
                )[2]))
            line += f"  {layout}={t_rec:.1f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
