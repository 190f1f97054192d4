"""Offline (CPU) stream analysis: would minor-axis-1 union skip planes pay?

The sweep kernel skips partner rows/batches whose FIRST-minor union
misses the a-subtile's union (`pallas_sweep_ap.py:543-558`); the second
minor axis is only tested per-slot in the vector filter.  This tool
replays the exact stream structure (extent-classed a-side subtiles,
sorted partner order, fwdmin stream stop, row + batch minor-0 union
tests) from the real packed planes and counts how many of the surviving
batches a minor-1 union test (subtile union vs partner row/batch union)
would ALSO kill — the decision input for adding 4 more planes + 2 SMEM
reads per live batch to the kernel.

Pure analysis; runs on CPU, no kernel changes.

Usage: python tools/analyze_minor1_skip.py [grid=600] [phase=ee|vf|both]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from scalable_ccd_tpu.broad_phase.sweep import merge_two_lists, sort_boxes
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.ops import pallas_sweep_ap as ap


def analyze(sorted_boxes, name):
    (bf, bi, wf, wi), n = ap.pack_boxes_ap(sorted_boxes)
    bf = np.asarray(bf)
    bi = np.asarray(bi)
    wf = np.asarray(wf)
    rows = wf.shape[1]
    LANE, SUB = ap._LANE, ap._SUB
    n_sub = rows // SUB  # trailing partial subtile ignored (padding-only)

    # a-side per-subtile unions / reach / earliest position
    def sub_red(plane, red, pad):
        x = plane.reshape(-1)[: n_sub * SUB * LANE]
        return red(x.reshape(n_sub, SUB * LANE), axis=1)

    a_umin0 = sub_red(bf[ap._MIN0], np.min, None)
    a_umax0 = sub_red(bf[ap._MAX0], np.max, None)
    a_umin1 = sub_red(bf[ap._MIN1], np.min, None)
    a_umax1 = sub_red(bf[ap._MAX1], np.max, None)
    a_reach = sub_red(bf[ap._MAJ_MAX], np.max, None)
    a_pos_min = sub_red(bi[ap._POS], np.min, None)

    # partner-side per-batch (8) and per-row (128) unions
    nb = rows * (LANE // 8)
    min0 = wf[ap._MIN0].reshape(nb, 8)
    max0 = wf[ap._MAX0].reshape(nb, 8)
    min1 = wf[ap._MIN1].reshape(nb, 8)
    max1 = wf[ap._MAX1].reshape(nb, 8)
    b_min0, b_max0 = min0.min(1), max0.max(1)
    b_min1, b_max1 = min1.min(1), max1.max(1)
    r_min0 = wf[ap._ROWUMIN][:, 0]
    r_max0 = wf[ap._ROWUMAX][:, 0]
    r_min1 = wf[ap._MIN1].min(1)
    r_max1 = wf[ap._MAX1].max(1)
    fwd = wf[ap._FWDMIN].reshape(-1)  # non-decreasing suffix min
    fwd_b = fwd[:: 8][:nb]            # batch-start lane value

    tot = live0 = kill_r0 = kill_b0 = kill_r1 = kill_b1 = 0
    live_after = 0
    for t in range(n_sub):
        j0b = min(int(a_pos_min[t] + 1) // 8, nb)
        stop = int(np.searchsorted(fwd_b, a_reach[t], side="right"))
        if stop <= j0b:
            continue
        sl = slice(j0b, stop)
        rb = np.arange(j0b, stop) // (LANE // 8)  # row of each batch
        n_range = stop - j0b
        rd = (r_min0[rb] > a_umax0[t]) | (r_max0[rb] < a_umin0[t])
        bd = (b_min0[sl] > a_umax0[t]) | (b_max0[sl] < a_umin0[t])
        rd1 = (r_min1[rb] > a_umax1[t]) | (r_max1[rb] < a_umin1[t])
        bd1 = (b_min1[sl] > a_umax1[t]) | (b_max1[sl] < a_umin1[t])
        tot += n_range
        kill_r0 += int(rd.sum())
        alive = ~rd
        kill_b0 += int((alive & bd).sum())
        alive &= ~bd
        live0 += int(alive.sum())
        kill_r1 += int((alive & rd1).sum())
        kill_b1 += int((alive & ~rd1 & bd1).sum())
        live_after += int((alive & ~rd1 & ~bd1).sum())

    print(f"[{name}] n={n} rows={rows} subtiles={n_sub}")
    print(f"  streamed batches:        {tot:>12,}")
    print(f"  killed by row minor0:    {kill_r0:>12,} ({kill_r0/max(tot,1):.1%})")
    print(f"  killed by batch minor0:  {kill_b0:>12,} ({kill_b0/max(tot,1):.1%})")
    print(f"  live today:              {live0:>12,} ({live0/max(tot,1):.1%})")
    print(f"  minor1 row would kill:   {kill_r1:>12,} ({kill_r1/max(live0,1):.1%} of live)")
    print(f"  minor1 batch would kill: {kill_b1:>12,} ({kill_b1/max(live0,1):.1%} of live)")
    print(f"  live after minor1:       {live_after:>12,} "
          f"({live_after/max(live0,1):.1%} of live)", flush=True)


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    phase = sys.argv[2] if len(sys.argv) > 2 else "both"
    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=4, drop=0.25)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
    if phase in ("vf", "both"):
        fb = build_face_boxes(vb, jnp.asarray(scene.faces, jnp.int32))
        analyze(sort_boxes(merge_two_lists(vb, fb), bucket_minor=True),
                f"VF grid={grid}")
    if phase in ("ee", "both"):
        eb = build_edge_boxes(vb, jnp.asarray(scene.edges, jnp.int32))
        analyze(sort_boxes(eb, bucket_minor=True), f"EE grid={grid}")


if __name__ == "__main__":
    main()
