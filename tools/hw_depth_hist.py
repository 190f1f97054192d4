"""Hardware probe: solver lane-depth distribution at congested scale.

The narrow phase's cost model is sum-over-blocks of WORST-lane DFS
rounds (a block spins while one lane works); per-round marginal cost is
~0.3-0.4 us/block (hw_solver_rounds).  This probe measures, on the real
grid-N query stream (sweep order, warm global TOI):

  - the per-lane depth CDF (bounded passes at a ladder of round limits;
    a lane's bucket = #limits it exceeds),
  - the AS-IS block bound: sum over 2048-lane blocks of the worst lane's
    bucket ceiling,
  - the DEPTH-SORTED bound: same sum after globally sorting lanes by
    depth bucket (the best any repacking/batching scheme can reach
    without cross-lane work stealing).

If sorted << as-is, depth-homogeneous batching is worth kernel/pipeline
surgery; if they are close, sweep-order locality already packs deep
lanes together and the worst-lane bound is structural.

Reference anchor: per-thread independent DFS, no block coupling
(``src/scalable_ccd/cuda/narrow_phase/root_finder.cu:280-330``) — the
CUDA design pays divergence per warp, this design per 2048-lane block.

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_depth_hist.py [grid=1000] [subdiv=4]
"""
import functools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import scalable_ccd_tpu  # noqa: F401  (persistent compile cache)
from scalable_ccd_tpu.broad_phase.sweep import merge_two_lists, sort_boxes
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.narrow_phase.types import (
    concat_frames,
    gather_ee_queries,
    gather_vf_queries,
    pack_edge_table,
    pack_face_table,
)
from scalable_ccd_tpu.narrow_phase.root_finder import (
    compute_tolerance,
    numerical_error_bound,
)
from scalable_ccd_tpu.ops.pallas_solver import _find_roots_packed

LIMITS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)
B = 1 << 14
BLOCK = 16 * 128  # the hardware block (block_sub=16)
INTERPRET = jax.default_backend() != "tpu"  # CPU smoke runs


def main():
    import os

    if os.path.exists("/tmp/skip_depth_hist"):
        # ~18 grid-scale compiles — deferred when the round is about to
        # end (a mid-dispatch kill risks wedging the TPU worker and a
        # collision with the driver's bench run; CLAUDE.md)
        print("skip flag set (/tmp/skip_depth_hist) — deferring",
              flush=True)
        return
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    subdiv = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print("devices:", jax.devices(), flush=True)
    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=subdiv, drop=0.25)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    E = jnp.asarray(scene.edges, jnp.int32)
    F = jnp.asarray(scene.faces, jnp.int32)
    bm = (v0.shape[0] + F.shape[0]) >= (1 << 20)
    vcat = concat_frames(v0, v1, jnp.float32)
    ftab = pack_face_table(vcat, F)
    etab = pack_edge_table(vcat, E)

    from scalable_ccd_tpu.ops.pallas_sweep_ap import (
        decode_records_range,
        pack_boxes_ap,
        pallas_sweep_records,
        records_pair_prefix,
    )

    @functools.partial(jax.jit, static_argnames=("is_vf",))
    def prep(is_vf):
        vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
        if is_vf:
            s = sort_boxes(merge_two_lists(vb, build_face_boxes(vb, F)),
                           bucket_minor=bm)
        else:
            s = sort_boxes(build_edge_boxes(vb, E), bucket_minor=bm)
        packed, n = pack_boxes_ap(s)
        recs, n_r, n_p, ovf = pallas_sweep_records(
            packed, n, is_vf, pair_budget=1 << 24, layout="mxu",
            any_order=bm, interpret=INTERPRET)
        return packed, recs, records_pair_prefix(recs, n_r), n_p

    @functools.partial(jax.jit, static_argnames=("is_vf", "rl", "nb"))
    def depth_pass(packed, recs, cum, n_p, toi0, is_vf, rl, nb):
        """Bounded pass at rl over every batch; per-lane unfin buckets."""
        lane = jnp.arange(B, dtype=jnp.int32)

        def body(step, st):
            buckets, r_lo = st
            start = step * B
            chunk, r_lo = decode_records_range(
                packed, recs, cum, start, B, n_p, r_lo, is_vf)
            if is_vf:
                q = gather_vf_queries(v0, v1, F, chunk, dtype=jnp.float32,
                                      vcat=vcat, ftab=ftab)
            else:
                q = gather_ee_queries(v0, v1, E, chunk, dtype=jnp.float32,
                                      vcat=vcat, etab=etab)
            keep = ((start + lane) < n_p).astype(jnp.int32)
            ms_arr = jnp.zeros((B,), jnp.float32)
            err = numerical_error_bound(q, is_vf, False)
            tol = compute_tolerance(q, is_vf, jnp.float32(1e-6))
            qrows = jnp.concatenate(
                [q.p0s, q.p1s, q.p2s, q.p3s, q.p0e, q.p1e, q.p2e, q.p3e,
                 tol, err, ms_arr[:, None]], axis=1)
            _, _, _, unfin = _find_roots_packed(
                qrows, keep, is_vf=is_vf, toi_init=toi0,
                tolerance=jnp.float32(1e-6), allow_zero_toi=True,
                interpret=INTERPRET, toi_per_query=False,
                max_iterations=-1, round_limit=rl, block_sub=16,
            )
            return buckets.at[step].add(unfin), r_lo

        buckets0 = jnp.zeros((nb, B), jnp.int32)
        buckets, _ = jax.lax.fori_loop(
            0, nb, body, (buckets0, jnp.int32(0)))
        return buckets

    for is_vf in (True, False):
        tag = "VF" if is_vf else "EE"
        args = prep(is_vf)
        n_p = int(jax.device_get(args[3]))
        nb = -(-n_p // B)
        print(f"{tag}: {n_p} pairs, {nb} batches", flush=True)
        # warm TOI: prune against the known final bound so depths reflect
        # the steady-state loop (cold early batches go deeper)
        toi0 = jnp.float32(0.073097 if grid == 1000 else 1.0)
        total = jnp.zeros((nb, B), jnp.int32)
        for rl in LIMITS:
            buckets = depth_pass(*args, toi0, is_vf, rl, nb)
            n_over = int(jax.device_get(jnp.sum(buckets)))
            total = total + buckets
            print(f"  lanes deeper than {rl:5d} rounds: {n_over}",
                  flush=True)
        # bucket b means depth in (LIMITS[b-1], LIMITS[b]]; cost model
        # charges the bucket ceiling
        ceil = jnp.asarray((*LIMITS, 2 * LIMITS[-1]), jnp.int32)
        flat = total.reshape(-1)[:n_p]
        nblk = n_p // BLOCK * BLOCK
        asis = jnp.sum(ceil[jnp.max(
            flat[:nblk].reshape(-1, BLOCK), axis=1)])
        srt = jnp.sort(flat)
        sorted_b = jnp.sum(ceil[jnp.max(
            srt[:nblk].reshape(-1, BLOCK), axis=1)])
        mean_d = jnp.mean(ceil[flat])
        print(f"  block-rounds as-is={int(jax.device_get(asis))} "
              f"depth-sorted={int(jax.device_get(sorted_b))} "
              f"mean-lane-ceil={float(jax.device_get(mean_d)):.1f}",
              flush=True)
    print("depth-hist probe complete", flush=True)


if __name__ == "__main__":
    main()
