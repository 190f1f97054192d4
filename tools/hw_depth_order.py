"""Hardware probe: does depth-ordering the pair stream actually buy time?

hw_depth_hist measured the worst-lane BOUND gap (grid-1000 VF: 56,000
block-rounds as-is vs 16,288 depth-sorted).  This probe measures the
thing itself: wall time of the real narrow solve loop over the same
pair stream in three orders —

  as-is        sweep order (the pipeline today)
  oracle       sorted by measured per-lane depth bucket (upper bound on
               any ordering scheme; needs depths, so not production)
  key          sorted by a static predictor computable from the query
               alone: sum_d log2(extent_d / tol_d) rounded — the maximum
               bisection work if nothing prunes (production-viable: one
               multi-operand sort per phase, ~free per PERF.md)

If oracle ~= as-is: the worst-lane bound is NOT where the narrow-phase
time goes (it's glue/dispatch) — ordering schemes are dead, close the
occupancy chapter.  If oracle << as-is and key ~= oracle: implement the
key sort in the pipelines.  If oracle << as-is but key does nothing:
consider the rl=8-pass 1-bit predictor (pool-and-resort).

Usage: python tools/hw_depth_order.py [grid=1000] [subdiv=4]
ONE TPU job at a time; nohup, never `timeout` (CLAUDE.md).
"""
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if "--cpu" in sys.argv:  # smoke runs; in-process force (CLAUDE.md)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import scalable_ccd_tpu  # noqa: F401
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
INTERPRET = jax.default_backend() != "tpu"


def main():
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
        cum = records_pair_prefix(recs, n_r)
        # materialize the whole decoded pair stream once ((2^24, 2) i32)
        pairs, _ = decode_records_range(
            packed, recs, cum, jnp.int32(0), 1 << 24, n_p, jnp.int32(0),
            is_vf)
        return pairs, n_p

    def gather_q(chunk, is_vf):
        if is_vf:
            return gather_vf_queries(v0, v1, F, chunk, dtype=jnp.float32,
                                     vcat=vcat, ftab=ftab)
        return gather_ee_queries(v0, v1, E, chunk, dtype=jnp.float32,
                                 vcat=vcat, etab=etab)

    @functools.partial(jax.jit, static_argnames=("is_vf", "rl", "nb"))
    def solve_loop(pairs, n_p, toi0, is_vf, rl, nb):
        """The real narrow loop shape: per-batch gather + tol/err + kernel
        (global mode, warm toi carried), plus per-lane unfin counts when
        bounded."""
        lane = jnp.arange(B, dtype=jnp.int32)

        def body(step, st):
            toi, buckets = st
            start = step * B
            chunk = jax.lax.dynamic_slice_in_dim(pairs, start, B, axis=0)
            q = gather_q(chunk, is_vf)
            keep = ((start + lane) < n_p).astype(jnp.int32)
            ms_arr = jnp.zeros((B,), jnp.float32)
            err = numerical_error_bound(q, is_vf, False)
            tol = compute_tolerance(q, is_vf, jnp.float32(1e-6))
            qrows = jnp.concatenate(
                [q.p0s, q.p1s, q.p2s, q.p3s, q.p0e, q.p1e, q.p2e, q.p3e,
                 tol, err, ms_arr[:, None]], axis=1)
            out = _find_roots_packed(
                qrows, keep, is_vf=is_vf, toi_init=toi,
                tolerance=jnp.float32(1e-6), allow_zero_toi=True,
                interpret=INTERPRET, toi_per_query=False,
                max_iterations=-1, round_limit=rl, block_sub=16,
            )
            toi_b = out[0]
            unfin = out[3] if rl >= 0 else jnp.zeros((B,), jnp.int32)
            return jnp.minimum(toi, toi_b), buckets.at[step].add(unfin)

        buckets0 = jnp.zeros((nb, B), jnp.int32)
        toi, buckets = jax.lax.fori_loop(
            0, nb, body, (jnp.float32(toi0), buckets0))
        return toi, buckets

    @functools.partial(jax.jit, static_argnames=("is_vf", "nb"))
    def key_of(pairs, n_p, is_vf, nb):
        """Static depth predictor per pair: sum_d ceil(log2(1/tol_d)) —
        the bisection budget if nothing prunes."""
        def body(step, out):
            start = step * B
            chunk = jax.lax.dynamic_slice_in_dim(pairs, start, B, axis=0)
            q = gather_q(chunk, is_vf)
            tol = compute_tolerance(q, is_vf, jnp.float32(1e-6))
            k = jnp.sum(jnp.ceil(jnp.log2(jnp.maximum(1.0 / tol, 1.0))),
                        axis=1).astype(jnp.int32)
            return jax.lax.dynamic_update_slice_in_dim(out, k, start,
                                                       axis=0)

        out0 = jnp.zeros((pairs.shape[0],), jnp.int32)
        return jax.lax.fori_loop(0, nb, body, out0)

    def timed(label, fn, reps=3):
        out = fn()
        jax.device_get(out[0] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        v = jax.device_get(out[0] if isinstance(out, tuple) else out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {label}: {dt:.1f} ms (toi={float(v):.6f})", flush=True)
        return dt

    for is_vf in (True, False):
        tag = "VF" if is_vf else "EE"
        pairs, n_p_dev = prep(is_vf)
        n_p = int(jax.device_get(n_p_dev))
        nb = -(-n_p // B)
        print(f"{tag}: {n_p} pairs, {nb} batches", flush=True)
        toi0 = 0.073097 if grid == 1000 else 1.0

        # as-is timing (unbounded, warm toi — the steady-state loop)
        timed("as-is   ", lambda: solve_loop(
            pairs, n_p_dev, toi0, is_vf, -1, nb))
        # glue floor: rl=0 runs the whole loop minus solver rounds
        # (decode-slice + gathers + tol/err + pack + dispatch); rl=8 adds
        # eight rounds per block.  The difference decomposes the residual
        # into per-pair glue vs solver compute vs worst-lane tail.
        timed("rl=0    ", lambda: solve_loop(
            pairs, n_p_dev, toi0, is_vf, 0, nb))
        timed("rl=8    ", lambda: solve_loop(
            pairs, n_p_dev, toi0, is_vf, 8, nb))

        # oracle depth buckets from a bounded ladder (not timed)
        total = jnp.zeros((nb, B), jnp.int32)
        for rl in LIMITS:
            _, buckets = solve_loop(pairs, n_p_dev, toi0, is_vf, rl, nb)
            total = total + buckets
        depth = total.reshape(-1)[: nb * B]
        valid = jnp.arange(nb * B) < n_p_dev
        # sort pairs by depth; invalid rows to the back
        key = jnp.where(valid, depth, jnp.int32(2**30))
        ops = jax.lax.sort(
            (key, pairs[: nb * B, 0], pairs[: nb * B, 1]), num_keys=1)
        pairs_o = jnp.concatenate(
            [jnp.stack(ops[1:], axis=1),
             jnp.full((B, 2), jnp.int32(-(2**31) + 1))])
        timed("oracle  ", lambda: solve_loop(
            pairs_o, n_p_dev, toi0, is_vf, -1, nb))

        # static-key ordering
        kvals = key_of(pairs, n_p_dev, is_vf, nb)[: nb * B]
        key2 = jnp.where(valid, kvals, jnp.int32(2**30))
        ops2 = jax.lax.sort(
            (key2, pairs[: nb * B, 0], pairs[: nb * B, 1]), num_keys=1)
        pairs_k = jnp.concatenate(
            [jnp.stack(ops2[1:], axis=1),
             jnp.full((B, 2), jnp.int32(-(2**31) + 1))])
        timed("key-sort", lambda: solve_loop(
            pairs_k, n_p_dev, toi0, is_vf, -1, nb))
        # key quality: rank correlation proxy — mean oracle depth of the
        # worst decile by key vs overall
        k_thr = jnp.percentile(
            jnp.where(valid, kvals, 0).astype(jnp.float32), 90)
        deep_mean = jnp.mean(jnp.where(
            (kvals >= k_thr.astype(jnp.int32)) & valid, depth, 0
        ).astype(jnp.float32))
        all_mean = jnp.mean(jnp.where(valid, depth, 0).astype(jnp.float32))
        print(f"  key top-decile mean depth bucket "
              f"{float(jax.device_get(deep_mean)):.2f} vs overall "
              f"{float(jax.device_get(all_mean)):.2f}", flush=True)
    print("depth-order probe complete", flush=True)


if __name__ == "__main__":
    main()
