"""Hardware probe: the grid-1000 narrow-phase residual, decomposed.

The stage breakdown leaves ~2.86 s of the 7.24 s grid-1000 frame in the
narrow loop (record decode + endpoint gather + solver with running TOI).
Two hypotheses for where it goes:

  (a) deep exploration before the TOI settles (early batches solve at
      toi_init=1.0) — testable by warm-starting the loop at the known
      final TOI: if warm << cold, a sampled pre-batch pays;
  (b) a per-pair / per-batch constant (decode + gathers + pack + the
      solver's root-prune rounds) — testable by batch-size scaling:
      per-batch constants shrink at 4x the batch, per-pair ones don't.

This replays the fused pipeline's exact global-mode narrow loop (same
decode, same gathers, same solver flags incl. the auto escalation limit
and the tuned block) standalone per phase, timed at
toi_init in {1.0, final} x narrow_batch in {16384, 65536}.

Reference anchor: one streaming loop against a live global TOI,
``src/scalable_ccd/cuda/narrow_phase/narrow_phase.cu:136-195``.

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_narrow_residual.py [grid=1000] [subdiv=4]
"""
import functools
import sys
import time

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
from scalable_ccd_tpu.ops.pallas_solver import pallas_find_roots
from scalable_ccd_tpu.ops.pallas_sweep_ap import (
    decode_records_range,
    pack_boxes_ap,
    pallas_sweep_records,
    records_pair_prefix,
)
from scalable_ccd_tpu.pipeline.fused import _AUTO_ESCALATE_ROUNDS


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
    budget = 1 << 24
    vcat = concat_frames(v0, v1, jnp.float32)
    ftab = pack_face_table(vcat, F)
    etab = pack_edge_table(vcat, E)

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
            packed, n, is_vf, pair_budget=budget, layout="mxu",
            any_order=bm)
        return packed, recs, records_pair_prefix(recs, n_r), n_p

    @functools.partial(jax.jit, static_argnames=("is_vf", "B"))
    def narrow(packed, recs, cum, n_p, toi0, is_vf, B):
        lane = jnp.arange(B, dtype=jnp.int32)

        def cond(st):
            step, toi, r_lo, ck = st
            return (step * B < n_p) & (toi > 0)

        def body(st):
            step, toi, r_lo, ck = st
            start = step * B
            chunk, r_lo = decode_records_range(
                packed, recs, cum, start, B, n_p, r_lo, is_vf)
            if is_vf:
                q = gather_vf_queries(v0, v1, F, chunk, dtype=jnp.float32,
                                      vcat=vcat, ftab=ftab)
            else:
                q = gather_ee_queries(v0, v1, E, chunk, dtype=jnp.float32,
                                      vcat=vcat, etab=etab)
            keep = (start + lane) < n_p
            out = pallas_find_roots(
                q, keep, is_vf, toi, jnp.float32(0.0), jnp.float32(1e-6),
                round_limit=_AUTO_ESCALATE_ROUNDS, block_sub=16,
            )
            return (step + 1, jnp.minimum(toi, out[0]), r_lo,
                    ck + out[2].astype(jnp.int32))

        _, toi, _, ck = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(toi0), jnp.int32(0),
                         jnp.int32(0)))
        return toi, ck

    for is_vf in (True, False):
        tag = "VF" if is_vf else "EE"
        args = prep(is_vf)
        n_p = int(jax.device_get(args[3]))
        print(f"{tag}: {n_p} pairs", flush=True)
        toi_final = None
        for B in (1 << 14, 1 << 16):
            for label, toi0 in (("cold 1.0", 1.0),
                                ("warm", toi_final or 1.0)):
                if label == "warm" and toi_final is None:
                    continue

                def run():
                    return narrow(*args, jnp.float32(toi0), is_vf, B)

                t0 = time.perf_counter()
                toi, ck = (float(jax.device_get(x)) for x in run())
                first = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    toi, ck = (float(jax.device_get(x)) for x in run())
                    ts.append(time.perf_counter() - t0)
                ms = min(ts) * 1e3
                print(f"  B={B:6d} {label:9s}: {ms:7.1f} ms "
                      f"toi={toi:.6f} checks={ck:.0f} "
                      f"(first {first:.0f}s)", flush=True)
                if label.startswith("cold"):
                    toi_final = toi
    print("\nnarrow-residual probe complete", flush=True)


if __name__ == "__main__":
    main()
