"""Generate the committed golden dataset under ``tests/golden/``.

The reference validates against downloaded ground truth
(``/root/reference/tests/ground_truth.cpp:27-64``,
``tests/test_broad_phase.cu:31-65``); that dataset is egress-blocked here,
so this script produces the same on-disk layout (PLY frame pairs +
``boxes/*.json`` positive-pair lists in the global-id space of
``test_broad_phase.cu:109-118``) for three procedural scenes, with ground
truth from the in-repo float64 oracles:

- broad phase: f64 brute-force AABB overlaps (every true overlap — the
  sweep must be a superset, the ``compare_mathematica`` contract);
- narrow phase: earliest TOI from the f64 per-query DFS root finder,
  spot-verified against the scalar ``ccd_query_oracle`` on the earliest
  VF and EE queries (``toi.json``).

Deterministic (fixed seeds); re-running must reproduce the committed files
bit-for-bit.  Run from the repo root:  python tools/gen_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from scalable_ccd_tpu.broad_phase import brute_force_overlaps
from scalable_ccd_tpu.geometry import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
    write_ply,
)
from scalable_ccd_tpu.geometry.scenes import Scene, cloth_on_sphere, triangle_soup
from scalable_ccd_tpu.narrow_phase import (
    find_roots,
    gather_ee_queries,
    gather_vf_queries,
)
from scalable_ccd_tpu.narrow_phase.oracle import ccd_query_oracle

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
)


def dense_cluster(nt: int = 48, seed: int = 9) -> Scene:
    """Co-located triangle soup: centers clustered far tighter than the
    triangle extent, so nearly every box pair overlaps — the congested
    regime the record-emission kernels are stressed on
    (``tests/test_pallas_sweep_ap.py::test_records_dense_cluster_stress``)."""
    rng = np.random.default_rng(seed)
    centers = 0.002 * rng.uniform(size=(nt, 1, 3))
    v0 = (centers + rng.normal(scale=0.05, size=(nt, 3, 3))).reshape(-1, 3)
    v1 = v0 + rng.normal(scale=0.01, size=v0.shape)
    faces = np.arange(3 * nt, dtype=np.int64).reshape(nt, 3)
    return Scene(v0, v1, faces)


SCENES = {
    # contact-rich cloth-on-ball, the canonical bench family
    "cloth-sphere-16": lambda: cloth_on_sphere(
        grid_n=16, sphere_subdiv=2, drop=0.6
    ),
    # uniform-density soup (run-length distribution stress)
    "soup-60": lambda: triangle_soup(n_triangles=60, motion=0.3, seed=1),
    # everything-overlaps-everything cluster
    "dense-cluster": lambda: dense_cluster(),
}


def flat_oracle_toi(scene, tolerance=1e-6):
    """f64 brute-force candidates + per-query DFS root finding (the suite's
    established oracle, ``tests/test_pipeline.py::flat_oracle_toi``); also
    returns the earliest VF/EE query rows for the scalar spot check."""
    vb = build_vertex_boxes(
        scene.vertices_t0, scene.vertices_t1, dtype=jnp.float64
    )
    eb = build_edge_boxes(vb, scene.edges)
    fb = build_face_boxes(vb, scene.faces)
    toi = 1.0
    spot = {}
    for is_vf in (True, False):
        cands = (
            brute_force_overlaps(vb, fb) if is_vf else brute_force_overlaps(eb)
        )
        if not len(cands):
            continue
        if is_vf:
            q = gather_vf_queries(
                scene.vertices_t0, scene.vertices_t1, scene.faces,
                jnp.asarray(cands), dtype=jnp.float64,
            )
        else:
            q = gather_ee_queries(
                scene.vertices_t0, scene.vertices_t1, scene.edges,
                jnp.asarray(cands), dtype=jnp.float64,
            )
        res = find_roots(
            q, jnp.ones((q.n,), bool), is_vf, toi_init=1.0, ms=0.0,
            tolerance=tolerance, toi_per_query=True,
        )
        pq = np.asarray(res.per_query_toi)
        i = int(np.argmin(pq))
        # (8, 3) endpoint rows for the scalar oracle (p0s..p3s, p0e..p3e)
        pts = np.stack(
            [np.asarray(getattr(q, f))[i]
             for f in ("p0s", "p1s", "p2s", "p3s",
                       "p0e", "p1e", "p2e", "p3e")],
            axis=0,
        )
        spot["vf" if is_vf else "ee"] = (float(pq[i]), pts)
        toi = min(toi, float(res.toi))
    return toi, spot


def main():
    for name, make in SCENES.items():
        scene = make()
        base = os.path.join(GOLDEN_DIR, name)
        os.makedirs(os.path.join(base, "frames"), exist_ok=True)
        os.makedirs(os.path.join(base, "boxes"), exist_ok=True)
        write_ply(
            os.path.join(base, "frames", "f0.ply"),
            scene.vertices_t0, scene.faces,
        )
        write_ply(
            os.path.join(base, "frames", "f1.ply"),
            scene.vertices_t1, scene.faces,
        )

        vb = build_vertex_boxes(
            scene.vertices_t0, scene.vertices_t1, dtype=jnp.float64
        )
        eb = build_edge_boxes(vb, scene.edges)
        fb = build_face_boxes(vb, scene.faces)
        vf = np.asarray(brute_force_overlaps(vb, fb), np.int64)
        ee = np.asarray(brute_force_overlaps(eb), np.int64)
        # global-id offsets, test_broad_phase.cu:109-118
        nv, ne = int(vb.n), int(eb.n)
        ee_g = ee + nv
        vf_g = vf.copy()
        vf_g[:, 1] += nv + ne
        with open(os.path.join(base, "boxes", "f0vf.json"), "w") as fh:
            json.dump(vf_g.tolist(), fh, separators=(",", ":"))
        with open(os.path.join(base, "boxes", "f0ee.json"), "w") as fh:
            json.dump(ee_g.tolist(), fh, separators=(",", ":"))

        toi, spot = flat_oracle_toi(scene)
        # scalar-oracle spot check on the earliest query of each phase:
        # two independently written f64 implementations must agree
        for phase, (pq_toi, pts) in spot.items():
            s_toi, _, _ = ccd_query_oracle(pts, phase == "vf")
            s_toi = min(s_toi, 1.0)
            assert abs(s_toi - pq_toi) < 1e-12, (name, phase, s_toi, pq_toi)
        with open(os.path.join(base, "toi.json"), "w") as fh:
            json.dump(
                {
                    "toi": toi,
                    "tolerance": 1e-6,
                    "min_distance": 0.0,
                    "allow_zero_toi": True,
                    "n_vf_truth": len(vf_g),
                    "n_ee_truth": len(ee_g),
                },
                fh, indent=1,
            )
        print(
            f"{name}: nv={nv} ne={ne} nf={int(fb.n)} "
            f"vf_truth={len(vf_g)} ee_truth={len(ee_g)} toi={toi!r}"
        )


if __name__ == "__main__":
    main()
