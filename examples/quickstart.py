"""Single-chip fused CCD in one dispatch: TOI, per-pair hits, stats.

Run:  python examples/quickstart.py  (TPU if available, CPU otherwise)

Mirrors the reference's basic usage (``cuda/ccd.cuh:26-38``): earliest
time of impact over all vertex-face and edge-edge pairs of a linearly
moving triangle mesh, plus the TOI_PER_QUERY per-pair hit list as a
runtime option.
"""
import jax.numpy as jnp

from scalable_ccd_tpu import CCDConfig, CCDStats, ccd, fused_ccd
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere


def main():
    # a cloth grid dropping onto a sphere between t=0 and t=1
    scene = cloth_on_sphere(grid_n=24, sphere_subdiv=2, drop=0.5)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    edges = jnp.asarray(scene.edges, jnp.int32)
    faces = jnp.asarray(scene.faces, jnp.int32)

    # --- flagship path: the whole query in ONE jitted dispatch ---------
    res = fused_ccd(v0, v1, edges, faces)  # budgets/knobs auto-resolved
    print(f"fused_ccd: toi={float(res.toi):.6f} "
          f"candidates vf={int(res.vf_total)} ee={int(res.ee_total)} "
          f"overflowed={bool(res.overflowed)}")

    # --- per-pair collisions (the reference's TOI_PER_QUERY build) -----
    hits = []
    res = fused_ccd(v0, v1, edges, faces, collisions=hits)
    print(f"collisions: {len(hits)} pairs with toi < 1; earliest "
          f"{min((t for _, _, t in hits), default=1.0):.6f}")

    # --- chunked pipeline: unbounded scene size + per-stage stats ------
    stats = CCDStats()
    toi = ccd(scene.vertices_t0, scene.vertices_t1, scene.edges,
              scene.faces, config=CCDConfig(), stats=stats)
    print(f"ccd (chunked): toi={toi:.6f} "
          f"broad={stats.broad_time_s:.3f}s sweep={stats.sweep_time_s:.3f}s "
          f"narrow={stats.narrow_time_s:.3f}s checks={stats.narrow_checks}")


if __name__ == "__main__":
    main()
