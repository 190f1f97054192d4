"""Multi-chip CCD over a device mesh (``parallel.sharded``).

Run on a TPU pod slice, or try locally on 8 virtual CPU devices:

    python examples/multichip.py            # uses all jax.devices()

Each chip sweeps a contiguous range of the sorted box array, candidates
are pooled and re-striped across chips (one ICI all_gather per phase),
and the running TOI is exchanged with ``pmin`` after every narrow batch
so chips prune each other mid-search.  ``partition="box"`` additionally
shards box MEMORY: each chip holds only its owned slice of the sorted
order plus a halo (O(n/S + halo) per chip).
"""
import jax

# For a local demo without a pod, force 8 virtual CPU devices BEFORE any
# computation (must run before the first jax usage in this process):
if jax.default_backend() == "cpu" and len(jax.devices()) == 1:
    print("hint: run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
          "for a multi-device CPU demo")

import jax.numpy as jnp  # noqa: E402

from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere  # noqa: E402
from scalable_ccd_tpu.parallel.sharded import (  # noqa: E402
    default_mesh,
    sharded_ccd,
)


def main():
    mesh = default_mesh()  # 1-D mesh over every available device
    print(f"mesh: {mesh.size} device(s): {mesh.devices.ravel()[:4]}...")

    scene = cloth_on_sphere(grid_n=24, sphere_subdiv=2, drop=0.5)
    res = sharded_ccd(
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
        mesh=mesh,
        vf_budget_per_shard=1 << 14,
        ee_budget_per_shard=1 << 14,
    )
    print(f"sharded_ccd: toi={float(res.toi):.6f} "
          f"vf={int(res.vf_total)} ee={int(res.ee_total)} "
          f"overflowed={bool(res.overflowed)}")

    # pod-scale memory mode: per-chip boxes are O(n/S + halo)
    res = sharded_ccd(
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
        mesh=mesh,
        vf_budget_per_shard=1 << 14,
        ee_budget_per_shard=1 << 14,
        partition="box",
    ) if mesh.size > 1 else res
    print(f"partition='box': toi={float(res.toi):.6f}")


if __name__ == "__main__":
    main()
