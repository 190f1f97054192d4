"""Per-frame IPC stepping loop (the reference's ``ipc_ccd_strategy``).

Run:  python examples/ipc_loop.py

Each frame: query the earliest TOI for the proposed displacement, step
``toi`` of the way, repeat.  ``ipc_ccd_strategy`` applies the IPC
[Li et al. 2020] rule (``ipc_ccd_strategy.cu:73-92``): when a batch
drops the running TOI below 1e-6 it restores the pre-batch value,
re-solves the batch exactly (ms=0, unbounded), and scales by 0.8 —
never returning a step that lands inside the obstacle.
"""
import numpy as np

from scalable_ccd_tpu import ipc_ccd_strategy
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere


def main():
    scene = cloth_on_sphere(grid_n=16, sphere_subdiv=2, drop=0.6)
    v = np.asarray(scene.vertices_t0, np.float64)
    target = np.asarray(scene.vertices_t1, np.float64)

    for frame in range(5):
        toi = ipc_ccd_strategy(
            v, target, scene.edges, scene.faces,
            min_distance=1e-3, max_iterations=1_000_000, tolerance=1e-6,
        )
        # advance toi of the way toward the proposed positions
        v = v + toi * (target - v)
        print(f"frame {frame}: toi={toi:.6f}")
        if toi >= 1.0:
            print("full step taken — contact-free")
            break


if __name__ == "__main__":
    main()
