"""Hardware probe: bisect the grid-1000 frame regression (6431 -> ~7240).

``tools/logs/hw_verify_r4b.log`` measured the mxu frame at 6431 ms
(pre-escalation, pre-presample code: block_sub=8, no warm-start
pre-batch, precision=HIGHEST placement matmul, pre-tiled-record-layout
commit 858a9e4 landing minutes later).  Every later session measures
~7240-7390 ms with escalation/presample DISABLED, so ~800 ms appeared
somewhere in {block_sub 8->16, tiled record layout, 2-pass matmul,
session variance}.  This probe pins the block_sub axis (the only one
still togglable at runtime) and validates the new auto policies:

1. mxu, escalate=-1, presample=False, block_sub=8   (closest historic)
2. mxu, escalate=-1, presample=False, block_sub=16  (isolates bs)
3. full defaults (auto escalation 128, auto presample -> OFF at this
   scale, bs16) — the policy the driver bench exercises
4. defaults + narrow_batch=65536 (the narrow-residual probe measured
   -10..15% on the standalone narrow loops at this batch)

Reference anchor: the re-run discipline of
``src/scalable_ccd/cuda/narrow_phase/narrow_phase.cu:136-195``.

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_grid_bisect.py [grid]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from tools.hw_round3_suite import _guard, _time_fused


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
    from scalable_ccd_tpu.pipeline import fused

    print("devices:", jax.devices(), flush=True)
    scene = cloth_on_sphere(grid_n=grid, sphere_subdiv=4, drop=0.25)
    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    print(f"grid={grid}: nv={args[0].shape[0]} ne={args[2].shape[0]} "
          f"nf={args[3].shape[0]}", flush=True)

    def row(label, block_sub=None, **kw):
        def run():
            old = fused.SOLVER_BLOCK_SUB
            if block_sub is not None:
                fused.SOLVER_BLOCK_SUB = block_sub
                # same static args as other rows -> drop the jit cache so
                # the module-global block size is re-read at trace time
                fused._fused_ccd_jit.clear_cache()
            try:
                ms, toi, ovf, first = _time_fused(args, reps=3, **kw)
            finally:
                if block_sub is not None:
                    fused.SOLVER_BLOCK_SUB = old
                    fused._fused_ccd_jit.clear_cache()
            print(f"{label}: {ms:.0f} ms/frame toi={toi:.6f} ovf={ovf} "
                  f"(first {first:.0f}s)", flush=True)
        _guard(label, run)

    row("1. esc-off ps-off bs8", block_sub=8,
        escalate_rounds=-1, presample=False)
    row("2. esc-off ps-off bs16", block_sub=16,
        escalate_rounds=-1, presample=False)
    row("3. full defaults (auto)")
    row("4. defaults + narrow_batch=65536", narrow_batch=1 << 16)
    # lane-utilization staging: blocks run as long as their WORST lane
    # (~5% useful-lane occupancy at median depth 32-64 vs cap 128); a
    # tighter bound pools retired-lane batches denser, the pooled pass
    # restores occupancy
    row("5. nb=65536 + escalate_rounds=64",
        narrow_batch=1 << 16, escalate_rounds=64)
    row("6. nb=65536 + escalate_rounds=32",
        narrow_batch=1 << 16, escalate_rounds=32)
    print("\ngrid bisect complete", flush=True)


if __name__ == "__main__":
    main()
