"""Benchmark: fused CCD step wall-clock on the canonical contact scene.

Runs on whatever device JAX picks (the real TPU chip under the driver).
The reference publishes no numbers (BASELINE.md: ``"published": {}``), so
``vs_baseline`` is the speedup over this repo's own first recorded TPU
result (stored in ``BENCH_BASELINE.json`` the first time this script runs
on a TPU); 1.0 on the run that creates the baseline.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_PATH = os.path.join(REPO, "BENCH_BASELINE.json")

# Scene scale chosen to mirror the reference's cloth-ball workload
# (46,598 vertex / 138,825 edge / 92,230 face boxes; BASELINE.md).
GRID_N = 128
SUBDIV = 4
REPS = 5

# First TPU result ever recorded for this scene (2026-08-16, BASELINE.md);
# used when BENCH_BASELINE.json is absent (fresh machine) so vs_baseline
# stays comparable across rounds instead of resetting to 1.0.
FIRST_TPU_MS = 14088.8


def _probe_device(attempts: int = 3, timeout_s: int = 90) -> None:
    """Fail fast if the device backend is unreachable.

    A wedged TPU worker (CLAUDE.md) makes the first in-process dispatch
    hang forever; a supervisor that then timeout-kills this process
    mid-dispatch can wedge the worker even harder.  Probe from a
    disposable subprocess instead: it can be killed without touching this
    process's (not-yet-initialized) backend.
    """
    import subprocess

    code = (
        "import jax, jax.numpy as jnp\n"
        "print(float(jax.device_get(jnp.arange(8.0).sum())))\n"
    )
    last = ""
    for i in range(attempts):
        try:
            res = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if res.returncode == 0 and "28.0" in res.stdout:
                return
            last = (res.stderr or res.stdout)[-500:]
        except subprocess.TimeoutExpired:
            last = f"probe hung > {timeout_s}s"
        if i + 1 < attempts:
            time.sleep(60)
    sys.stderr.write(
        f"bench.py: device backend unreachable, refusing to hang "
        f"({attempts} probes failed; last: {last})\n"
    )
    raise SystemExit(2)


def main() -> None:
    _probe_device()

    from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    scene = cloth_on_sphere(grid_n=GRID_N, sphere_subdiv=SUBDIV, drop=0.25)
    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    # unbounded iterations select the scatter-free global fast mode; runtime
    # is bounded by the solver's round cap (conservative accepts past it).
    # Budgets stay "auto" — the library sizes them scene-proportionally and
    # retries once from exact totals on overflow, so this benches exactly
    # the configuration a user gets by default.
    kw = dict(
        max_iterations=-1, dtype=jnp.float32,
        validate=False,  # validated once below; keep reps pure device time
    )
    from scalable_ccd_tpu.geometry.mesh import validate_mesh_inputs

    validate_mesh_inputs(*args)

    # Sync discipline: the axon tunnel's block_until_ready does NOT
    # synchronize; fetch a scalar with jax.device_get instead (PERF.md).
    def run_synced():
        res = fused_ccd(*args, **kw)
        jax.device_get(res.toi)
        return res

    res = run_synced()  # compile + warm up (+ the one-off auto retry)
    assert not bool(jax.device_get(res.overflowed))

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run_synced()
        times.append((time.perf_counter() - t0) * 1e3)
    ms = statistics.median(times)

    platform = jax.devices()[0].platform
    vs_baseline = 1.0
    if platform != "cpu":
        baseline_ms = FIRST_TPU_MS
        if os.path.exists(BASELINE_PATH):
            with open(BASELINE_PATH) as f:
                baseline_ms = json.load(f)["value"]
        else:
            with open(BASELINE_PATH, "w") as f:
                json.dump({"value": baseline_ms, "platform": platform}, f)
        vs_baseline = baseline_ms / ms

    print(json.dumps({
        "metric": "fused_ccd_ms_per_frame_clothball_scale",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
