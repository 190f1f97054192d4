"""Hardware validation + overhead of precision="compensated" (round 5).

1. Error-free transforms on the real chip: two_sum / two_prod results are
   fetched (small arrays) and reconstructed in f64 on the host — must be
   bit-exact (validates XLA:TPU preserves the written op sequence and that
   denormal flushing doesn't bite at these magnitudes).
2. Dense-cluster golden scene end-to-end on chip: plain f32 must collapse
   to toi=0, compensated must recover the committed f64-oracle value.
3. Overhead at bench scale: the 41k-query VF solve, XLA BFS f32 vs BFS
   compensated vs the Pallas kernel (the numbers for PERF.md).

One TPU job at a time; launch via nohup (CLAUDE.md outage protocol).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

from scalable_ccd_tpu.ops import twofloat as tf

# ---- 1. EFT exactness on chip --------------------------------------------
rng = np.random.default_rng(3)
n = 4096
a = (rng.uniform(-1, 1, n) * 2.0 ** rng.integers(-6, 6, n)).astype(np.float32)
b = (rng.uniform(-1, 1, n) * 2.0 ** rng.integers(-6, 6, n)).astype(np.float32)


@jax.jit
def eft(a, b):
    s, e = tf.two_sum(a, b)
    p, f = tf.two_prod(a, b)
    return s, e, p, f


s, e, p, f = jax.device_get(eft(jnp.asarray(a), jnp.asarray(b)))
sum_ok = np.array_equal(
    s.astype(np.float64) + e.astype(np.float64),
    a.astype(np.float64) + b.astype(np.float64),
)
prod_ok = np.array_equal(
    p.astype(np.float64) + f.astype(np.float64),
    a.astype(np.float64) * b.astype(np.float64),
)
print(f"EFT on chip: two_sum exact={sum_ok} two_prod exact={prod_ok}",
      flush=True)
assert sum_ok and prod_ok, "error-free transforms broken on TPU!"

# ---- 2. dense-cluster golden scene ---------------------------------------
from scalable_ccd_tpu.geometry import edges_from_faces, read_ply
from scalable_ccd_tpu.pipeline.fused import fused_ccd

base = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "dense-cluster")
v0, F = read_ply(os.path.join(base, "frames", "f0.ply"))
v1, _ = read_ply(os.path.join(base, "frames", "f1.ply"))
E = edges_from_faces(F)
with open(os.path.join(base, "toi.json")) as fh:
    golden = json.load(fh)["toi"]

r32 = fused_ccd(v0, v1, E, F, dtype=jnp.float32)
rc = fused_ccd(v0, v1, E, F, dtype=jnp.float32, precision="compensated")
t32, tc = float(r32.toi), float(rc.toi)
print(f"dense-cluster: f32 toi={t32!r} compensated toi={tc!r} "
      f"oracle={golden!r}", flush=True)
assert t32 == 0.0, "expected the f32 collapse on chip"
assert abs(tc - golden) / golden < 2e-2, "compensated missed the oracle"

# ---- 3. overhead at bench scale ------------------------------------------
from scalable_ccd_tpu.broad_phase import (
    detect_overlaps, merge_two_lists, sort_boxes,
)
from scalable_ccd_tpu.geometry import (
    build_face_boxes, build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.narrow_phase import (
    find_roots_bfs, gather_vf_queries,
)
from scalable_ccd_tpu.ops.pallas_solver import (
    SOLVER_BLOCK_SUB, pallas_find_roots,
)

scene = cloth_on_sphere(grid_n=128, sphere_subdiv=4, drop=0.25)
vb = build_vertex_boxes(
    scene.vertices_t0, scene.vertices_t1, dtype=jnp.float32)
fb = build_face_boxes(vb, scene.faces)
vf = detect_overlaps(sort_boxes(merge_two_lists(vb, fb)), is_two_lists=True)
q = gather_vf_queries(
    scene.vertices_t0, scene.vertices_t1, scene.faces, vf,
    dtype=jnp.float32,
)
valid = jnp.ones((q.n,), bool)
print(f"bench VF queries: {q.n}", flush=True)


def timeit(label, fn, reps=5):
    toi = fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    v = float(jax.device_get(out))  # scalar fetch = sync (CLAUDE.md)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label}: {dt:.1f} ms toi={v:.6f}", flush=True)
    return dt


kw = dict(toi_init=1.0, ms=0.0, tolerance=1e-6)
timeit("bfs f32", lambda: find_roots_bfs(q, valid, True, **kw).toi)
timeit("bfs compensated",
       lambda: find_roots_bfs(q, valid, True, compensated=True, **kw).toi)
timeit("pallas f32", lambda: pallas_find_roots(
    q, valid, True, jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1e-6),
    block_sub=SOLVER_BLOCK_SUB, round_limit=128,
)[0])
print("compensated probe complete", flush=True)
