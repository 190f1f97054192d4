"""Lane-depth distribution probe: pick the auto ``escalate_rounds``.

Runs the solver kernel's bounded pass at several round limits on real
bench-scale VF queries and reports (a) how many lanes are still
mid-search at each limit, (b) the bounded-pass time, and (c) the full
two-pass escalation time vs the unbounded single pass — the data the
``escalate_rounds`` auto policy constant is chosen from (VERDICT r3
item 3: make the ``_MAX_ROUNDS`` conservative-accept unreachable by
policy).

Also runs a forced-skew batch (one near-grazing query amid trivial
ones) to show the escalation win when a block's worst lane dominates.

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_escalation_probe.py
"""
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from tools.hw_round3_suite import _bench_scene


def _timed(fn, reps=5):
    out = fn()
    res = jax.device_get(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts), res


def main():
    import functools

    from scalable_ccd_tpu.broad_phase.sweep import (
        merge_two_lists, sort_boxes,
    )
    from scalable_ccd_tpu.geometry.aabb import (
        build_face_boxes, build_vertex_boxes,
    )
    from scalable_ccd_tpu.narrow_phase import gather_vf_queries
    from scalable_ccd_tpu.narrow_phase.types import (
        compute_tolerance, numerical_error_bound,
    )
    from scalable_ccd_tpu.ops.pallas_solver import (
        _find_roots_packed, pallas_find_roots,
    )
    from scalable_ccd_tpu.ops.pallas_sweep_ap import (
        decode_pairs_ap, pack_boxes_ap, pallas_sweep_pairs,
    )

    print("devices:", jax.devices(), flush=True)
    v0, v1, E, F = _bench_scene()

    @jax.jit
    def prep(v0, v1, E, F):
        vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
        fb = build_face_boxes(vb, F)
        return sort_boxes(merge_two_lists(vb, fb))

    vfs = prep(v0, v1, E, F)
    packed_vf, n_vf = pack_boxes_ap(vfs)
    pairs, n_pairs, _, _ = pallas_sweep_pairs(
        packed_vf, n_vf, True, budget=1 << 18, raw=True)
    npp = int(jax.device_get(n_pairs))
    Q = 1 << max((npp - 1).bit_length(), 10)
    chunk = decode_pairs_ap(packed_vf, pairs[:Q], True)
    valid = (jnp.arange(Q) < npp).astype(jnp.int32)
    q = gather_vf_queries(v0, v1, F, chunk, dtype=jnp.float32)

    dt = jnp.float32
    ms = jnp.zeros((Q,), dt)
    err = numerical_error_bound(q, True, False)
    tol = compute_tolerance(q, True, jnp.float32(1e-6))
    qrows = jnp.concatenate(
        [q.p0s, q.p1s, q.p2s, q.p3s, q.p0e, q.p1e, q.p2e, q.p3e,
         tol, err, ms[:, None]], axis=1).astype(dt)

    common = dict(
        is_vf=True, toi_init=jnp.float32(1.0), tolerance=jnp.float32(1e-6),
        allow_zero_toi=True, interpret=False, toi_per_query=False,
        max_iterations=-1,
    )
    bounded = jax.jit(functools.partial(
        _find_roots_packed, **common), static_argnames=("round_limit",))

    print(f"\n{npp} valid VF queries ({Q} lanes)", flush=True)
    t_un, (toi_ref, _, checks_ref) = _timed(
        lambda: bounded(qrows, valid, round_limit=-1))
    print(f"unbounded single pass: {t_un:.1f} ms toi={float(toi_ref):.6f} "
          f"checks={int(checks_ref)}", flush=True)

    for rl in (16, 32, 64, 128, 256, 512, 1024):
        t_b, (toi1, _, ck1, unfin) = _timed(
            lambda rl=rl: bounded(qrows, valid, round_limit=rl))
        nu = int(jax.device_get(jnp.sum(unfin)))
        print(f"round_limit={rl:5d}: pass1 {t_b:6.1f} ms  "
              f"unfinished {nu:6d}/{npp}", flush=True)

    for rl in (64, 128, 256, 512):
        t_e, toi_e = _timed(lambda rl=rl: pallas_find_roots(
            q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
            jnp.float32(1e-6), round_limit=rl)[0])
        ok = "OK" if float(toi_e) == float(toi_ref) else "MISMATCH"
        print(f"two-pass rl={rl:4d}: {t_e:6.1f} ms toi={float(toi_e):.6f} "
              f"[{ok}] (vs {t_un:.1f} ms single)", flush=True)

    # forced skew: block 0 lane 0 gets a degenerate near-parallel slab
    # query whose DFS runs deep; everything else is a trivial miss
    print("\nforced-skew batch:", flush=True)
    Qs = 16384
    eps = jnp.float32(1e-7)
    p = jnp.zeros((Qs, 3), dt)
    hard_t0 = [  # vertex grazing a huge face, nearly coplanar motion
        jnp.array([0.5, 1e-6, 0.5]), jnp.array([0.0, 0.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]),
    ]
    hard_t1 = [
        jnp.array([0.5, -1e-6, 0.5]), jnp.array([0.0, eps, 0.0]),
        jnp.array([1.0, -eps, 0.0]), jnp.array([0.0, eps, 1.0]),
    ]
    from scalable_ccd_tpu.narrow_phase.types import CCDQueries
    mk = lambda h, base: jnp.tile(base, (Qs, 1)).at[0].set(h)
    far = jnp.array([100.0, 100.0, 100.0], dt)
    qs = CCDQueries(
        p0s=mk(hard_t0[0], far), p1s=mk(hard_t0[1], far * 2),
        p2s=mk(hard_t0[2], far * 3), p3s=mk(hard_t0[3], far * 4),
        p0e=mk(hard_t1[0], far), p1e=mk(hard_t1[1], far * 2),
        p2e=mk(hard_t1[2], far * 3), p3e=mk(hard_t1[3], far * 4),
    )
    vs = jnp.ones((Qs,), jnp.int32)
    t_un2, (toi2, ovf2, ck2) = _timed(lambda: pallas_find_roots(
        qs, vs, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6))[:3], reps=3)
    print(f"skew single pass: {t_un2:.1f} ms toi={float(toi2):.6e} "
          f"ovf={bool(ovf2)} checks={int(ck2)}", flush=True)
    for rl in (64, 256):
        t_e2, (toi_e2, ovf_e2, ck_e2) = _timed(lambda rl=rl: pallas_find_roots(
            qs, vs, True, jnp.float32(1.0), jnp.float32(0.0),
            jnp.float32(1e-6), round_limit=rl)[:3], reps=3)
        print(f"skew two-pass rl={rl}: {t_e2:.1f} ms "
              f"toi={float(toi_e2):.6e} ovf={bool(ovf_e2)} "
              f"checks={int(ck_e2)}", flush=True)

    print("\nprobe complete", flush=True)


if __name__ == "__main__":
    main()
