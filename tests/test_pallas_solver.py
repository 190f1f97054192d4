"""Pallas narrow-phase solver kernel vs the XLA solvers (interpret mode).

The kernel (``ops/pallas_solver.py``) is the hardware fast path for the
global-mode solve; on CPU it runs in Pallas interpret mode, which executes
the same kernel logic, so these tests pin its semantics against the XLA
queue solver — the same oracle-twin strategy used for bfs vs dfs.  Hardware
execution is exercised by ``bench.py`` / the fused pipeline on TPU (exact
TOI agreement was verified on a v5e chip; see the commit introducing the
kernel).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.broad_phase import brute_force_overlaps
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere, triangle_soup
from scalable_ccd_tpu.narrow_phase import (
    find_roots_bfs,
    gather_ee_queries,
    gather_vf_queries,
)
from scalable_ccd_tpu.ops.pallas_solver import (
    PALLAS_SOLVER_BLOCK,
    pallas_find_roots,
)


def _queries(scene, is_vf):
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
    if is_vf:
        pairs = brute_force_overlaps(vb, build_face_boxes(vb, scene.faces))
        q = gather_vf_queries(v0, v1, scene.faces, jnp.asarray(pairs), dtype=jnp.float32)
    else:
        pairs = brute_force_overlaps(build_edge_boxes(vb, scene.edges))
        q = gather_ee_queries(v0, v1, scene.edges, jnp.asarray(pairs), dtype=jnp.float32)
    return q


@pytest.mark.parametrize("is_vf", [True, False])
def test_kernel_matches_xla_solver(is_vf):
    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, is_vf)
    assert q.n > 0
    valid = jnp.ones((q.n,), bool)
    ref = find_roots_bfs(
        q, valid, is_vf, toi_init=jnp.float32(1.0), ms=jnp.float32(0.0),
        tolerance=jnp.float32(1e-6), max_iterations=-1,
    )
    toi, ovf, checks = pallas_find_roots(
        q, valid, is_vf, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    assert float(toi) == pytest.approx(float(ref.toi), abs=1e-7)
    assert int(checks) > 0


def test_kernel_multi_block_and_padding():
    """More queries than one 1024-lane block: cross-block TOI threading via
    the persistent scratch must hold, and pad lanes must stay inert."""
    scene = cloth_on_sphere(grid_n=16, sphere_subdiv=2, drop=0.35)
    q = _queries(scene, True)
    reps = -(-2 * PALLAS_SOLVER_BLOCK // q.n) + 1
    qb = type(q)(*[jnp.concatenate([f] * reps) for f in q])
    assert qb.n > PALLAS_SOLVER_BLOCK
    valid = jnp.ones((qb.n,), bool)
    ref = find_roots_bfs(
        qb, valid, True, toi_init=jnp.float32(1.0), ms=jnp.float32(0.0),
        tolerance=jnp.float32(1e-6), max_iterations=-1,
    )
    toi, _, _ = pallas_find_roots(
        qb, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    assert float(toi) == pytest.approx(float(ref.toi), abs=1e-7)


def test_kernel_respects_toi_init_and_valid_mask():
    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, True)
    valid = jnp.ones((q.n,), bool)
    toi_full, _, _ = pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    # a tighter initial bound is returned unchanged when it prunes all hits
    tight = float(toi_full) * 0.5
    toi_t, _, _ = pallas_find_roots(
        q, valid, True, jnp.float32(tight), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    assert float(toi_t) == pytest.approx(tight, rel=1e-6)
    # masking out every query returns the initial bound
    toi_m, _, checks = pallas_find_roots(
        q, jnp.zeros((q.n,), bool), True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    assert float(toi_m) == 1.0
    assert int(checks) == 0


def test_kernel_no_contact_scene():
    soup = triangle_soup(n_triangles=4, motion=0.05, seed=3)
    v0 = jnp.asarray(soup.vertices_t0, jnp.float32)
    v1 = jnp.asarray(soup.vertices_t1, jnp.float32)
    vb = build_vertex_boxes(v0, v1, dtype=jnp.float32)
    pairs = brute_force_overlaps(vb, build_face_boxes(vb, soup.faces))
    if len(pairs) == 0:
        pairs = np.zeros((1, 2), np.int32)
        q = gather_vf_queries(v0, v1, soup.faces, jnp.asarray(pairs), dtype=jnp.float32)
        valid = jnp.zeros((1,), bool)
    else:
        q = gather_vf_queries(v0, v1, soup.faces, jnp.asarray(pairs), dtype=jnp.float32)
        valid = jnp.ones((q.n,), bool)
    toi, _, _ = pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    ref = find_roots_bfs(
        q, valid, True, toi_init=jnp.float32(1.0), ms=jnp.float32(0.0),
        tolerance=jnp.float32(1e-6), max_iterations=-1,
    )
    assert float(toi) == pytest.approx(float(ref.toi), abs=1e-7)


def test_kernel_min_separation():
    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, True)
    valid = jnp.ones((q.n,), bool)
    ref = find_roots_bfs(
        q, valid, True, toi_init=jnp.float32(1.0), ms=jnp.float32(0.02),
        tolerance=jnp.float32(1e-6), max_iterations=-1,
    )
    toi, _, _ = pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.02),
        jnp.float32(1e-6), interpret=True,
    )
    assert float(toi) == pytest.approx(float(ref.toi), abs=1e-7)


@pytest.mark.parametrize("is_vf", [True, False])
def test_kernel_per_query_mode_matches_bfs(is_vf):
    """TOI_PER_QUERY on the kernel: exact per-pair TOIs, order-independent
    (each lane prunes only against its own TOI, root_finder.cu:297), must
    equal the XLA queue solver's exact mode."""
    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, is_vf)
    valid = jnp.ones((q.n,), bool)
    ref = find_roots_bfs(
        q, valid, is_vf, toi_init=jnp.float32(1.0), ms=jnp.float32(0.0),
        tolerance=jnp.float32(1e-6), max_iterations=-1, toi_per_query=True,
    )
    toi, ovf, checks, pq = pallas_find_roots(
        q, valid, is_vf, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True, toi_per_query=True,
    )
    ref_pq = np.asarray(ref.per_query_toi)
    got_pq = np.asarray(pq)
    assert got_pq.shape == ref_pq.shape
    np.testing.assert_allclose(got_pq, ref_pq, rtol=0, atol=1e-7)
    assert float(toi) == pytest.approx(float(ref.toi), abs=1e-7)
    # global TOI is the min over per-query TOIs (test_narrow_phase.cu:59-63)
    assert float(toi) == pytest.approx(
        min(1.0, float(got_pq.min())), abs=1e-7
    )


def test_kernel_bounded_iterations_matches_dfs():
    """max_iterations on the kernel (per-lane check counters) must match
    the XLA per-query DFS twin exactly: same exploration order, same
    pre-increment drop rule (root_finder.cu:289,303-305)."""
    from scalable_ccd_tpu.narrow_phase import find_roots

    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, True)
    valid = jnp.ones((q.n,), bool)
    for cap in (10, 100):
        ref = find_roots(
            q, valid, True, toi_init=jnp.float32(1.0), ms=jnp.float32(0.0),
            tolerance=jnp.float32(1e-6), max_iterations=cap,
            toi_per_query=True, stack_capacity=96,
        )
        toi, _, _, pq = pallas_find_roots(
            q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
            jnp.float32(1e-6), interpret=True, toi_per_query=True,
            max_iterations=cap,
        )
        np.testing.assert_allclose(
            np.asarray(pq), np.asarray(ref.per_query_toi), rtol=0, atol=1e-7
        )


def test_fused_collisions_pallas_matches_bfs():
    """fused_ccd(collisions=...) on the kernel path (per-query mode) must
    produce the same hit set and TOIs as the XLA solver."""
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    scene = cloth_on_sphere(grid_n=10, sphere_subdiv=1, drop=0.6)
    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    kw = dict(vf_budget=1 << 14, ee_budget=1 << 14, dtype=jnp.float32)
    hits_bfs, hits_pal = [], []
    r_bfs = fused_ccd(*args, solver="bfs", collisions=hits_bfs, **kw)
    r_pal = fused_ccd(*args, solver="pallas", collisions=hits_pal, **kw)
    assert len(hits_bfs) > 0
    mb = {(a, b): t for a, b, t in hits_bfs}
    mp = {(a, b): t for a, b, t in hits_pal}
    assert set(mb) == set(mp)
    for k in mb:
        assert mp[k] == pytest.approx(mb[k], abs=1e-7)
    assert float(r_pal.toi) == pytest.approx(float(r_bfs.toi), abs=1e-7)


def test_kernel_depth_overflow_flags_and_stays_conservative(monkeypatch):
    """A forced-tiny DFS stack must raise the conservative-accept flag and
    report a TOI no LATER than the exact solve (the overflow contract:
    report an earlier time, never drop a contact — the functional analogue
    of the reference's overflow re-run, ``narrow_phase.cu:146-195``)."""
    import scalable_ccd_tpu.ops.pallas_solver as ps

    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, True)
    valid = jnp.ones((q.n,), bool)
    ref = find_roots_bfs(
        q, valid, True, toi_init=jnp.float32(1.0), ms=jnp.float32(0.0),
        tolerance=jnp.float32(1e-6), max_iterations=-1,
    )
    # at full depth the flag must NOT fire on this scene
    toi_full, capped_full, _ = pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    assert not bool(capped_full)

    monkeypatch.setattr(ps, "_DEPTH", 6)
    ps.pallas_find_roots.clear_cache()
    try:
        toi, capped, _ = ps.pallas_find_roots(
            q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
            jnp.float32(1e-6), interpret=True,
        )
        assert bool(capped)
        assert float(toi) <= float(ref.toi) + 1e-7
    finally:
        # drop traces compiled against the tiny depth
        ps.pallas_find_roots.clear_cache()


def test_kernel_dim_cap_flags_and_stays_conservative(monkeypatch):
    """A forced-tiny per-dim split cap (the dyadic-exactness guard of the
    value-free stack: past ``_DIM_CAP`` splits in one dim the unwind
    reconstruction ``2*hi - lo`` could round) must conservative-accept with
    the flag raised, exactly like stack overflow."""
    import scalable_ccd_tpu.ops.pallas_solver as ps

    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, True)
    valid = jnp.ones((q.n,), bool)
    ref = find_roots_bfs(
        q, valid, True, toi_init=jnp.float32(1.0), ms=jnp.float32(0.0),
        tolerance=jnp.float32(1e-6), max_iterations=-1,
    )
    monkeypatch.setattr(ps, "_DIM_CAP", 2)
    ps.pallas_find_roots.clear_cache()
    try:
        toi, capped, _ = ps.pallas_find_roots(
            q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
            jnp.float32(1e-6), interpret=True,
        )
        assert bool(capped)
        assert float(toi) <= float(ref.toi) + 1e-7
    finally:
        ps.pallas_find_roots.clear_cache()


def test_fused_pipeline_pallas_solver_matches_bfs():
    scene = cloth_on_sphere(grid_n=10, sphere_subdiv=1, drop=0.6)
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    kw = dict(vf_budget=1 << 14, ee_budget=1 << 14, dtype=jnp.float32)
    r_bfs = fused_ccd(*args, solver="bfs", **kw)
    r_pal = fused_ccd(*args, solver="pallas", **kw)
    assert float(r_pal.toi) == pytest.approx(float(r_bfs.toi), abs=1e-6)
    assert not bool(r_pal.solver_capped)
    assert not bool(r_bfs.solver_capped)


@pytest.mark.parametrize("is_vf", [True, False])
@pytest.mark.parametrize("round_limit", [0, 1, 7])
def test_kernel_staged_escalation_exact(is_vf, round_limit):
    """round_limit pools stragglers into a second pass; the global TOI is
    bitwise-identical to the unbounded single pass (pruning can only drop
    domains with min_t >= the final TOI, and pass 2 re-solves every
    unfinished lane from scratch).

    The parametrization covers the count-proportional second-stage pool
    branches: EE at round_limit=0 leaves 1160 unfinished (> one solver
    block — multi-block pooled pass), VF at round_limit=0 leaves 372
    (single block's worth), and round_limit=7 retires most lanes
    (skip / small).  The count > K full-sorted fallback is exercised by
    ``test_kernel_escalation_full_fallback`` below."""
    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, is_vf)
    if round_limit == 0 and not is_vf:
        # keep the full-fallback branch covered: EE query count must
        # exceed one solver block
        assert q.n > 1024
    valid = jnp.ones((q.n,), bool)
    toi_ref, ovf_ref, checks_ref = pallas_find_roots(
        q, valid, is_vf, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    toi, ovf, checks = pallas_find_roots(
        q, valid, is_vf, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True, round_limit=round_limit,
    )
    assert not bool(ovf_ref) and not bool(ovf)
    assert float(toi) == float(toi_ref)
    assert int(checks) > 0


@pytest.mark.parametrize("ladder", [(0, 4), (1, 7, 30)])
def test_kernel_escalation_ladder_exact(ladder):
    """A multi-stage ladder (tuple ``round_limit``) pools each stage's
    stragglers and re-solves them at the next limit, final stage
    unbounded; absent overflow conservative-accepts the TOI stays
    bitwise-identical to the unbounded single pass (each stage prunes
    against the previous stage's TOI, which can only drop domains with
    ``min_t >=`` the final answer)."""
    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, True)
    valid = jnp.ones((q.n,), bool)
    toi_ref, ovf_ref, _ = pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    toi, ovf, checks = pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True, round_limit=ladder,
    )
    assert not bool(ovf_ref) and not bool(ovf)
    assert float(toi) == float(toi_ref)
    assert int(checks) > 0


def test_kernel_escalation_ladder_validation():
    """Ladders must be strictly ascending and non-negative."""
    scene = cloth_on_sphere(grid_n=6, sphere_subdiv=0, drop=0.35)
    q = _queries(scene, True)
    valid = jnp.ones((q.n,), bool)
    for bad in ((4, 4), (8, 2), (-1, 4)):
        with pytest.raises(ValueError):
            pallas_find_roots(
                q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
                jnp.float32(1e-6), interpret=True, round_limit=bad,
            )


def test_kernel_escalation_full_fallback():
    """count > K (4 solver blocks) drops to the full stable-sorted second
    pass; the TOI stays bitwise-identical to the unbounded single pass.
    Tiling the EE set x4 leaves ~4640 > 4096 lanes unfinished at
    round_limit=0."""
    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, False)
    qb = type(q)(*[jnp.concatenate([f] * 4) for f in q])
    assert qb.n > 4 * PALLAS_SOLVER_BLOCK
    valid = jnp.ones((qb.n,), bool)
    toi_ref, ovf_ref, _ = pallas_find_roots(
        qb, valid, False, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    toi, ovf, checks = pallas_find_roots(
        qb, valid, False, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True, round_limit=0,
    )
    assert not bool(ovf_ref) and not bool(ovf)
    assert float(toi) == float(toi_ref)
    assert int(checks) > 0


@pytest.mark.parametrize("block_sub", [16, 32])
def test_kernel_block_sub_parity(block_sub):
    """``block_sub`` only changes the queries-per-grid-step packing (and
    the escalation pool size) — the TOI must be bitwise-identical to the
    native-vreg 8-sublane block, plain and under staged escalation.  The
    hardware default (SOLVER_BLOCK_SUB=16, tools/hw_solver_block.py) is
    applied by the pipelines on TPU only; this pins its semantics in
    interpret mode."""
    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    q = _queries(scene, True)
    valid = jnp.ones((q.n,), bool)
    toi_ref, _, checks_ref = pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True,
    )
    toi, _, _ = pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True, block_sub=block_sub,
    )
    assert float(toi) == float(toi_ref)
    toi_esc, ovf_esc, _ = pallas_find_roots(
        q, valid, True, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1e-6), interpret=True, block_sub=block_sub,
        round_limit=1,
    )
    assert float(toi_esc) == float(toi_ref)
    assert not bool(ovf_esc)


def test_fused_pipeline_escalation_matches_plain():
    scene = cloth_on_sphere(grid_n=10, sphere_subdiv=1, drop=0.6)
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    kw = dict(vf_budget=1 << 14, ee_budget=1 << 14, dtype=jnp.float32,
              solver="pallas")
    r_plain = fused_ccd(*args, **kw)
    r_esc = fused_ccd(*args, escalate_rounds=16, **kw)
    assert float(r_esc.toi) == float(r_plain.toi)
    assert bool(r_esc.solver_capped) == bool(r_plain.solver_capped)
    r_lad = fused_ccd(*args, escalate_rounds=(4, 16), **kw)
    assert float(r_lad.toi) == float(r_plain.toi)
    assert bool(r_lad.solver_capped) == bool(r_plain.solver_capped)


@pytest.mark.parametrize("rl", [4, 0])
def test_fused_frame_pool_matches_plain(rl):
    """escalate_pool="frame": every narrow batch runs ONE bounded pass
    and pools its mid-search lanes' packed rows into a frame-wide buffer
    solved densely after the loop.  Absent overflow conservative-accepts
    the TOI must equal the plain unbounded loop's (same pruning argument
    as the per-batch ladder).  rl=0 forces > one solver block of
    stragglers per batch on the EE phase — the immediate-solve fallback
    branch; rl=4 exercises the pooled append + pass-B path."""
    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    kw = dict(vf_budget=1 << 14, ee_budget=1 << 14, dtype=jnp.float32,
              solver="pallas", narrow_batch=1 << 11)
    r_plain = fused_ccd(*args, escalate_rounds=-1, **kw)
    r_frame = fused_ccd(*args, escalate_rounds=rl,
                        escalate_pool="frame", **kw)
    assert float(r_frame.toi) == float(r_plain.toi)
    assert bool(r_frame.solver_capped) == bool(r_plain.solver_capped)
    assert int(r_frame.total_checks) > 0


def test_auto_escalation_policy():
    """The auto policy (VERDICT r3 item 3) enables staged escalation on
    the Pallas solver's exact global path — so the ``_MAX_ROUNDS``
    stale-pending-min accept is unreachable by policy — and stays off
    for the XLA solvers and bounded modes, where it has no effect or
    would change per-lane semantics."""
    from scalable_ccd_tpu.pipeline.fused import (
        _AUTO_ESCALATE_ROUNDS,
        _resolve_auto_escalation,
    )

    # auto (None from the fused wrapper, -2 from CCDConfig)
    for auto in (None, -2):
        assert _resolve_auto_escalation(
            auto, "pallas", -1) == _AUTO_ESCALATE_ROUNDS
        assert _resolve_auto_escalation(auto, "bfs", -1) == -1
        assert _resolve_auto_escalation(auto, "dfs", -1) == -1
        assert _resolve_auto_escalation(auto, "pallas", 100) == -1
    # explicit values pass through untouched
    assert _resolve_auto_escalation(-1, "pallas", -1) == -1
    assert _resolve_auto_escalation(64, "pallas", -1) == 64
    # the auto constant must cover the hardware-measured lane-depth tail
    # (99.97% of bench-scale lanes finish within 256 rounds, PERF.md)
    assert _AUTO_ESCALATE_ROUNDS >= 128
