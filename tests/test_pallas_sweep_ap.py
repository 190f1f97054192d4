"""All-pairs sweep kernel vs the XLA sweep (interpret mode).

``ops/pallas_sweep_ap.py`` is the TPU hardware broad phase; on CPU it runs
in Pallas interpret mode, pinned here against ``detect_overlaps`` (itself
proven equal to the brute-force oracle) for exact pair-set equality.
Hardware execution is exercised by ``bench.py`` / the fused pipeline on
TPU (exact pair-set parity verified on a v5e chip up to 1.17M pairs).

Interpret mode emulates the per-partner scalar stream, so scenes here are
small.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.broad_phase import detect_overlaps, merge_two_lists, sort_boxes
from scalable_ccd_tpu.geometry.aabb import (
    build_edge_boxes,
    build_face_boxes,
    build_vertex_boxes,
)
from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere, triangle_soup
from scalable_ccd_tpu.ops.pallas_sweep_ap import pack_boxes_ap, pallas_sweep_pairs


def _boxes(scene):
    vb = build_vertex_boxes(scene.vertices_t0, scene.vertices_t1, dtype=jnp.float32)
    return vb, build_edge_boxes(vb, scene.edges), build_face_boxes(vb, scene.faces)


def _pairs_set(pairs, n):
    return set(map(tuple, np.asarray(pairs[: int(n)]).tolist()))


@pytest.mark.parametrize("is_two_lists", [True, False])
def test_kernel_matches_xla_sweep(is_two_lists):
    scene = cloth_on_sphere(grid_n=14, sphere_subdiv=1, drop=0.35)
    vb, eb, fb = _boxes(scene)
    sb = sort_boxes(merge_two_lists(vb, fb)) if is_two_lists else sort_boxes(eb)
    ref = set(map(tuple, detect_overlaps(sb, is_two_lists=is_two_lists).tolist()))
    packed, n = pack_boxes_ap(sb)
    pairs, np_, nt_, ovf = pallas_sweep_pairs(
        packed, n, is_two_lists, budget=1 << 15, interpret=True
    )
    assert not bool(ovf)
    assert _pairs_set(pairs, np_) == ref


def test_kernel_budget_overflow_flags():
    """A too-small budget must raise the flag, never silently drop."""
    scene = triangle_soup(80, motion=0.25, seed=4)
    _, eb, _ = _boxes(scene)
    sb = sort_boxes(eb)
    ref = detect_overlaps(sb, is_two_lists=False)
    assert len(ref) > 64
    packed, n = pack_boxes_ap(sb)
    pairs, np_, nt_, ovf = pallas_sweep_pairs(
        packed, n, False, budget=64, interpret=True
    )
    assert bool(ovf)
    # the written count clamps at the budget, but the TRUE total stays
    # exact (the auto-budget retry sizes its second dispatch from it)
    assert int(np_) <= 64
    assert int(nt_) == len(ref)

    # a sufficient budget on the same packing is exact
    pairs, np_, nt_, ovf = pallas_sweep_pairs(
        packed, n, False, budget=1 << 15, interpret=True
    )
    assert not bool(ovf)
    assert _pairs_set(pairs, np_) == set(map(tuple, ref.tolist()))


@pytest.mark.parametrize("is_two_lists", [True, False])
def test_extent_classed_packing_matches(is_two_lists):
    """Force the extent-class partition (normally gated to >= 2^19 boxes)
    on a scene mixing a few giant boxes into fine geometry and assert exact
    pair-set parity: covers the permuted a-side + sorted partner-stream
    path (the ``order is not None`` branch of ``pack_boxes_ap`` with its
    ``_POS`` plane / ``j0`` rounding / ``a_pos < jabs`` indexing)."""
    from scalable_ccd_tpu.geometry.aabb import AABBs

    rng = np.random.default_rng(7)
    n_small, n_long = 300, 6
    centers = rng.uniform(0.0, 10.0, (n_small, 3)).astype(np.float32)
    half = rng.uniform(0.05, 0.3, (n_small, 3)).astype(np.float32)
    # a few boxes spanning nearly the whole major axis — the long class
    lc = rng.uniform(0.0, 10.0, (n_long, 2)).astype(np.float32)
    lmin = np.stack([np.full(n_long, 0.5, np.float32), lc[:, 0] - 0.2, lc[:, 1] - 0.2], 1)
    lmax = np.stack([np.full(n_long, 9.5, np.float32), lc[:, 0] + 0.2, lc[:, 1] + 0.2], 1)
    mn = np.concatenate([centers - half, lmin])
    mx = np.concatenate([centers + half, lmax])
    n = n_small + n_long
    ids = np.arange(n, dtype=np.int32)
    vids = np.stack([2 * ids, 2 * ids + 1, -2 * ids - 1], axis=1)
    if is_two_lists:
        # alternate boxes into lists A (negative-tagged) and B
        eid = np.where(ids % 2 == 0, -(ids // 2) - 1, ids // 2).astype(np.int32)
    else:
        eid = ids
    boxes = AABBs(
        min=jnp.asarray(mn), max=jnp.asarray(mx),
        vertex_ids=jnp.asarray(vids), element_id=jnp.asarray(eid),
    )
    sb = sort_boxes(boxes)
    ref = detect_overlaps(sb, is_two_lists=is_two_lists)
    assert len(ref) > 0

    packed, nn = pack_boxes_ap(sb, classify_min_boxes=1)
    bf, bi, wf, wi = packed
    assert wf is not bf, "classification did not activate"
    pairs, np_, nt_, ovf = pallas_sweep_pairs(
        packed, nn, is_two_lists, budget=1 << 15, interpret=True
    )
    assert not bool(ovf)
    assert _pairs_set(pairs, np_) == set(map(tuple, ref.tolist()))

    # and the unclassified packing agrees on the same scene
    packed_u, nn_u = pack_boxes_ap(sb)
    assert packed_u[2] is packed_u[0]
    pairs_u, np_u, nt_u, ovf_u = pallas_sweep_pairs(
        packed_u, nn_u, is_two_lists, budget=1 << 15, interpret=True
    )
    assert not bool(ovf_u)
    assert _pairs_set(pairs_u, np_u) == _pairs_set(pairs, np_)

    # the multi-operand-sort reorder path must produce bit-identical
    # planes to the gather path (stable partition over the same 1-bit key)
    from scalable_ccd_tpu.broad_phase import sweep as _sweep

    old = _sweep.PACK_REORDER_IMPL
    try:
        _sweep.PACK_REORDER_IMPL = "sort"
        packed_s, nn_s = pack_boxes_ap(sb, classify_min_boxes=1)
    finally:
        _sweep.PACK_REORDER_IMPL = old
    assert nn_s == nn
    for pa, pb in zip(packed, packed_s):
        assert np.array_equal(
            np.asarray(pa).view(np.int32), np.asarray(pb).view(np.int32)
        )


@pytest.mark.parametrize("layout", ["dense", "sparse", "mxu", "mxu16"])
@pytest.mark.parametrize("is_two_lists", [True, False])
def test_records_kernel_matches_xla_sweep(is_two_lists, layout):
    """Bit-record emission (both layouts): the (partner, a-row) mask
    records, decoded in batches through the monotone-cursor decoder, must
    reproduce the exact pair set of the XLA sweep."""
    from scalable_ccd_tpu.ops.pallas_sweep_ap import (
        decode_records_range,
        pallas_sweep_records,
        records_pair_prefix,
    )

    scene = cloth_on_sphere(grid_n=14, sphere_subdiv=1, drop=0.35)
    vb, eb, fb = _boxes(scene)
    sb = sort_boxes(merge_two_lists(vb, fb)) if is_two_lists else sort_boxes(eb)
    ref = set(map(tuple, detect_overlaps(sb, is_two_lists=is_two_lists).tolist()))
    packed, n = pack_boxes_ap(sb)
    recs, n_recs, n_pairs, ovf = pallas_sweep_records(
        packed, n, is_two_lists, pair_budget=1 << 15, interpret=True,
        layout=layout,
    )
    assert not bool(ovf)
    assert int(n_pairs) == len(ref)
    assert 0 < int(n_recs) <= int(n_pairs)

    cum = records_pair_prefix(recs, n_recs)
    got = []
    r_lo = jnp.int32(0)
    B = 512
    for start in range(0, int(n_pairs), B):
        chunk, r_lo = decode_records_range(
            packed, recs, cum, jnp.int32(start), B, n_pairs, r_lo,
            is_two_lists,
        )
        m = min(B, int(n_pairs) - start)
        got.extend(map(tuple, np.asarray(chunk[:m]).tolist()))
    assert len(got) == len(ref)
    assert set(got) == ref


@pytest.mark.parametrize("layout", ["dense", "sparse", "mxu", "mxu16"])
def test_records_budget_overflow_flags(layout):
    from scalable_ccd_tpu.ops.pallas_sweep_ap import pallas_sweep_records

    scene = triangle_soup(80, motion=0.25, seed=4)
    _, eb, _ = _boxes(scene)
    sb = sort_boxes(eb)
    ref = detect_overlaps(sb, is_two_lists=False)
    assert len(ref) > 64
    packed, n = pack_boxes_ap(sb)
    _, _, _, ovf = pallas_sweep_records(
        packed, n, False, pair_budget=64, interpret=True, layout=layout
    )
    assert bool(ovf)
    _, _, np_, ovf = pallas_sweep_records(
        packed, n, False, pair_budget=1 << 15, interpret=True, layout=layout
    )
    assert not bool(ovf)
    assert int(np_) == len(ref)


def test_fused_pipeline_records_sweep_matches_xla():
    scene = cloth_on_sphere(grid_n=8, sphere_subdiv=0, drop=0.6)
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    kw = dict(vf_budget=1 << 12, ee_budget=1 << 12, dtype=jnp.float32)
    r_xla = fused_ccd(*args, sweep_impl="xla", **kw)
    for impl in ("pallas_rec", "pallas_sparse", "pallas_mxu", "pallas_mxu16"):
        r_rec = fused_ccd(*args, sweep_impl=impl, **kw)
        assert float(r_rec.toi) == pytest.approx(float(r_xla.toi), abs=1e-6)
        assert int(r_rec.vf_total) == int(r_xla.vf_total)
        assert int(r_rec.ee_total) == int(r_xla.ee_total)

    # per-pair collisions through the records path (decoded-pairs buffer)
    hits_xla, hits_rec = [], []
    fused_ccd(*args, sweep_impl="xla", collisions=hits_xla, **kw)
    fused_ccd(*args, sweep_impl="pallas_sparse", collisions=hits_rec, **kw)
    assert sorted(hits_rec) == sorted(hits_xla)


@pytest.mark.parametrize("is_two_lists", [True, False])
def test_bucket_minor_ordering_matches(is_two_lists):
    """Congestion ordering: ``sort_boxes(bucket_minor=True)`` reorders the
    boxes by (major bucket, minor lower bound), which breaks the exact
    major sort the XLA sweep needs — but the kernel's suffix-min
    termination plane must keep the enumerated pair set EXACTLY equal to
    the plain-sort reference, with the row minor-union skip active."""
    scene = cloth_on_sphere(grid_n=14, sphere_subdiv=1, drop=0.35)
    vb, eb, fb = _boxes(scene)
    merged = merge_two_lists(vb, fb) if is_two_lists else eb
    ref = set(
        map(
            tuple,
            detect_overlaps(sort_boxes(merged), is_two_lists=is_two_lists).tolist(),
        )
    )
    sb = sort_boxes(merged, bucket_minor=True)
    # the ordering genuinely differs from the plain major sort
    assert not bool(
        jnp.all(sb.major_min[1:] >= sb.major_min[:-1])
    ), "bucket_minor produced an exactly-sorted order; test is vacuous"
    packed, n = pack_boxes_ap(sb)
    pairs, np_, nt_, ovf = pallas_sweep_pairs(
        packed, n, is_two_lists, budget=1 << 15, interpret=True,
        any_order=True,
    )
    assert not bool(ovf)
    assert _pairs_set(pairs, np_) == ref

    # sparse record emission under the same reordering
    from scalable_ccd_tpu.ops.pallas_sweep_ap import (
        decode_records_range,
        pallas_sweep_records,
        records_pair_prefix,
    )

    for layout in ("sparse", "mxu", "mxu16"):
        recs, n_recs, n_pairs, ovf = pallas_sweep_records(
            packed, n, is_two_lists, pair_budget=1 << 15, interpret=True,
            any_order=True, layout=layout,
        )
        assert not bool(ovf)
        assert int(n_pairs) == len(ref)
        cum = records_pair_prefix(recs, n_recs)
        got, r_lo, B = [], jnp.int32(0), 512
        for start in range(0, int(n_pairs), B):
            chunk, r_lo = decode_records_range(
                packed, recs, cum, jnp.int32(start), B, n_pairs, r_lo,
                is_two_lists,
            )
            got.extend(map(tuple, np.asarray(chunk[: min(B, int(n_pairs) - start)]).tolist()))
        assert set(got) == ref


def test_fused_pipeline_bucket_minor_matches_xla():
    scene = cloth_on_sphere(grid_n=8, sphere_subdiv=0, drop=0.6)
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    kw = dict(vf_budget=1 << 12, ee_budget=1 << 12, dtype=jnp.float32)
    r_xla = fused_ccd(*args, sweep_impl="xla", **kw)
    r_bm = fused_ccd(*args, sweep_impl="pallas_ap", bucket_minor=True, **kw)
    assert float(r_bm.toi) == pytest.approx(float(r_xla.toi), abs=1e-6)
    assert int(r_bm.vf_total) == int(r_xla.vf_total)
    assert int(r_bm.ee_total) == int(r_xla.ee_total)

    # the XLA sweep must refuse the invalid combination
    with pytest.raises(ValueError):
        fused_ccd(*args, sweep_impl="xla", bucket_minor=True, **kw)


def test_kernel_empty_scene():
    soup = triangle_soup(4, motion=0.0, seed=5)
    _, eb, _ = _boxes(soup)
    sb = sort_boxes(eb)
    packed, n = pack_boxes_ap(sb)
    pairs, np_, nt_, ovf = pallas_sweep_pairs(packed, n, False, budget=256, interpret=True)
    ref = detect_overlaps(sb, is_two_lists=False)
    assert int(np_) == len(ref)


def test_fused_pipeline_ap_sweep_matches_xla():
    scene = cloth_on_sphere(grid_n=8, sphere_subdiv=0, drop=0.6)
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    kw = dict(vf_budget=1 << 12, ee_budget=1 << 12, dtype=jnp.float32)
    r_xla = fused_ccd(*args, sweep_impl="xla", **kw)
    r_ap = fused_ccd(*args, sweep_impl="pallas_ap", **kw)
    assert float(r_ap.toi) == pytest.approx(float(r_xla.toi), abs=1e-6)
    assert int(r_ap.vf_total) == int(r_xla.vf_total)
    assert int(r_ap.ee_total) == int(r_xla.ee_total)


@pytest.mark.parametrize("layout", ["sparse", "mxu", "mxu16"])
def test_records_dense_cluster_stress(layout):
    """Every box overlapping every other: window steps carry the maximum
    record count (the mxu paths' 64/128-record placement, multi-fold nf>=2,
    and mid-step DMA paths; the sparse path's per-row loop at full
    occupancy).  Exact pair-set parity with the XLA sweep."""
    from scalable_ccd_tpu.ops.pallas_sweep_ap import (
        decode_records_range,
        pallas_sweep_records,
        records_pair_prefix,
    )

    # ~240 co-located edges (triangle centers clustered far tighter than
    # the triangle extent) -> nearly all ~28k edge pairs survive the AABB
    # filter
    rng = np.random.default_rng(9)
    nt = 80
    centers = 0.002 * rng.uniform(size=(nt, 1, 3))
    v0 = (centers + rng.normal(scale=0.05, size=(nt, 3, 3))).reshape(-1, 3)
    v1 = v0 + rng.normal(scale=0.01, size=v0.shape)
    faces = np.arange(3 * nt, dtype=np.int64).reshape(nt, 3)
    from scalable_ccd_tpu.geometry.scenes import Scene

    _, eb, _ = _boxes(Scene(v0, v1, faces))
    sb = sort_boxes(eb)
    ref = set(map(tuple, detect_overlaps(sb, is_two_lists=False).tolist()))
    assert len(ref) > 10_000  # genuinely dense
    packed, n = pack_boxes_ap(sb)
    recs, n_recs, n_pairs, ovf = pallas_sweep_records(
        packed, n, False, pair_budget=1 << 15, interpret=True,
        layout=layout,
    )
    assert not bool(ovf)
    assert int(n_pairs) == len(ref)
    cum = records_pair_prefix(recs, n_recs)
    got, r_lo, B = [], jnp.int32(0), 1 << 12
    for start in range(0, int(n_pairs), B):
        chunk, r_lo = decode_records_range(
            packed, recs, cum, jnp.int32(start), B, n_pairs, r_lo, False,
        )
        got.extend(map(tuple, np.asarray(
            chunk[: min(B, int(n_pairs) - start)]).tolist()))
    assert set(got) == ref


def test_sample_first_pairs_matches_decode():
    """The TOI warm-start sampler must return exactly record
    ``floor(i*n_r/batch)``'s first pair (the full range decode is the
    ground truth) with validity ``i < n_records``."""
    from scalable_ccd_tpu.ops.pallas_sweep_ap import (
        decode_records_range,
        pallas_sweep_records,
        records_pair_prefix,
        sample_first_pairs,
    )

    scene = cloth_on_sphere(grid_n=10, sphere_subdiv=1, drop=0.35)
    vb, eb, fb = _boxes(scene)
    sb = sort_boxes(merge_two_lists(vb, fb))
    packed, n = pack_boxes_ap(sb)
    recs, n_r, n_p, ovf = pallas_sweep_records(
        packed, n, True, pair_budget=1 << 12, interpret=True
    )
    assert not bool(ovf)
    cum = records_pair_prefix(recs, n_r)
    n_p_i, n_r_i = int(n_p), int(n_r)
    assert n_r_i > 64
    all_pairs, _ = decode_records_range(
        packed, recs, cum, jnp.int32(0), 1 << 12, n_p, jnp.int32(0), True
    )
    all_pairs = np.asarray(all_pairs)[:n_p_i]
    cum_np = np.asarray(cum)
    for batch in (64, 256, 1 << 12):
        chunk, valid = sample_first_pairs(packed, recs, cum, n_r, batch, True)
        chunk, valid = np.asarray(chunk), np.asarray(valid).astype(bool)
        assert int(valid.sum()) == min(n_r_i, batch)
        i = np.arange(batch)
        r_s = np.minimum(i * n_r_i // batch, n_r_i - 1)
        exp = all_pairs[np.where(r_s > 0, cum_np[r_s - 1], 0)]
        assert np.array_equal(chunk[valid], exp[valid])


def test_fused_presample_matches_plain():
    """The warm-start pre-batch must not change the TOI (pruning uses
    valid upper bounds; sampled pairs solve twice, min is idempotent) on
    either the dense-pairs or the record sweep path."""
    from scalable_ccd_tpu.pipeline.fused import fused_ccd

    scene = cloth_on_sphere(grid_n=12, sphere_subdiv=1, drop=0.35)
    args = (
        jnp.asarray(scene.vertices_t0, jnp.float32),
        jnp.asarray(scene.vertices_t1, jnp.float32),
        jnp.asarray(scene.edges, jnp.int32),
        jnp.asarray(scene.faces, jnp.int32),
    )
    for impl in ("xla", "pallas_mxu"):
        kw = dict(
            vf_budget=1 << 12, ee_budget=1 << 12, narrow_batch=1 << 9,
            dtype=jnp.float32, solver="bfs", sweep_impl=impl,
        )
        r_on = fused_ccd(*args, presample=True, **kw)
        r_off = fused_ccd(*args, presample=False, **kw)
        assert not bool(r_on.overflowed)
        assert float(r_on.toi) == float(r_off.toi), impl
        # check totals legitimately differ: the pre-batch adds work but
        # its warm TOI prunes later batches (on this scene the records
        # path comes out AHEAD: 28,698 vs 30,109 domain evals)
        assert int(r_on.total_checks) != int(r_off.total_checks), impl
        assert int(r_on.total_checks) > 0


def test_auto_presample_policy():
    """presample="auto" resolves by the congestion box-count threshold
    (hardware-measured crossover: the pre-batch wins at bench scale,
    costs ~2% of frame on congested million-box scenes whose cold loop
    already settles the TOI in its first batches — PERF.md round 4)."""
    from scalable_ccd_tpu.pipeline.fused import (
        _AUTO_BUCKET_MIN_BOXES,
        _resolve_auto_presample,
    )

    assert _resolve_auto_presample("auto", 1000) is True
    assert _resolve_auto_presample(None, 1000) is True
    assert _resolve_auto_presample("auto", _AUTO_BUCKET_MIN_BOXES) is False
    assert _resolve_auto_presample("auto", _AUTO_BUCKET_MIN_BOXES + 1) is False
    # explicit settings always win
    assert _resolve_auto_presample(True, 1 << 30) is True
    assert _resolve_auto_presample(False, 0) is False
