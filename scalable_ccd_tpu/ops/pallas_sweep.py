"""Pallas TPU kernel for the shift-block sweep filter.

Fuses one (window x box-tile) sweep-filter step — the body of
:func:`scalable_ccd_tpu.broad_phase.sweep.shifted_pair_filters` — into a
single Mosaic kernel: the box tile and its shifted partner window are DMA'd
from HBM to VMEM once, and all ``window`` shift comparisons run as
register-level vector ops.  The XLA formulation of the same step lowers to
~200 separate slice/compare HLOs whose fixed overheads dominate the sweep
(~0.2-0.4 ms per step, PERF.md); the kernel's cost is two contiguous DMAs
plus pure VPU work.

Mosaic requires HBM DMA slices to keep the 128-lane minor dimension whole,
so the per-box data (minor bounds, vertex ids, element id, run length) is
packed once per phase into a single ``(n_padded, 128)`` float32 array
(:func:`pack_boxes_for_pallas`; integer columns bitcast) and rows are
fetched full-width at arbitrary offsets.

Semantics are bit-identical to the XLA path (asserted by
``tests/test_pallas_sweep.py`` in interpret mode and on hardware): pairs
(i, i+s) for i in [box_start, box_start+box_tile), s in
[shift0+1, shift0+1+window), filtered by run length, minor-axis overlap,
two-list validity, and the covertex test, emitted in the reference's
convention (``cuda/broad_phase/sweep.cu:152-164``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_boxes_for_pallas", "pallas_shifted_pair_filters"]

_SENTINEL = -(2**31) + 1
_LANES = 128


def pack_boxes_for_pallas(boxes, k_padded):
    """Pack padded box arrays into (n_padded, 128) f32 + i32 row matrices.

    f32 columns: 0-1 minor_min, 2-3 minor_max.  i32 columns: 0-2
    vertex_ids, 3 element_id, 4 run length k.  Rest zero.  ``boxes`` is a
    :class:`~scalable_ccd_tpu.broad_phase.sweep.PaddedBoxes`.
    """
    f = jnp.float32
    n = boxes.minor_min.shape[0]
    pf = jnp.concatenate(
        [boxes.minor_min.astype(f), boxes.minor_max.astype(f),
         jnp.zeros((n, _LANES - 4), f)], axis=1)
    pi = jnp.concatenate(
        [boxes.vertex_ids, boxes.element_id[:, None],
         k_padded.astype(jnp.int32)[:, None],
         jnp.zeros((n, _LANES - 5), jnp.int32)], axis=1)
    return pf, pi


def _kernel(scal_ref, packed_f, packed_i, out_first, out_second, out_keep,
            af_buf, ai_buf, bf_buf, bi_buf, sems,
            *, box_tile: int, is_two_lists: bool):
    # grid=(window,): one shift per sequential grid step.  The a-side tile
    # is DMA'd once (scratch persists across steps); the b-side tile is
    # re-fetched per shift at its exact row offset, so no sublane-
    # misaligned VMEM slices are ever materialized (a W-unrolled in-kernel
    # loop ran the compiler out of scoped VMEM: each misaligned slice
    # copies the whole tile).
    B = box_tile
    w = pl.program_id(0)
    bs = scal_ref[0]
    s0 = scal_ref[1]
    blim = scal_ref[2]

    @pl.when(w == 0)
    def _():
        cpa = pltpu.make_async_copy(packed_f.at[pl.ds(bs, B)], af_buf, sems.at[0])
        cpb = pltpu.make_async_copy(packed_i.at[pl.ds(bs, B)], ai_buf, sems.at[1])
        cpa.start()
        cpb.start()
        cpa.wait()
        cpb.wait()

    cp_f = pltpu.make_async_copy(
        packed_f.at[pl.ds(bs + s0 + 1 + w, B)], bf_buf, sems.at[2]
    )
    cp_i = pltpu.make_async_copy(
        packed_i.at[pl.ds(bs + s0 + 1 + w, B)], bi_buf, sems.at[3]
    )
    cp_f.start()
    cp_i.start()
    cp_f.wait()
    cp_i.wait()

    i32 = jnp.int32
    af = af_buf[:]
    ai = ai_buf[:]
    am_lo = af[:, 0:2]
    am_hi = af[:, 2:4]
    av = ai[:, 0:3]
    ae = ai[:, 3]
    ak = ai[:, 4]
    lane = jax.lax.broadcasted_iota(i32, (B, 1), 0)[:, 0]
    in_range = (bs + lane) < blim

    bf = bf_buf[:]
    bi = bi_buf[:]
    bm_lo = bf[:, 0:2]
    bm_hi = bf[:, 2:4]
    bv = bi[:, 0:3]
    be = bi[:, 3]

    minor_ok = jnp.all((am_lo <= bm_hi) & (bm_lo <= am_hi), axis=-1)
    share = jnp.zeros((B,), jnp.bool_)
    for ca in range(3):
        for cb in range(3):
            share = share | (av[:, ca] == bv[:, cb])
    valid = in_range & ((s0 + 1 + w) <= ak)
    if is_two_lists:
        pair_ok = (ae >= 0) != (be >= 0)
    else:
        pair_ok = jnp.ones((B,), jnp.bool_)
    keep = valid & minor_ok & pair_ok & (~share)

    lo = jnp.minimum(ae, be)
    hi = jnp.maximum(ae, be)
    first = (-lo - 1) if is_two_lists else lo
    out_first[w, :] = jnp.where(keep, first, i32(_SENTINEL))
    out_second[w, :] = jnp.where(keep, hi, i32(_SENTINEL))
    out_keep[w, :] = keep.astype(i32)


@functools.partial(
    jax.jit,
    static_argnames=("box_tile", "window", "is_two_lists", "interpret"),
)
def pallas_shifted_pair_filters(
    packed_f,
    packed_i,
    box_start,
    shift0,
    box_limit,
    box_tile: int,
    window: int,
    is_two_lists: bool,
    interpret: bool = False,
):
    """One fused sweep-filter step; drop-in for ``shifted_pair_filters``.

    ``packed_f``/``packed_i`` are :func:`pack_boxes_for_pallas` of the
    zero-padded box arrays (``pad_boxes_for_shifts`` with the same window/box_tile and
    ``shift_cap >= shift0``).  Returns ``(first, second, keep)`` flattened
    to ``window * box_tile`` rows, shift-major.
    """
    B, W = box_tile, window
    scal = jnp.stack(
        [jnp.asarray(box_start, jnp.int32), jnp.asarray(shift0, jnp.int32),
         jnp.asarray(box_limit, jnp.int32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((B, _LANES), jnp.float32),
            pltpu.VMEM((B, _LANES), jnp.int32),
            pltpu.VMEM((B, _LANES), jnp.float32),
            pltpu.VMEM((B, _LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    first, second, keep = pl.pallas_call(
        functools.partial(
            _kernel, box_tile=B, is_two_lists=is_two_lists
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((W, B), jnp.int32),
            jax.ShapeDtypeStruct((W, B), jnp.int32),
            jax.ShapeDtypeStruct((W, B), jnp.int32),
        ),
        interpret=interpret,
    )(scal, packed_f, packed_i)
    return first.reshape(-1), second.reshape(-1), keep.reshape(-1) != 0
