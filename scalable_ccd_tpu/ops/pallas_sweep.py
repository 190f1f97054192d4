"""Pallas TPU kernel for the shift-block sweep filter.

Fuses one (window x box-tile) sweep-filter step — the body of
:func:`scalable_ccd_tpu.broad_phase.sweep.shifted_pair_filters` — into a
single Mosaic kernel: the box tile and its shifted partner window are DMA'd
from HBM to VMEM once, and all ``window`` shift comparisons run as
register-level vector ops.  The XLA formulation of the same step lowers to
~200 separate slice/compare HLOs whose fixed overheads dominate the sweep
(~0.2-0.4 ms per step, PERF.md); the kernel's cost is two contiguous DMAs
plus pure VPU work.

Semantics are bit-identical to the XLA path (asserted by
``tests/test_pallas_sweep.py`` in interpret mode and by the fused pipeline's
exact-set tests): pairs (i, i+s) for i in [box_start, box_start+box_tile),
s in [shift0+1, shift0+1+window), filtered by run length, minor-axis
overlap, two-list validity, and the covertex test, emitted in the
reference's convention (``cuda/broad_phase/sweep.cu:152-164``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_shifted_pair_filters"]

_SENTINEL = -(2**31) + 1


def _kernel(scal_ref, mmin, mmax, vid, eid, kk,
            out_first, out_second, out_keep,
            a_mmin, a_mmax, a_vid, a_eid, a_k,
            b_mmin, b_mmax, b_vid, b_eid, sems,
            *, window: int, box_tile: int, is_two_lists: bool):
    B, W = box_tile, window
    bs = scal_ref[0]
    s0 = scal_ref[1]
    blim = scal_ref[2]

    copies = [
        pltpu.make_async_copy(mmin.at[pl.ds(bs, B)], a_mmin, sems.at[0]),
        pltpu.make_async_copy(mmax.at[pl.ds(bs, B)], a_mmax, sems.at[1]),
        pltpu.make_async_copy(vid.at[pl.ds(bs, B)], a_vid, sems.at[2]),
        pltpu.make_async_copy(eid.at[pl.ds(bs, B)], a_eid, sems.at[3]),
        pltpu.make_async_copy(kk.at[pl.ds(bs, B)], a_k, sems.at[4]),
        pltpu.make_async_copy(
            mmin.at[pl.ds(bs + s0 + 1, B + W - 1)], b_mmin, sems.at[5]
        ),
        pltpu.make_async_copy(
            mmax.at[pl.ds(bs + s0 + 1, B + W - 1)], b_mmax, sems.at[6]
        ),
        pltpu.make_async_copy(
            vid.at[pl.ds(bs + s0 + 1, B + W - 1)], b_vid, sems.at[7]
        ),
        pltpu.make_async_copy(
            eid.at[pl.ds(bs + s0 + 1, B + W - 1)], b_eid, sems.at[8]
        ),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    am_lo = a_mmin[:]  # (B, 2)
    am_hi = a_mmax[:]
    av = a_vid[:]  # (B, 3)
    ae = a_eid[:, 0]  # (B,)
    ak = a_k[:, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
    in_range = (bs + lane) < blim

    for w in range(W):
        bm_lo = b_mmin[w : w + B]
        bm_hi = b_mmax[w : w + B]
        bv = b_vid[w : w + B]
        be = b_eid[w : w + B, 0]

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
        out_first[w, :] = jnp.where(keep, first, jnp.int32(_SENTINEL))
        out_second[w, :] = jnp.where(keep, hi, jnp.int32(_SENTINEL))
        out_keep[w, :] = keep.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("box_tile", "window", "is_two_lists", "interpret"),
)
def pallas_shifted_pair_filters(
    minor_min,
    minor_max,
    vertex_ids,
    element_id,
    k_padded,
    box_start,
    shift0,
    box_limit,
    box_tile: int,
    window: int,
    is_two_lists: bool,
    interpret: bool = False,
):
    """One fused sweep-filter step; drop-in for ``shifted_pair_filters``.

    Array arguments are the zero-padded box arrays (``pad_boxes_for_shifts``
    with the same window/box_tile and ``shift_cap >= shift0``).  Returns
    ``(first, second, keep)`` flattened to ``window * box_tile`` rows,
    shift-major.
    """
    B, W = box_tile, window
    scal = jnp.stack(
        [jnp.asarray(box_start, jnp.int32), jnp.asarray(shift0, jnp.int32),
         jnp.asarray(box_limit, jnp.int32)]
    )
    dt = minor_min.dtype
    n_b = B + W - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((B, 2), dt), pltpu.VMEM((B, 2), dt),
            pltpu.VMEM((B, 3), jnp.int32), pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((n_b, 2), dt), pltpu.VMEM((n_b, 2), dt),
            pltpu.VMEM((n_b, 3), jnp.int32), pltpu.VMEM((n_b, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    first, second, keep = pl.pallas_call(
        functools.partial(
            _kernel, window=W, box_tile=B, is_two_lists=is_two_lists
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((W, B), jnp.int32),
            jax.ShapeDtypeStruct((W, B), jnp.int32),
            jax.ShapeDtypeStruct((W, B), jnp.int32),
        ),
        interpret=interpret,
    )(
        scal,
        minor_min,
        minor_max,
        vertex_ids,
        element_id.reshape(-1, 1),
        k_padded.reshape(-1, 1).astype(jnp.int32),
    )
    return first.reshape(-1), second.reshape(-1), keep.reshape(-1) != 0
