"""Sort-based compaction and merge-based searchsorted.

See the package docstring for why scatters are avoided on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["compact_rows", "searchsorted_sorted"]


def compact_rows(keep: jax.Array, *values: jax.Array):
    """Stable-compact ``values`` rows where ``keep`` is True to the front.

    ``keep``: (n,) bool.  Each value is (n,) or (n, k).  Returns
    ``(count, *compacted)`` where the first ``count`` rows of each compacted
    array are the kept rows in their original order; the rest are the
    not-kept rows (callers mask by ``count``).

    One multi-operand stable sort — the TPU-native equivalent of a
    ``cumsum`` + scatter compaction (which XLA lowers to a serial
    per-row loop on TPU).
    """
    key = (~keep).astype(jnp.int32)
    flat = []
    shapes = []
    for v in values:
        if v.ndim == 1:
            flat.append(v)
            shapes.append(None)
        else:
            shapes.append(v.shape[1])
            for c in range(v.shape[1]):
                flat.append(v[:, c])
    out = jax.lax.sort((key, *flat), num_keys=1, is_stable=True)[1:]
    count = jnp.sum(keep, dtype=jnp.int32)
    result = []
    i = 0
    for s in shapes:
        if s is None:
            result.append(out[i])
            i += 1
        else:
            result.append(jnp.stack(out[i : i + s], axis=1))
            i += s
    return (count, *result)


def searchsorted_sorted(
    arr: jax.Array, queries: jax.Array, side: str = "right"
) -> jax.Array:
    """``jnp.searchsorted`` where **both** inputs are ascending.

    Returns, per query, the number of ``arr`` elements < (``side='left'``)
    or <= (``side='right'``) the query — via one merge realized as two
    stable sorts, instead of ``method='sort'``'s sort + unsorting scatter
    (the scatter is the slow part on TPU).
    """
    n = arr.shape[0]
    b = queries.shape[0]
    keys = jnp.concatenate([arr, queries])
    # tie-break: side='right' counts equal arr elements, so arr rows must
    # sort before equal query rows; side='left' the reverse.
    if side == "right":
        tag = jnp.concatenate(
            [jnp.zeros((n,), jnp.int32), jnp.ones((b,), jnp.int32)]
        )
    else:
        tag = jnp.concatenate(
            [jnp.ones((n,), jnp.int32), jnp.zeros((b,), jnp.int32)]
        )
    sk, st = jax.lax.sort((keys, tag), num_keys=2, is_stable=True)
    is_query = st == (1 if side == "right" else 0)
    # arr elements seen at or before each merged position
    n_arr = jnp.cumsum((~is_query).astype(jnp.int32))
    # compact the query rows (in order) to the front and take their counts
    _, rr = jax.lax.sort(
        ((~is_query).astype(jnp.int32), n_arr), num_keys=1, is_stable=True
    )
    return rr[:b]
