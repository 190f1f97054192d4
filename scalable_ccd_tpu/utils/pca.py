"""PCA world-rotation preconditioner for the broad phase.

Counterpart of the reference's ``nipals_pca`` (``src/scalable_ccd/utils/
pca.hpp:7``, ``pca.cpp:5-47``): stack both vertex frames, eigendecompose
their covariance, and rotate the world so the sweep's sort axis aligns with
the direction of maximum spread.  The reference iterates NIPALS power
steps; for a fixed 3x3 covariance ``jnp.linalg.eigh`` is exact and cheaper,
so that is used here (the *behavior* — principal-axis rotation — is what
matters, not the iteration scheme).

A rigid rotation preserves distances and linear trajectories, so the
earliest TOI is invariant; only the axis-aligned boxes (and hence candidate
counts) change.  Like the reference (rotation exercised only by the disabled
path in ``tests/test_broad_phase.cu:80-84``), this is opt-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["principal_rotation", "apply_pca"]


@jax.jit
def principal_rotation(vertices_t0: jax.Array, vertices_t1: jax.Array) -> jax.Array:
    """Rotation matrix (3, 3) whose rows are principal axes, largest first.

    Applying ``V @ R.T`` maps the direction of maximum positional spread of
    the combined frames onto the x axis — the broad phase's hard-coded sort
    axis (``cuda/broad_phase/aabb.cu:86``).
    """
    pts = jnp.concatenate([vertices_t0, vertices_t1], axis=0)
    centered = pts - jnp.mean(pts, axis=0, keepdims=True)
    cov = centered.T @ centered / centered.shape[0]
    # eigh: ascending eigenvalues -> reverse so row 0 = largest variance
    _, vecs = jnp.linalg.eigh(cov)
    r = vecs[:, ::-1].T
    # keep it a proper rotation (det +1) so orientation conventions survive
    det = jnp.linalg.det(r)
    return r.at[2].multiply(jnp.sign(det))


@jax.jit
def apply_pca(vertices_t0: jax.Array, vertices_t1: jax.Array):
    """Rotate both frames into principal axes; returns (V0', V1', R)."""
    r = principal_rotation(vertices_t0, vertices_t1)
    return vertices_t0 @ r.T, vertices_t1 @ r.T, r
