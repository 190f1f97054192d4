"""PCA preconditioner: rotation validity, spread alignment, TOI invariance.

Reference exercises PCA only through a disabled test path
(``tests/test_broad_phase.cu:80-84``); here it gets real coverage.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_ccd_tpu.geometry.scenes import cloth_on_sphere
from scalable_ccd_tpu.pipeline.fused import fused_ccd
from scalable_ccd_tpu.utils.pca import apply_pca, principal_rotation


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    # anisotropic cloud stretched along an oblique direction
    base = rng.normal(size=(500, 3)) * np.array([5.0, 1.0, 0.2])
    theta = 0.9
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    v0 = base @ rot.T + 3.0
    v1 = v0 + rng.normal(size=v0.shape) * 0.01
    return jnp.asarray(v0), jnp.asarray(v1)


def test_rotation_is_orthonormal(frames):
    r = np.asarray(principal_rotation(*frames))
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_max_spread_lands_on_x(frames):
    v0r, v1r, _ = apply_pca(*frames)
    pts = np.concatenate([np.asarray(v0r), np.asarray(v1r)])
    var = pts.var(axis=0)
    assert var[0] >= var[1] >= var[2]


def test_toi_invariant_under_pca():
    scene = cloth_on_sphere(grid_n=8, sphere_subdiv=0, drop=0.5)
    v0 = jnp.asarray(scene.vertices_t0, jnp.float32)
    v1 = jnp.asarray(scene.vertices_t1, jnp.float32)
    e = jnp.asarray(scene.edges, jnp.int32)
    f = jnp.asarray(scene.faces, jnp.int32)
    kw = dict(
        vf_budget=1 << 14, ee_budget=1 << 14,
        max_iterations=1 << 16, narrow_batch=1 << 10,
    )
    base = fused_ccd(v0, v1, e, f, **kw)
    v0r, v1r, _ = apply_pca(v0, v1)
    rot = fused_ccd(v0r.astype(jnp.float32), v1r.astype(jnp.float32), e, f, **kw)
    assert not bool(base.overflowed) and not bool(rot.overflowed)
    # rigid rotation preserves the contact time up to fp tolerance
    assert float(rot.toi) == pytest.approx(float(base.toi), abs=2e-5)
