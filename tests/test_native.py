"""Native σ-consensus module tests (C++ via ctypes)."""

import numpy as np
import pytest

from differentiable_ransac_tpu import native
from differentiable_ransac_tpu.data.synthetic import rigid_problem, two_view_problem

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _dist(A, B):
    A = A / np.linalg.norm(A)
    B = B / np.linalg.norm(B)
    return min(np.linalg.norm(A - B), np.linalg.norm(A + B))


def test_sigma_polish_improves_essential():
    """Polish from a realistic RANSAC output: the algebraic refit on the
    inlier set. σ-consensus soft weighting must hold or beat it."""
    import jax.numpy as jnp

    from differentiable_ransac_tpu.solvers.essential import essential_nonminimal

    p = two_view_problem(n_points=300, noise=0.5, outlier_ratio=0.4, seed=0)
    rough = np.asarray(
        essential_nonminimal(jnp.asarray(p["matches"]),
                             jnp.asarray(p["inlier_mask"].astype(np.float32)))
    )
    d0 = _dist(rough, p["E"])
    polished, q = native.sigma_consensus_polish(
        p["matches"], rough, sigma_max=2.0 / 1000.0, essential=True
    )
    d1 = _dist(polished, p["E"])
    assert q > 0
    # the σ-averaged model must stay near the oracle-inlier refit level
    # (d0 uses ground-truth inliers the polish cannot see)
    assert d1 < max(2.0 * d0, 0.03), (d0, d1)


def test_sigma_polish_fundamental():
    import jax.numpy as jnp

    from differentiable_ransac_tpu.solvers.fundamental import fundamental_8pt

    p = two_view_problem(n_points=300, noise=1.0, outlier_ratio=0.3, seed=1)
    # realistic rough model: 8pt fit on a small inlier subset
    inl = np.where(p["inlier_mask"])[0][:12]
    models, valid = fundamental_8pt(jnp.asarray(p["matches_px"][inl]))
    rough = np.asarray(models)[0]
    polished, q = native.sigma_consensus_polish(
        p["matches_px"], rough, sigma_max=3.0, essential=False
    )
    assert q > 0
    assert _dist(polished, p["F"]) < _dist(rough, p["F"]) + 1e-9
    # rank-2 enforced
    assert abs(np.linalg.det(polished)) < 1e-6


def test_sigma_polish_rigid():
    p = rigid_problem(n_points=300, noise=0.01, outlier_ratio=0.4, seed=2)
    rng = np.random.default_rng(2)
    rough = p["transform"].copy()
    rough[:3, 3] += rng.normal(scale=0.05, size=3)
    polished, q = native.sigma_consensus_polish_rigid(p["points"], rough, sigma_max=0.05)
    assert q > 0
    err_t0 = np.linalg.norm(rough[:3, 3] - p["transform"][:3, 3])
    err_t1 = np.linalg.norm(polished[:3, 3] - p["transform"][:3, 3])
    assert err_t1 < err_t0
    # R stays a rotation
    R = polished[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_lm_refine_essential():
    p = two_view_problem(n_points=300, noise=1.0, outlier_ratio=0.3, seed=3)
    rng = np.random.default_rng(3)
    rough = p["E"] + rng.normal(scale=0.08, size=(3, 3)).astype(np.float32)
    # project rough to essential manifold first (LM parametrizes (R, t))
    u, s, vt = np.linalg.svd(rough)
    rough_E = u @ np.diag([1.0, 1.0, 0.0]) @ vt
    idx = np.where(p["inlier_mask"])[0]
    refined, cost = native.optimize_essential(p["matches"], idx, rough_E)
    assert cost >= 0
    assert _dist(refined, p["E"]) <= _dist(rough_E, p["E"]) + 1e-9
    # lands near the geometric (Sampson-MLE) noise floor for 1px noise
    assert _dist(refined, p["E"]) < 0.05
