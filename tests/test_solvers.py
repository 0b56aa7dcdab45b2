"""Minimal-solver correctness on synthetic noiseless geometry.

The ground-truth recovery property: given a noiseless minimal sample, the
solver's solution set must contain the true model (up to scale/sign), and
every emitted valid model must satisfy the constraint on its own sample.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.data.synthetic import rigid_problem, two_view_problem
from differentiable_ransac_tpu.ops import epipolar
from differentiable_ransac_tpu.solvers import (
    essential_5pt_nister,
    essential_nonminimal,
    fundamental_7pt,
    fundamental_8pt,
    fundamental_nonminimal,
    rigid_3pt,
)
from differentiable_ransac_tpu.solvers.rigid import rigid_squared_residual


def _model_distance(A, B):
    """min over sign of normalized Frobenius distance."""
    A = A / np.linalg.norm(A)
    B = B / np.linalg.norm(B)
    return min(np.linalg.norm(A - B), np.linalg.norm(A + B))


# ---------------------------------------------------------------------------
# 5PC essential
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(8))
def test_essential_5pt_recovers_gt(seed):
    p = two_view_problem(n_points=5, seed=seed)
    models, valid = essential_5pt_nister(jnp.asarray(p["matches"]))
    models, valid = np.asarray(models), np.asarray(valid)
    assert models.shape == (10, 3, 3)
    assert valid.any()
    dists = [_model_distance(m, p["E"]) for m, v in zip(models, valid) if v]
    assert min(dists) < 5e-3, (seed, min(dists))


@pytest.mark.parametrize("seed", range(4))
def test_essential_5pt_draft_budget_recovers_gt(seed):
    """Reduced Aberth budget (``essential_5pt_nister(root_iters=...)``,
    a solver-level knob for ranking-only use) must still solve clean
    minimal samples."""
    p = two_view_problem(n_points=5, seed=seed + 300)
    m = jnp.asarray(p["matches"], jnp.float32)

    def best_dist(root_iters, root_polish):
        models, valid = essential_5pt_nister(
            m, solve_dtype=jnp.float32,
            root_iters=root_iters, root_polish=root_polish)
        models, valid = np.asarray(models), np.asarray(valid)
        assert valid.any()
        return min(_model_distance(mm, p["E"])
                   for mm, v in zip(models, valid) if v)

    # The promise is RELATIVE: a draft budget may not lose accuracy vs the
    # full-budget f32 core (some samples are f32-hard at any budget — the
    # f64 rescue handles those).
    assert best_dist(16, 2) <= best_dist(0, 0) + 0.05, seed


@pytest.mark.parametrize("seed", range(4))
def test_essential_5pt_solutions_satisfy_constraints(seed):
    p = two_view_problem(n_points=5, seed=seed + 100)
    m = jnp.asarray(p["matches"])
    models, valid = essential_5pt_nister(m)
    d = np.asarray(epipolar.sampson_squared(models, m))
    v = np.asarray(valid)
    # every valid solution must interpolate its own 5 points
    assert d[v].max() < 1e-6
    # and the well-converged candidates lie on the essential manifold
    # (det ≈ 0); clustered-root duplicates can sit ~1e-2 off — MSAC ranks
    # them out downstream
    dets = np.abs(np.linalg.det(np.asarray(models)[v]))
    assert dets.min() < 1e-5
    assert dets.max() < 0.1


def test_essential_5pt_vmapped_batch():
    probs = [two_view_problem(n_points=5, seed=s) for s in range(16)]
    batch = jnp.asarray(np.stack([p["matches"] for p in probs]))
    models, valid = jax.vmap(essential_5pt_nister)(batch)
    assert models.shape == (16, 10, 3, 3)
    models, valid = np.asarray(models), np.asarray(valid)
    ok = 0
    for i, p in enumerate(probs):
        dists = [_model_distance(m, p["E"]) for m, v in zip(models[i], valid[i]) if v]
        ok += bool(dists and min(dists) < 5e-3)
    assert ok >= 15  # allow at most one degenerate configuration


def test_essential_5pt_weighted_matches_unweighted():
    p = two_view_problem(n_points=5, seed=5)
    m = jnp.asarray(p["matches"])
    w = jnp.full((5,), 0.7)
    models_u, valid_u = essential_5pt_nister(m)
    models_w, valid_w = essential_5pt_nister(m, w)
    # uniform weights must not change the solution set materially
    du = sorted(_model_distance(np.asarray(mm), p["E"]) for mm, v in zip(models_u, np.asarray(valid_u)) if v)
    dw = sorted(_model_distance(np.asarray(mm), p["E"]) for mm, v in zip(models_w, np.asarray(valid_w)) if v)
    assert du[0] < 5e-3 and dw[0] < 5e-3


def test_essential_nonminimal_refit():
    p = two_view_problem(n_points=60, noise=0.5, seed=6)
    E = essential_nonminimal(jnp.asarray(p["matches"]))
    # algebraic DLT refit: noise-limited accuracy (the Sampson Gauss-Newton
    # polish tightens this further on the SOTA path)
    assert _model_distance(np.asarray(E), p["E"]) < 5e-2
    # inlier mask excludes outliers from the fit
    p2 = two_view_problem(n_points=100, noise=0.0, outlier_ratio=0.3, seed=7)
    w = jnp.asarray(p2["inlier_mask"].astype(np.float32))
    E2 = essential_nonminimal(jnp.asarray(p2["matches"]), w)
    assert _model_distance(np.asarray(E2), p2["E"]) < 5e-3


def test_essential_5pt_differentiable():
    p = two_view_problem(n_points=5, seed=8)

    def loss(m):
        models, valid = essential_5pt_nister(m)
        d = epipolar.sampson_squared(models, m)
        return jnp.sum(jnp.where(valid[:, None], d, 0.0))

    g = jax.grad(loss)(jnp.asarray(p["matches"]))
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# 7PC / 8PC fundamental
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(8))
def test_fundamental_7pt_recovers_gt(seed):
    p = two_view_problem(n_points=7, seed=seed)
    m = jnp.asarray(p["matches_px"])
    models, valid = fundamental_7pt(m)
    models, valid = np.asarray(models), np.asarray(valid)
    assert models.shape == (4, 3, 3)
    assert valid.any()
    dists = [_model_distance(mm, p["F"]) for mm, v in zip(models, valid) if v]
    assert min(dists) < 5e-3, (seed, dists)


def test_fundamental_7pt_interpolates_sample():
    p = two_view_problem(n_points=7, seed=42)
    m = jnp.asarray(p["matches_px"])
    models, valid = fundamental_7pt(m)
    # Sampson in normalized-scale: use symmetric epipolar on px coords,
    # relative to the matrix norm.
    d = np.asarray(epipolar.sampson_squared(models, m))
    v = np.asarray(valid)
    assert d[v].max() < 1e-2  # px² units
    dets = np.abs(np.linalg.det(np.asarray(models)[v] / np.linalg.norm(np.asarray(models)[v], axis=(1, 2), keepdims=True)))
    assert dets.max() < 1e-5


@pytest.mark.parametrize("seed", range(4))
def test_fundamental_8pt_recovers_gt(seed):
    p = two_view_problem(n_points=8, seed=seed + 10)
    m = jnp.asarray(p["matches_px"])
    models, valid = fundamental_8pt(m)
    assert bool(np.asarray(valid)[0])
    assert _model_distance(np.asarray(models)[0], p["F"]) < 5e-3


def test_fundamental_nonminimal_weighted():
    p = two_view_problem(n_points=120, outlier_ratio=0.4, seed=11)
    w = jnp.asarray(p["inlier_mask"].astype(np.float32))
    F = fundamental_nonminimal(jnp.asarray(p["matches_px"]), w)
    assert _model_distance(np.asarray(F), p["F"]) < 1e-2


def test_fundamental_7pt_vmapped():
    probs = [two_view_problem(n_points=7, seed=s + 50) for s in range(8)]
    batch = jnp.asarray(np.stack([p["matches_px"] for p in probs]))
    models, valid = jax.vmap(fundamental_7pt)(batch)
    assert models.shape == (8, 4, 3, 3)


# ---------------------------------------------------------------------------
# rigid 3-point
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(4))
def test_rigid_3pt_recovers_gt(seed):
    p = rigid_problem(n_points=3, seed=seed)
    models, valid = rigid_3pt(jnp.asarray(p["points"]))
    assert bool(np.asarray(valid)[0])
    np.testing.assert_allclose(np.asarray(models)[0], p["transform"], atol=1e-4)


def test_rigid_nonminimal_noise():
    p = rigid_problem(n_points=100, noise=0.01, seed=5)
    models, valid = rigid_3pt(jnp.asarray(p["points"]))
    got = np.asarray(models)[0]
    assert np.abs(got - p["transform"]).max() < 5e-2


def test_rigid_residuals():
    p = rigid_problem(n_points=50, outlier_ratio=0.3, seed=6)
    T = jnp.asarray(p["transform"])[None]
    pts = p["points"]
    sq, mask = rigid_squared_residual(jnp.asarray(pts[:, :3]), jnp.asarray(pts[:, 3:]), T)
    mask = np.asarray(mask)[0]
    assert (mask == p["inlier_mask"]).mean() > 0.95


def test_rigid_differentiable():
    p = rigid_problem(n_points=3, seed=7)

    def loss(pts):
        models, _ = rigid_3pt(pts)
        return jnp.sum(models**2)

    g = jax.grad(loss)(jnp.asarray(p["points"]))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("seed", range(4))
def test_essential_5pt_sturm_backend_matches_aberth(seed):
    """root_solver="sturm" (Sturm isolation + bisection) recovers GT and
    yields the same real-solution set as the default Aberth backend."""
    p = two_view_problem(n_points=5, seed=seed)
    m = jnp.asarray(p["matches"])
    ms, vs = essential_5pt_nister(m, root_solver="sturm")
    ma, va = essential_5pt_nister(m, root_solver="aberth")
    ms, vs = np.asarray(ms), np.asarray(vs)
    ma, va = np.asarray(ma), np.asarray(va)
    assert vs.any()
    dists = [_model_distance(mm, p["E"]) for mm, v in zip(ms, vs) if v]
    assert min(dists) < 5e-3, (seed, min(dists))
    # every sturm solution appears in the aberth set (both E and -E match
    # the same model after Frobenius normalization)
    for mm, v in zip(ms, vs):
        if v:
            assert min(_model_distance(mm, a) for a, av in zip(ma, va) if av) < 1e-5
