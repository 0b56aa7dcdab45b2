"""Degenerate-input property tests for the minimal solvers (VERDICT r4
task 9): collinear/coplanar samples, repeated points, zero-parallax pairs,
multiplicity-2 roots. The framework replaces the reference's skip-on-NaN
guards (``/root/reference/train.py:145-182``, ``ransac.py:103-108``) with
validity masks + finite models — these tests prove that contract ON the
degenerate variety itself, plus finite gradients through the implicit-diff
VJPs there."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.ops.polynomial import (
    aberth_roots,
    cubic_roots,
    sturm_bisect_roots,
)
from differentiable_ransac_tpu.solvers.essential import essential_5pt_nister
from differentiable_ransac_tpu.solvers.fundamental import fundamental_7pt, fundamental_8pt
from differentiable_ransac_tpu.solvers.rigid import rigid_3pt


def _grad_finite(solver, matches):
    """Gradient of a masked model-norm loss w.r.t. the input sample must be
    finite even when every solution slot is invalid (the where-mask plus
    the implicit VJPs must not leak NaN)."""

    def loss(m):
        models, valid = solver(m)
        sel = jnp.where(valid[:, None, None], models, 0.0)
        return jnp.sum(sel ** 2)

    g = jax.grad(loss)(matches)
    return bool(jnp.isfinite(g).all())


# ---------------------------------------------------------------------------
# essential 5PC
# ---------------------------------------------------------------------------

def _e_invariants(models, valid):
    models, valid = np.asarray(models), np.asarray(valid)
    assert np.isfinite(models).all(), "solver must never emit NaN models"
    for E, v in zip(models, valid):
        if v:
            # a valid E has the 1:1:0 singular-value structure up to noise
            assert np.isfinite(np.linalg.svd(E, compute_uv=False)).all()


def test_5pc_repeated_points():
    row = np.array([0.1, -0.2, 0.15, -0.18], np.float32)
    matches = jnp.asarray(np.tile(row, (5, 1)))
    models, valid = essential_5pt_nister(matches)
    _e_invariants(models, valid)
    assert _grad_finite(lambda m: essential_5pt_nister(m), matches)


def test_5pc_collinear_points():
    # all image-1 points on a line, image-2 = same points (zero motion):
    # rank-deficient constraint matrix
    t = np.linspace(-0.3, 0.3, 5, dtype=np.float32)
    x = np.stack([t, 0.5 * t + 0.1], axis=1)
    matches = jnp.asarray(np.concatenate([x, x], axis=1))
    models, valid = essential_5pt_nister(matches)
    _e_invariants(models, valid)
    assert _grad_finite(lambda m: essential_5pt_nister(m), matches)


def test_5pc_zero_parallax():
    # x2 == x1 exactly for generic points — pure-rotation/zero-baseline:
    # E is only defined up to the trivial solution
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.4, 0.4, (5, 2)).astype(np.float32)
    matches = jnp.asarray(np.concatenate([x, x], axis=1))
    models, valid = essential_5pt_nister(matches)
    _e_invariants(models, valid)
    assert _grad_finite(lambda m: essential_5pt_nister(m), matches)


# ---------------------------------------------------------------------------
# fundamental 7PC / 8PC
# ---------------------------------------------------------------------------

def test_7pc_repeated_points():
    row = np.array([100.0, 200.0, 140.0, 180.0], np.float32)
    matches = jnp.asarray(np.tile(row, (7, 1)))
    models, valid = fundamental_7pt(matches)
    models = np.asarray(models)
    assert np.isfinite(models).all()
    assert _grad_finite(lambda m: fundamental_7pt(m), matches)


def test_7pc_collinear_points():
    t = np.linspace(0, 1, 7, dtype=np.float32)
    p1 = np.stack([100 + 300 * t, 50 + 200 * t], axis=1)
    p2 = p1 + np.array([5.0, -3.0], np.float32)
    matches = jnp.asarray(np.concatenate([p1, p2], axis=1))
    models, valid = fundamental_7pt(matches)
    assert np.isfinite(np.asarray(models)).all()
    assert _grad_finite(lambda m: fundamental_7pt(m), matches)


def test_8pc_degenerate_weights():
    # all weight on one correspondence: the weighted Gram is rank 1
    rng = np.random.default_rng(1)
    matches = jnp.asarray(rng.uniform(0, 500, (8, 4)).astype(np.float32))
    w = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0, 0], np.float32))
    F, valid = fundamental_8pt(matches, w)
    assert np.isfinite(np.asarray(F)).all()

    def loss(m):
        Fm, v = fundamental_8pt(m, w)
        return jnp.sum(jnp.where(v[:, None, None], Fm, 0.0) ** 2)

    assert bool(jnp.isfinite(jax.grad(loss)(matches)).all())


# ---------------------------------------------------------------------------
# rigid 3-point
# ---------------------------------------------------------------------------

def test_rigid_collinear_points():
    # 3 collinear points: rotation about the line is unconstrained — the
    # solver must still return a finite orthonormal R (a consistent member
    # of the solution family) or mark the slot invalid
    src = np.stack([np.linspace(0, 1, 3)] * 3, axis=1).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    ref = src @ R.T + np.array([0.1, -0.2, 0.3], np.float32)
    pts = jnp.asarray(np.concatenate([src, ref], axis=1))
    models, valid = rigid_3pt(pts)
    models = np.asarray(models)
    assert np.isfinite(models).all()
    if bool(valid[0]):
        Rm = models[0][:3, :3]
        np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-3)

    def loss(p):
        m, v = rigid_3pt(p)
        return jnp.sum(jnp.where(v[:, None, None], m, 0.0) ** 2)

    assert bool(jnp.isfinite(jax.grad(loss)(pts)).all())


def test_rigid_repeated_points():
    row = np.array([0.5, -0.5, 0.2, 0.7, 0.1, -0.3], np.float32)
    pts = jnp.asarray(np.tile(row, (3, 1)))
    models, valid = rigid_3pt(pts)
    assert np.isfinite(np.asarray(models)).all()

    def loss(p):
        m, v = rigid_3pt(p)
        return jnp.sum(jnp.where(v[:, None, None], m, 0.0) ** 2)

    assert bool(jnp.isfinite(jax.grad(loss)(pts)).all())


# ---------------------------------------------------------------------------
# root finders at multiplicity-2 roots
# ---------------------------------------------------------------------------

def test_cubic_double_root():
    # (x-1)^2 (x-2) = x^3 - 4x^2 + 5x - 2, coeffs ascending [c0..c3]
    c = jnp.asarray([-2.0, 5.0, -4.0, 1.0], jnp.float64)
    roots, valid = cubic_roots(c)
    roots = np.sort(np.asarray(roots)[np.asarray(valid)])
    assert roots.size >= 2
    assert np.isfinite(roots).all()
    assert np.any(np.abs(roots - 2.0) < 1e-6)
    assert np.any(np.abs(roots - 1.0) < 1e-3)  # double root: reduced accuracy ok

    def loss(cc):
        r, v = cubic_roots(cc)
        return jnp.sum(jnp.where(v, r, 0.0))

    g = jax.grad(loss)(c)
    assert bool(jnp.isfinite(g).all()), (
        "cubic VJP must stay finite at a double root")


def test_aberth_double_root_degree10():
    # (x-1)^2 (x+2) (x^2+1) (x^3+3) * (x^2 + x + 7) -> degree 10, ascending
    base = np.poly1d([1, -1]) ** 2 * np.poly1d([1, 2]) * np.poly1d([1, 0, 1])
    base = base * np.poly1d([1, 0, 0, 3]) * np.poly1d([1, 1, 7])
    coeffs = jnp.asarray(base.coefficients[::-1].copy(), jnp.float64)
    roots, valid = aberth_roots(coeffs)
    roots, valid = np.asarray(roots), np.asarray(valid)
    assert np.isfinite(roots[valid]).all()
    real = roots[valid]
    assert np.any(np.abs(real - 1.0) < 1e-3), "double real root found"
    assert np.any(np.abs(real + 2.0) < 1e-6)

    def loss(cc):
        r, v = aberth_roots(cc)
        return jnp.sum(jnp.where(v, r, 0.0))

    assert bool(jnp.isfinite(jax.grad(loss)(coeffs)).all())


def test_sturm_double_root_consistency():
    # Sturm counts DISTINCT roots: the double root appears once, finitely
    base = np.poly1d([1, -1]) ** 2 * np.poly1d([1, 2]) * np.poly1d([1, 0, 1])
    base = base * np.poly1d([1, 0, 0, 3]) * np.poly1d([1, 1, 7])
    coeffs = jnp.asarray(base.coefficients[::-1].copy(), jnp.float64)
    roots, valid = sturm_bisect_roots(coeffs)
    roots, valid = np.asarray(roots), np.asarray(valid)
    assert np.isfinite(roots[valid]).all()
    assert np.any(np.abs(roots[valid] + 2.0) < 1e-6)


# ---------------------------------------------------------------------------
# engine-level: a degenerate pair must produce a valid=False/finite search
# ---------------------------------------------------------------------------

def test_engine_all_collinear_pair():
    """A whole pair on a line (quasi-degenerate scene at its limit): the
    adaptive search must return finite outputs, never NaN."""
    from differentiable_ransac_tpu.config import ModelKind, RansacConfig
    from differentiable_ransac_tpu.engine import ransac_test

    n = 64
    t = np.linspace(-0.3, 0.3, n).astype(np.float32)
    x = np.stack([t, 0.4 * t + 0.05], axis=1)
    pts = jnp.asarray(np.concatenate([x, x + 0.01], axis=1))
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, max_iterations=128,
                       threshold=2.0)
    model, mask, score, iters = jax.jit(
        lambda p, l, k: ransac_test(cfg, p, l, k,
                                    threshold=jnp.asarray(2e-3))
    )(pts, jnp.zeros(n), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(model)).all()
    assert np.isfinite(float(score))
