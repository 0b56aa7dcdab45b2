"""Fundamental-matrix minimal/non-minimal solvers (7PC, 8PC), TPU-native.

Behavioral parity targets (reference ``/root/reference/estimators/
fundamental_matrix_estimator.py``):

* 7PC minimal (``:262-308``): 7×9 epipolar constraint, 2-dim null space,
  cubic ``det(λ F1 + μ F2) = 0``, up to 3 valid F per sample; the solver
  always emits a fixed ``S = 4`` solution slots, identity-filled when invalid
  (matching the reference's fixed 4-slot training shape, ``:299-308``).
* 8PC non-minimal (``:230-260``): Hartley normalization, (weighted) SVD null
  vector, denormalization ``T2ᵀ F T1``.

TPU design: everything is a single-sample function with static shapes meant
to be ``jax.vmap``-ed over thousands of hypotheses; null spaces come from
``eigh`` of the 9×9 Gram matrix; cubic roots are closed-form (branch-free)
instead of 4×4 companion ``eigvals``.

Model convention: returned F satisfies ``x2ᵀ F x1 = 0``.
"""

from __future__ import annotations

import jax.numpy as jnp

from differentiable_ransac_tpu.ops import epipolar
from differentiable_ransac_tpu.ops.linalg import null_space_from_gram
from differentiable_ransac_tpu.ops.polynomial import cubic_roots

SAMPLE_SIZE_7PT = 7
SOLUTIONS_7PT = 4


def _constraint_rows(matches: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Rows of the epipolar constraint ``A f = 0`` for f = vec(F) such that
    ``x2ᵀ F x1 = 0``; column order matches the reference
    (``fundamental_matrix_estimator.py:276``)."""
    x1, y1 = matches[..., 0], matches[..., 1]
    x2, y2 = matches[..., 2], matches[..., 3]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x1 * x2, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    if weights is not None:
        A = A * weights[..., None]
    return A


def _vec9_to_F(v: jnp.ndarray) -> jnp.ndarray:
    """9-vector in the reference column order -> (3, 3) F with x2ᵀFx1 = 0.

    The constraint row ordering corresponds to coefficients of
    (F00,F01,F02,F10,F11,F12,F20,F21,F22)?  Column k multiplies f_k; column
    0 is x1·x2 which is the coefficient of F[0,0] (x2 index 0, x1 index 0);
    column 1 is x2·y1 → F[0,1]; column 2 x2 → F[0,2]; column 3 y2·x1 →
    F[1,0]; ... i.e. row-major F. The reference reshapes the null vector
    row-major to (3,3) and uses it directly (``:283,:303``) — same layout.
    """
    return v.reshape(v.shape[:-1] + (3, 3))


def fundamental_7pt(matches: jnp.ndarray, solve_dtype=jnp.float64):
    """7-point minimal solver for a single sample.

    The core runs in ``solve_dtype`` (default f64): F operates on pixel
    coordinates, so the 9×9 Gram has condition ~1e12 — far beyond f32.

    Args:
        matches: (7, 4) correspondences (pixels).

    Returns:
        (models (4, 3, 3), valid (4,) bool): up to 3 real-root solutions plus
        a 4th always-invalid slot; invalid slots are identity (reference
        keeps the fixed 4-solution shape, ``fundamental_matrix_estimator.py:299-308``).
    """
    out_dtype = matches.dtype
    matches = matches.astype(solve_dtype)
    A = _constraint_rows(matches)  # (7, 9)
    ns = null_space_from_gram(A, 2)  # (9, 2), smallest eigenvalue first
    F1 = _vec9_to_F(ns[:, 0])
    F2 = _vec9_to_F(ns[:, 1])

    # Solutions are F(x) = x·F1 + F2 with det F(x) = 0 — a cubic in x,
    # evaluated exactly by finite differences of the 3×3 determinant.
    # (The reference mixes parametrizations here: its cubic coefficients
    # come from det(a·F1 + (1−a)·F2) (``:219-227``) while its composition
    # is x·F1 + F2 (``:299-303``), and its 4×4 companion (``:291-296``)
    # additionally assumes a monic cubic. We keep the composition and derive
    # the matching coefficients.)
    fun = lambda a: jnp.linalg.det(a * F1 + F2)
    p0, pp1, pm1, pp2, pm2 = fun(0.0), fun(1.0), fun(-1.0), fun(2.0), fun(-2.0)
    o1 = (pp1 - pm1) / 2.0
    o2 = (pp2 - pm2) / 2.0
    c0 = p0
    c2 = (pp1 + pm1) / 2.0 - p0
    c3 = (o2 - 2.0 * o1) / 6.0
    c1 = o1 - c3
    coeffs = jnp.stack([c0, c1, c2, c3], axis=-1)

    roots, root_valid = cubic_roots(coeffs)  # (3,), (3,)

    # F = λ F1 + μ F2 with μ = 1/(F1[2,2]·x + F2[2,2]), λ = x·μ — the
    # reference composition (``:299-303``), normalizing F[2,2] = 1.
    s = F1[2, 2] * roots + F2[2, 2]
    s_ok = jnp.abs(s) > 1e-10
    mu = 1.0 / jnp.where(s_ok, s, 1.0)
    lam = roots * mu
    Fs = F1[None] * lam[:, None, None] + F2[None] * mu[:, None, None]
    valid3 = root_valid & s_ok
    eye = jnp.eye(3, dtype=matches.dtype)
    Fs = jnp.where(valid3[:, None, None], Fs, eye)

    models = jnp.concatenate([Fs, eye[None]], axis=0)  # (4, 3, 3)
    valid = jnp.concatenate([valid3, jnp.zeros((1,), bool)], axis=0)
    return models.astype(out_dtype), valid


def fundamental_8pt(matches: jnp.ndarray, weights: jnp.ndarray | None = None,
                    solve_dtype=jnp.float64):
    """8-point (or more) solver for a single sample, with Hartley
    normalization. Used both as the ``-sam 3`` minimal path (8 Gumbel-drawn
    points) and as the refit solver.

    Args:
        matches: (N>=8, 4).
        weights: optional (N,) row weights (0 rows are excluded from the
            normalization statistics as well as the constraint).

    Returns:
        (models (1, 3, 3), valid (1,)).
    """
    out_dtype = matches.dtype
    matches = matches.astype(solve_dtype)
    if weights is not None:
        weights = weights.astype(solve_dtype)
    normalized, T1, T2t = epipolar.hartley_normalize(matches, weights)
    A = _constraint_rows(normalized, weights)
    ns = null_space_from_gram(A, 1)  # (9, 1)
    Fn = _vec9_to_F(ns[:, 0])
    F = T2t @ Fn @ T1
    valid = jnp.all(jnp.isfinite(F))
    eye = jnp.eye(3, dtype=matches.dtype)
    F = jnp.where(valid, F, eye)
    return F[None].astype(out_dtype), valid[None]


def fundamental_nonminimal(matches: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted least-squares refit on (masked) inliers; returns (3, 3)."""
    models, _ = fundamental_8pt(matches, weights)
    return models[0]
