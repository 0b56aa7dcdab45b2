"""3-point rigid-transform (Kabsch/Umeyama) solver, TPU-native.

Behavioral parity with the reference SVD solver
(``/root/reference/estimators/rigid_transformation_SVD_based_solver.py:11-89``):
centroid subtraction, per-cloud √3/avg-distance scaling, (optionally
weighted) 3×3 covariance, SVD with reflection fix, ``t = Σ R·(−c₀) + c₁``,
4×4 output. Residuals follow ``squared_residual`` (``:76-89``).

Single-sample functions with static shapes, meant for ``jax.vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

SAMPLE_SIZE = 3
SOLUTIONS = 1


def _kabsch(points: jnp.ndarray, weights: jnp.ndarray | None = None, eps: float = 1e-12):
    """Core Kabsch on (N, 6) stacked (src, ref) points. Returns (R, t, scale)."""
    if weights is None:
        w = jnp.ones(points.shape[:-1], points.dtype)
    else:
        w = weights.astype(points.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True) + eps
    centroid = jnp.sum(points * w[..., None], axis=-2) / wsum
    centered = points - centroid[None, :]

    # safe norm: d‖x‖/dx = x/‖x‖ is NaN at exactly-coincident points
    # (repeated-point degenerate samples, tests/test_degenerate.py); the
    # tiny floor only perturbs lanes whose norm is 0 anyway.
    _snorm = lambda x: jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-30)
    d0 = _snorm(centered[:, 0:3])
    d1 = _snorm(centered[:, 3:6])
    avg0 = jnp.sum(d0 * w) / wsum[..., 0] + eps
    avg1 = jnp.sum(d1 * w) / wsum[..., 0] + eps
    sqrt3 = jnp.sqrt(jnp.asarray(3.0, points.dtype))
    c0 = centered[:, 0:3] * (sqrt3 / avg0) * w[:, None]
    c1 = centered[:, 3:6] * (sqrt3 / avg1)

    # 3×3 covariance (MXU-friendly when vmapped/batched).
    cov = c0.T @ c1  # (3, 3) cross-covariance Σ src ⊗ ref
    # The reference recovers R via SVD of the covariance (``:51-62``).
    # We use Horn's closed-form quaternion method instead: the optimal
    # rotation is the largest-eigenvalue eigenvector of a symmetric 4×4
    # built from cov — a TPU-robust ``eigh`` (XLA's small-SVD custom call
    # crashes the TPU compiler inside this solver's composition), always a
    # proper rotation (no reflection fix-up), and cleanly differentiable.
    R = _horn_rotation(cov)
    scale = avg1 / avg0
    t = R @ (-centroid[0:3]) + centroid[3:6]
    return R, t, scale


def _horn_rotation(S: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotation maximizing Σ ref·(R src) from the 3×3 cross-covariance
    ``S = Σ src ⊗ ref`` (Horn 1987 closed-form absolute orientation)."""
    s00, s01, s02 = S[0, 0], S[0, 1], S[0, 2]
    s10, s11, s12 = S[1, 0], S[1, 1], S[1, 2]
    s20, s21, s22 = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.stack(
        [
            jnp.stack([s00 + s11 + s22, s12 - s21, s20 - s02, s01 - s10]),
            jnp.stack([s12 - s21, s00 - s11 - s22, s01 + s10, s02 + s20]),
            jnp.stack([s20 - s02, s01 + s10, s11 - s00 - s22, s12 + s21]),
            jnp.stack([s01 - s10, s02 + s20, s12 + s21, s22 - s00 - s11]),
        ]
    )
    from differentiable_ransac_tpu.ops.linalg import safe_eigh

    _, vecs = safe_eigh(N)
    q = vecs[:, -1]  # largest eigenvalue
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)]),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)]),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]),
        ]
    )


def rigid_3pt(points: jnp.ndarray, weights: jnp.ndarray | None = None):
    """Minimal (or any-size) rigid solve for one sample.

    Args:
        points: (N>=3, 6) rows of ``(x, y, z, x', y', z')``.
        weights: optional (N,).

    Returns:
        (models (1, 4, 4), valid (1,)): homogeneous transform mapping the
        source cloud onto the reference cloud.
    """
    R, t, _ = _kabsch(points, weights)
    top = jnp.concatenate([R, t[:, None]], axis=-1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], points.dtype)
    model = jnp.concatenate([top, bottom], axis=0)
    valid = jnp.all(jnp.isfinite(model))
    model = jnp.where(valid, model, jnp.eye(4, dtype=points.dtype))
    return model[None], valid[None]


def rigid_nonminimal(points: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    models, _ = rigid_3pt(points, weights)
    return models[0]


def rigid_squared_residual(pts1: jnp.ndarray, pts2: jnp.ndarray, models: jnp.ndarray,
                           threshold: float = 0.03):
    """Squared transfer distances of all points under all models.

    Matches the reference ``squared_residual``
    (``rigid_transformation_SVD_based_solver.py:76-89``) but batched over
    hypotheses: ``models`` (..., 4, 4), ``pts1``/``pts2`` (N, 3).

    Returns:
        (squared_distance (..., N), inlier_mask (..., N)).
    """
    R = models[..., :3, :3]
    t = models[..., :3, 3]
    moved = jnp.einsum("...ij,nj->...ni", R, pts1) + t[..., None, :]
    sq = jnp.sum((moved - pts2) ** 2, axis=-1)
    return sq, sq < threshold
