"""Epipolar-geometry substrate: residuals, normalizations, coordinate maps.

Pure ``jax.numpy`` functions with static shapes, designed to be ``vmap``-ed
and fused by XLA. Conventions follow the reference implementation:

* A correspondence row is ``(x1, y1, x2, y2)``.
* A model ``M`` (E or F) satisfies ``x2ᵀ M x1 = 0`` for homogeneous
  ``x1 = (x1, y1, 1)``, ``x2 = (x2, y2, 1)`` — the convention produced by the
  reference solvers and consumed by its MSAC scorer
  (``/root/reference/scorings/msac_score.py:33-42``).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-15


def to_homogeneous(pts: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 2) -> (..., N, 3) appending ones."""
    ones = jnp.ones_like(pts[..., :1])
    return jnp.concatenate([pts, ones], axis=-1)


def sampson_squared(models: jnp.ndarray, matches: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance of every correspondence to every model.

    The first-order approximation of geometric distance, exactly as the
    reference MSAC scorer computes it
    (``/root/reference/scorings/msac_score.py:33-42``):
    ``d² = (x1ᵀ Mᵀ x2)² / ((Mx1)₀² + (Mx1)₁² + (Mᵀx2)₀² + (Mᵀx2)₁²)``.

    Args:
        models: (..., 3, 3) batch of E/F models.
        matches: (N, 4) correspondences ``(x1, y1, x2, y2)``.

    Returns:
        (..., N) squared Sampson distances.
    """
    x1 = to_homogeneous(matches[..., 0:2])  # (N, 3)
    x2 = to_homogeneous(matches[..., 2:4])  # (N, 3)
    # (..., 3, N): epipolar lines. These two contractions are MXU matmuls.
    m_x1 = jnp.einsum("...ij,nj->...in", models, x1)
    mt_x2 = jnp.einsum("...ji,nj->...in", models, x2)
    jj = m_x1[..., 0, :] ** 2 + m_x1[..., 1, :] ** 2 + mt_x2[..., 0, :] ** 2 + mt_x2[..., 1, :] ** 2
    x2_m_x1 = jnp.einsum("ni,...in->...n", x1, mt_x2)
    return x2_m_x1**2 / (jj + _EPS)


def symmetric_epipolar_squared(x1: jnp.ndarray, x2: jnp.ndarray, models: jnp.ndarray) -> jnp.ndarray:
    """Squared symmetric epipolar distance (``batch_episym`` of the reference).

    ``ys = (x2ᵀFx1)² (1/‖(Fx1)₀₁‖² + 1/‖(Fᵀx2)₀₁‖²)``
    (``/root/reference/cv_utils.py:680-695``).

    Args:
        x1, x2: (N, 2) image points.
        models: (..., 3, 3).

    Returns:
        (..., N).
    """
    h1 = to_homogeneous(x1)
    h2 = to_homogeneous(x2)
    f_x1 = jnp.einsum("...ij,nj->...in", models, h1)
    ft_x2 = jnp.einsum("...ji,nj->...in", models, h2)
    x2_f_x1 = jnp.einsum("ni,...in->...n", h2, f_x1)
    return x2_f_x1**2 * (
        1.0 / (f_x1[..., 0, :] ** 2 + f_x1[..., 1, :] ** 2 + _EPS)
        + 1.0 / (ft_x2[..., 0, :] ** 2 + ft_x2[..., 1, :] ** 2 + _EPS)
    )


def hartley_normalize(matches: jnp.ndarray, weights: jnp.ndarray | None = None, eps: float = 1e-8):
    """Hartley normalization of a (batch of) point sets for the 8PC solver.

    Translates each image's points to their mass point and scales so the
    average distance from it is √2 (reference
    ``fundamental_matrix_estimator.py:177-217``). Supports a per-point
    validity/weight mask so padded point sets keep static shapes.

    Args:
        matches: (..., N, 4).
        weights: optional (..., N) non-negative mask/weights; a point with
            weight 0 does not influence the normalization statistics.

    Returns:
        (normalized (..., N, 4), T1 (..., 3, 3), T2t (..., 3, 3)) where the
        denormalized model is ``T2t @ F_norm @ T1`` — T2t is the transposed
        second-image transform, matching the reference's layout
        (``fundamental_matrix_estimator.py:204-215, 256-258``).
    """
    if weights is None:
        w = jnp.ones(matches.shape[:-1], matches.dtype)
    else:
        w = weights.astype(matches.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True) + eps
    mass = jnp.sum(matches * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    centered = matches - mass
    d1 = jnp.linalg.norm(centered[..., :2], axis=-1)
    d2 = jnp.linalg.norm(centered[..., 2:], axis=-1)
    avg1 = jnp.sum(d1 * w, axis=-1) / wsum[..., 0]
    avg2 = jnp.sum(d2 * w, axis=-1) / wsum[..., 0]
    ratio1 = jnp.sqrt(2.0) / (avg1 + eps)
    ratio2 = jnp.sqrt(2.0) / (avg2 + eps)
    n1 = centered[..., :2] * ratio1[..., None, None]
    n2 = centered[..., 2:] * ratio2[..., None, None]

    zeros = jnp.zeros_like(ratio1)
    ones = jnp.ones_like(ratio1)
    m = mass[..., 0, :]
    t1 = jnp.stack(
        [
            jnp.stack([ratio1, zeros, -ratio1 * m[..., 0]], axis=-1),
            jnp.stack([zeros, ratio1, -ratio1 * m[..., 1]], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    # T2 transposed: translation lives in the bottom row.
    t2t = jnp.stack(
        [
            jnp.stack([ratio2, zeros, zeros], axis=-1),
            jnp.stack([zeros, ratio2, zeros], axis=-1),
            jnp.stack([-ratio2 * m[..., 2], -ratio2 * m[..., 3], ones], axis=-1),
        ],
        axis=-2,
    )
    return jnp.concatenate([n1, n2], axis=-1), t1, t2t


def normalize_pts(pts: jnp.ndarray, im_size: jnp.ndarray) -> jnp.ndarray:
    """Image-size coordinate normalization (reference ``cv_utils.py:7-20``).

    ``im_size`` is (height, width). Rescales so the max image dimension maps
    to a unit range, centered. Matches the dataset-side convention
    (``/root/reference/datasets.py:74-79``): subtract the center first, then
    divide by max dimension.
    """
    center = jnp.stack([im_size[1] / 2, im_size[0] / 2]).astype(pts.dtype)
    return (pts - center) / jnp.max(im_size).astype(pts.dtype)


def denormalize_pts(pts: jnp.ndarray, im_size: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`normalize_pts` (reference ``cv_utils.py:35-45``)."""
    center = jnp.stack([im_size[1] / 2, im_size[0] / 2]).astype(pts.dtype)
    return pts * jnp.max(im_size).astype(pts.dtype) + center


def normalize_keypoints(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Calibration normalization (reference ``feature_utils.py:40-49``).

    Equivalent to ``cv2.undistortPoints`` with no distortion: subtract the
    principal point and divide by the focal lengths.
    """
    c = jnp.stack([K[0, 2], K[1, 2]]).astype(pts.dtype)
    f = jnp.stack([K[0, 0], K[1, 1]]).astype(pts.dtype)
    return (pts - c) / f


def denormalize_keypoints(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    c = jnp.stack([K[0, 2], K[1, 2]]).astype(pts.dtype)
    f = jnp.stack([K[0, 0], K[1, 1]]).astype(pts.dtype)
    return pts * f + c


def essential_from_fundamental(F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """``E = K2ᵀ F K1`` (reference ``loss.py:37``)."""
    return K2.T @ F @ K1


def fundamental_from_essential(E: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """``F = K2⁻ᵀ E K1⁻¹`` (reference ``datasets.py:126``)."""
    return jnp.linalg.inv(K2).T @ E @ jnp.linalg.inv(K1)


def cross_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix of (..., 3) vectors."""
    t0, t1, t2 = t[..., 0], t[..., 1], t[..., 2]
    zeros = jnp.zeros_like(t0)
    return jnp.stack(
        [
            jnp.stack([zeros, -t2, t1], axis=-1),
            jnp.stack([t2, zeros, -t0], axis=-1),
            jnp.stack([-t1, t0, zeros], axis=-1),
        ],
        axis=-2,
    )


def essential_from_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """``E = [t]× R`` (reference ``datasets.py:115-123``)."""
    return cross_matrix(t) @ R
