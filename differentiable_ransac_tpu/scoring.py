"""Hypothesis scoring: soft MSAC over Sampson distances.

Numerically identical to the reference MSAC scorer
(``/root/reference/scorings/msac_score.py:12-55``): squared threshold
``((3/2)·t)²``, inlier mask ``d² < τ²``, soft score
``Σ clamp(1 − d²/τ², min=0)``.

TPU design: one fused evaluation of all H models against all N points — the
Sampson numerator/denominator are two (H,3,3)×(3,N) MXU contractions; XLA
fuses the elementwise tail. A Pallas kernel fusing the whole N×H pass in
VMEM is the planned fast path for very large H·N.
"""

from __future__ import annotations

import jax.numpy as jnp

from differentiable_ransac_tpu.ops.epipolar import sampson_squared


def msac_threshold(threshold: float):
    """Squared soft-inlier threshold (reference ``msac_score.py:21``)."""
    return (1.5 * threshold) ** 2


def msac_score(
    matches: jnp.ndarray,
    models: jnp.ndarray,
    threshold,
    point_mask: jnp.ndarray | None = None,
):
    """Score a batch of models.

    Args:
        matches: (N, 4).
        models: (..., 3, 3).
        threshold: unsquared threshold (already focal-normalized for E).
        point_mask: optional (N,) validity of padded points.

    Returns:
        (scores (...,), inlier_masks (..., N)).
    """
    sq_threshold = msac_threshold(threshold)
    d2 = sampson_squared(models, matches)
    inliers = d2 < sq_threshold
    soft = jnp.clip(1.0 - d2 / sq_threshold, 0.0, None)
    if point_mask is not None:
        inliers = inliers & (point_mask > 0)
        soft = soft * point_mask
    return jnp.sum(soft, axis=-1), inliers


def rigid_msac_score(
    points: jnp.ndarray,
    models: jnp.ndarray,
    threshold: float,
    point_mask: jnp.ndarray | None = None,
):
    """MSAC scoring for rigid models over (N, 6) 3D correspondences, using the
    squared transfer distance (reference ``rigid_…_solver.py:76-89`` residual
    with the MSAC soft-inlier aggregation)."""
    from differentiable_ransac_tpu.solvers.rigid import rigid_squared_residual

    sq_threshold = threshold**2
    d2, _ = rigid_squared_residual(points[:, :3], points[:, 3:], models)
    inliers = d2 < sq_threshold
    soft = jnp.clip(1.0 - d2 / sq_threshold, 0.0, None)
    if point_mask is not None:
        inliers = inliers & (point_mask > 0)
        soft = soft * point_mask
    return jnp.sum(soft, axis=-1), inliers
