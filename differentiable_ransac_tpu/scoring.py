"""Hypothesis scoring: soft MSAC over Sampson distances.

Numerically identical to the reference MSAC scorer
(``/root/reference/scorings/msac_score.py:12-55``): squared threshold
``((3/2)·t)²``, inlier mask ``d² < τ²``, soft score
``Σ clamp(1 − d²/τ², min=0)``.

TPU design: one fused evaluation of all H models against all N points — the
Sampson numerator/denominator are two (H,3,3)×(3,N) MXU contractions; XLA
fuses the elementwise tail; for large H·N the prescreen path
(``RansacConfig.prescreen``) cuts the elementwise tail ~N/prescreen×.
(A Pallas VMEM-fused variant was prototyped and removed: Mosaic cannot
compile through this environment's TPU tunnel — docs/BENCH_TPU.md.)
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


def ransac_score(
    matches: jnp.ndarray,
    models: jnp.ndarray,
    threshold,
    point_mask: jnp.ndarray | None = None,
):
    """Plain RANSAC hard inlier count (the ``-s 0`` criterion): the number
    of points with Sampson ``d² < ((3/2)·t)²`` — same support as the MSAC
    scorer, count instead of truncated-quadratic sum."""
    sq_threshold = msac_threshold(threshold)
    d2 = sampson_squared(models, matches)
    inliers = d2 < sq_threshold
    if point_mask is not None:
        inliers = inliers & (point_mask > 0)
    return jnp.sum(inliers, axis=-1).astype(matches.dtype), inliers


def rigid_ransac_score(
    points: jnp.ndarray,
    models: jnp.ndarray,
    threshold,
    point_mask: jnp.ndarray | None = None,
):
    """Plain RANSAC hard inlier count for rigid models over (N, 6) 3D
    correspondences (transfer-distance support, count instead of soft sum)."""
    from differentiable_ransac_tpu.solvers.rigid import rigid_squared_residual

    d2, _ = rigid_squared_residual(points[:, :3], points[:, 3:], models)
    inliers = d2 < threshold**2
    if point_mask is not None:
        inliers = inliers & (point_mask > 0)
    return jnp.sum(inliers, axis=-1).astype(points.dtype), inliers


def _sigma_marginal_weights(d2: jnp.ndarray, sigma_max, levels: int):
    """Discrete MAGSAC σ-marginalized weight of squared residuals.

    ``w(d²) = (1/K) Σ_{k=1..K} [d² < (3.64 σ_k)²] · exp(−d²/(2σ_k²)) / σ_k``
    with ``σ_k = σ_max·k/K`` — the same marginalization the native polish
    uses (``csrc/sigma_consensus.cpp`` ``sigma_weight``), itself the
    discretized form of MAGSAC++'s integral over the noise scale. The level
    loop is unrolled (K is static) so XLA fuses it into one elementwise
    pass over d² — no (…, N, K) intermediate is materialized.
    """
    acc = jnp.zeros_like(d2)
    for k in range(1, levels + 1):
        sigma = sigma_max * (k / levels)
        tau2 = (3.64 * sigma) ** 2
        acc = acc + jnp.where(
            d2 < tau2, jnp.exp(-d2 / (2.0 * sigma * sigma)) / sigma, 0.0
        )
    return acc / levels


def estimate_sigma(d2: jnp.ndarray, threshold, iters: int = 3,
                   point_mask: jnp.ndarray | None = None):
    """Robust inlier noise-scale estimate from a pilot model's squared
    residuals — the input MAGSAC++ leaves to the user (``sigma_th``).

    Inlier |d| is half-normal with scale σ (median = 0.674 σ). Fixed-point
    iteration: estimate the median inside a 3σ window, divide by 0.674,
    shrink the window — ``iters`` rounds reject the outlier tail. Fixed
    shapes throughout (masked sort, no data-dependent sizes); seeded at the
    user threshold so a grossly misspecified ``t`` still converges to the
    data's own scale within 2-3 rounds.

    Args:
        d2: (N,) squared residuals under the pilot model.
        threshold: seed scale (same units as the residuals).
        point_mask: optional (N,) validity of padded points.

    Returns:
        σ̂ scalar, clipped below at ``threshold/3.64`` (never smaller than
        the support radius the user's own threshold implies).
    """
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    valid0 = jnp.ones_like(d, bool) if point_mask is None else point_mask > 0
    sigma = jnp.asarray(threshold, d.dtype)
    for _ in range(iters):
        w = valid0 & (d < 3.0 * sigma)
        ds = jnp.sort(jnp.where(w, d, jnp.inf))
        k = jnp.clip((jnp.sum(w) // 2).astype(jnp.int32), 0, d.shape[0] - 1)
        med = ds[k]
        # guard: window devoid of points (all inf) keeps the prior sigma
        sigma = jnp.where(jnp.isfinite(med), med / 0.674, sigma)
    return jnp.maximum(sigma, jnp.asarray(threshold, d.dtype) / 3.64)


def magsac_score(
    matches: jnp.ndarray,
    models: jnp.ndarray,
    sigma_max,
    point_mask: jnp.ndarray | None = None,
    levels: int = 10,
):
    """σ-consensus model quality: Σᵢ w(d²ᵢ) over the σ-marginalized weights.

    This is the search-time model-selection criterion of the reference's
    SOTA path (C++ MAGSAC++ ranks models by marginalized quality,
    ``/root/reference/test_magsac.py:61-69``) as a TPU scoring mode: the
    weights are an elementwise function of the same Sampson d² the MSAC
    scorer computes, so the (H,3,3)×(3,N) MXU contractions are shared and
    only the scalar tail differs.

    Args:
        matches: (N, 4).
        models: (..., 3, 3).
        sigma_max: maximum inlier noise scale (already focal-normalized
            for E; same units as the matches).
        point_mask: optional (N,) validity of padded points.
        levels: number of discrete σ levels.

    Returns:
        (scores (...,), inlier_masks (..., N)) — the mask is the support at
        the largest noise level, ``d² < (3.64 σ_max)²``.
    """
    d2 = sampson_squared(models, matches)
    w = _sigma_marginal_weights(d2, sigma_max, levels)
    inliers = d2 < (3.64 * sigma_max) ** 2
    if point_mask is not None:
        inliers = inliers & (point_mask > 0)
        w = w * point_mask
    return jnp.sum(w, axis=-1), inliers


def rigid_magsac_score(
    points: jnp.ndarray,
    models: jnp.ndarray,
    sigma_max,
    point_mask: jnp.ndarray | None = None,
    levels: int = 10,
):
    """σ-consensus quality for rigid models over (N, 6) 3D correspondences
    (transfer-distance residual, same marginalization as the native rigid
    polish ``csrc/sigma_consensus.cpp`` ``sigma_consensus_polish_rigid``)."""
    from differentiable_ransac_tpu.solvers.rigid import rigid_squared_residual

    d2, _ = rigid_squared_residual(points[:, :3], points[:, 3:], models)
    w = _sigma_marginal_weights(d2, sigma_max, levels)
    inliers = d2 < (3.64 * sigma_max) ** 2
    if point_mask is not None:
        inliers = inliers & (point_mask > 0)
        w = w * point_mask
    return jnp.sum(w, axis=-1), inliers


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
