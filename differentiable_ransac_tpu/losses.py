"""Training losses: pose (w0), classification (w1), match/epipolar (w2).

Parity with the reference loss stack (``/root/reference/loss.py``) with the
OpenCV boundary removed: ground-truth inlier masks come from the in-framework
``recover_pose`` cheirality check (:mod:`differentiable_ransac_tpu.ops.pose`)
instead of ``cv2.recoverPose`` (``loss.py:98,126``), and pose errors are the
differentiable tensor formulas (``cv_utils.py:361-400``).

All losses take fixed-shape hypothesis stacks ``(H, 3, 3)`` with validity
masks — the shape-stable analogue of the reference's nan-filtered
variable-length model lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.ops import epipolar, pose


def match_loss(
    models: jnp.ndarray,
    valid: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    gt_mask: jnp.ndarray,
    topk: int = 0,
):
    """Symmetric epipolar error of GT inliers vs every kept hypothesis —
    the best-performing loss of the reference (w2, ``loss.py:107-153``).

    Args:
        models: (H, 3, 3) hypotheses (E, or F lifted to E by the caller).
        valid: (H,) hypothesis validity.
        x1, x2: (N, 2) correspondences in calibrated coords.
        gt_mask: (N,) ground-truth inlier mask (bool/0-1), treated constant.
        topk: if > 0, average only the best-k hypotheses by mean error
            (reference ``loss.py:147-150``).

    Returns:
        scalar loss.
    """
    geod = epipolar.symmetric_epipolar_squared(x1, x2, models)  # (H, N)
    e = jnp.minimum(geod, 1.0)
    gtm = gt_mask.astype(e.dtype)
    denom = jnp.maximum(jnp.sum(gtm), 1.0)
    per_h = jnp.sum(e * gtm[None, :], axis=-1) / denom  # (H,)
    v = valid.astype(e.dtype)
    if topk and topk > 0:
        # best-k hypotheses by mean error; invalid ones rank last
        ranked = jnp.where(valid, per_h, jnp.inf)
        neg_top, _ = jax.lax.top_k(-ranked, topk)
        vals = -neg_top
        ok = jnp.isfinite(vals)
        return jnp.sum(jnp.where(ok, vals, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(per_h * v) / jnp.maximum(jnp.sum(v), 1.0)


def pose_loss(
    models: jnp.ndarray,
    valid: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    gt_R: jnp.ndarray,
    gt_t: jnp.ndarray,
    svd: bool = False,
    chunk: int = 0,
):
    """Average relative-pose error over hypotheses (w0, ``loss.py:11-68``):
    per model, recover (R, t) by cheirality voting and average
    ``(errR + errT)/2`` in degrees. Uses the differentiable Horn
    decomposition by default (``svd=False``), matching the train-time call
    (``train.py`` passes svd=False through ``forward_average``).

    ``chunk > 0`` processes the hypothesis axis in ``lax.map``-sequenced,
    rematerialized chunks: pose recovery triangulates every point under 4
    candidate poses per hypothesis, and at F-mode training shapes the
    batched residual (``B×H×4×N×4×4``) alone is >100 GB — far past HBM
    (measured OOM at B=32, H=1024, N=500). Chunking bounds live
    intermediates to one chunk and ``jax.checkpoint`` recomputes them in
    the backward; the loss is a sum over hypotheses, so the result is
    identical (``tests/test_losses.py``).
    """
    H = models.shape[0]
    if chunk and H > chunk:
        pad = (-H) % chunk
        if pad:
            eye = jnp.broadcast_to(jnp.eye(3, dtype=models.dtype),
                                   (pad, 3, 3))
            models = jnp.concatenate([models, eye], axis=0)
            valid = jnp.concatenate(
                [valid, jnp.zeros((pad,), valid.dtype)], axis=0)
        mc = models.reshape(-1, chunk, 3, 3)
        vc = valid.reshape(-1, chunk)

        @jax.checkpoint
        def body(m_v):
            m, v = m_v
            err_R, err_t = pose.evaluate_pose(m, x1, x2, gt_R, gt_t, svd=svd)
            per_h = (err_R + err_t) / 2.0
            vv = v.astype(per_h.dtype)
            return jnp.sum(per_h * vv), jnp.sum(vv)

        sums, counts = jax.lax.map(body, (mc, vc))
        return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1.0)
    err_R, err_t = pose.evaluate_pose(models, x1, x2, gt_R, gt_t, svd=svd)
    per_h = (err_R + err_t) / 2.0
    v = valid.astype(per_h.dtype)
    return jnp.sum(per_h * v) / jnp.maximum(jnp.sum(v), 1.0)


def classification_loss(weights: jnp.ndarray, gt_mask: jnp.ndarray, eps: float = 1e-7):
    """BCE of predicted inlier weights vs the GT inlier mask
    (w1, ``loss.py:71-104``)."""
    w = jnp.clip(weights, eps, 1.0 - eps)
    y = gt_mask.astype(w.dtype)
    return -jnp.mean(y * jnp.log(w) + (1.0 - y) * jnp.log(1.0 - w))


def essential_from_f_hypotheses(models_F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray):
    """Lift (H, 3, 3) F hypotheses to E: ``E = K2ᵀ F K1``
    (reference ``loss.py:37,118``)."""
    return jnp.einsum("ji,hjk,kl->hil", K2, models_F, K1)
