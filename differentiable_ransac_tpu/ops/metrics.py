"""Evaluation metrics: AUC, F-matrix F1/epipolar error, registration errors.

Numpy/JAX re-implementations of the reference's metric stack
(``/root/reference/cv_utils.py:528-677``, ``registration_utils.py:18-156``),
kept numerically identical so published numbers are comparable.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-11


def auc(losses, thresholds=(5, 10, 20), binsize=5):
    """AUC of the cumulative error histogram (reference ``cv_utils.py:528-546``).

    Args:
        losses: 1-D array-like of per-pair errors (degrees).
        thresholds: thresholds (same unit) to report AUC up to.
        binsize: histogram bin width.

    Returns:
        list of AUC values, one per threshold.
    """
    losses = np.asarray(losses, dtype=np.float64)
    bin_num = int(max(thresholds) / binsize)
    bins = np.arange(bin_num + 1) * binsize
    hist, _ = np.histogram(losses, bins)
    hist = hist.astype(np.float32) / max(len(losses), 1)
    hist = np.cumsum(hist)
    return [float(np.mean(hist[: int(t / binsize)])) for t in thresholds]


def epipolar_errors(hom_pts1: np.ndarray, hom_pts2: np.ndarray, F: np.ndarray) -> np.ndarray:
    """Symmetric epipolar error (un-squared), reference ``cv_utils.py:618-623``.

    Args:
        hom_pts1, hom_pts2: (3, N) homogeneous points.
        F: (3, 3).
    """
    res = 1.0 / (np.linalg.norm(F.T.dot(hom_pts2)[0:2], axis=0) + _EPS)
    res = res + 1.0 / (np.linalg.norm(F.dot(hom_pts1)[0:2], axis=0) + _EPS)
    res = res * np.abs(np.sum(hom_pts2 * np.matmul(F, hom_pts1), axis=0))
    return res


def f_error(pts1: np.ndarray, pts2: np.ndarray, F: np.ndarray, gt_F: np.ndarray, threshold: float):
    """F-matrix evaluation following Ranftl–Koltun (reference ``cv_utils.py:594-650``).

    Args:
        pts1, pts2: (2, N) image points (pixels).
        F, gt_F: (3, 3).
        threshold: inlier threshold in px.

    Returns:
        (valid, F1, inlier_ratio, mean_epi_error_of_gt_close_inliers).
    """
    num_pts = pts1.shape[1]
    hom_pts1 = np.concatenate((pts1, np.ones((1, num_pts))), axis=0)
    hom_pts2 = np.concatenate((pts2, np.ones((1, num_pts))), axis=0)

    est_res = epipolar_errors(hom_pts1, hom_pts2, F)
    gt_res = epipolar_errors(hom_pts1, hom_pts2, gt_F)
    est_inliers = est_res < threshold
    gt_inliers = gt_res < threshold

    true_positives = est_inliers & gt_inliers
    gt_count = float(gt_inliers.sum())
    if gt_count <= 0:
        return False, 0.0, 0.0, 0.0
    est_count = float(est_inliers.sum())
    tp = float(true_positives.sum())
    precision = tp / (est_count + _EPS)
    recall = tp / (gt_count + _EPS)
    f1 = 2 * precision * recall / (precision + recall + _EPS)
    inliers = est_count / num_pts
    epi_mask = gt_res < 1
    if epi_mask.sum() == 0:
        return False, 0.0, 0.0, 0.0
    epi_error = float(est_res[epi_mask].mean())
    return True, f1, inliers, epi_error


def pose_error(R: np.ndarray, gt_R: np.ndarray, t: np.ndarray, gt_t: np.ndarray):
    """Angular rotation/translation errors in degrees (reference
    ``cv_utils.py:653-677``)."""
    dR = np.matmul(R, np.transpose(gt_R))
    angle = np.degrees(np.arccos(np.clip((np.trace(dR) - 1.0) * 0.5, -1.0, 1.0)))
    dT = float(np.dot(gt_t.T, t).squeeze())
    dT /= float(np.linalg.norm(gt_t) * np.linalg.norm(t) + _EPS)
    dT = max(-1.0, min(1.0, dT))
    dT = np.degrees(np.arccos(dT))
    return float(angle), float(dT)


# ---------------------------------------------------------------------------
# 3D registration metrics (reference registration_utils.py)
# ---------------------------------------------------------------------------

def apply_transform(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """(N, 3) points through a (4, 4) rigid transform
    (reference ``geotransformer/utils/pointcloud.py:43-51``)."""
    R, t = transform[:3, :3], transform[:3, 3]
    return points @ R.T + t


def relative_rotation_error(gt_R: np.ndarray, R: np.ndarray) -> float:
    """RRE in degrees (reference ``registration_utils.py:18-34``)."""
    x = 0.5 * (np.trace(np.matmul(R.T, gt_R)) - 1.0)
    return float(np.degrees(np.arccos(np.clip(x, -1.0, 1.0))))


def relative_translation_error(gt_t: np.ndarray, t: np.ndarray) -> float:
    """RTE (reference ``registration_utils.py:37-49``)."""
    return float(np.linalg.norm(gt_t - t))


def compute_registration_error(gt_transform: np.ndarray, transform: np.ndarray):
    """(RRE, RTE) (reference ``registration_utils.py:52-67``)."""
    rre = relative_rotation_error(gt_transform[:3, :3], transform[:3, :3])
    rte = relative_translation_error(gt_transform[:3, 3], transform[:3, 3])
    return rre, rte


def registration_rmse(src_points: np.ndarray, gt_transform: np.ndarray, transform: np.ndarray) -> float:
    """RMSE between points moved by GT vs estimated transform
    (reference ``registration_utils.py:95-111``)."""
    gt = apply_transform(src_points, gt_transform)
    est = apply_transform(src_points, transform)
    return float(np.sqrt(np.mean(np.sum((gt - est) ** 2, axis=1))))


def registration_recall(rmses, threshold: float = 0.2) -> float:
    """Registration recall = mean(RMSE < threshold)
    (reference ``test_magsac_point.py:63-72``)."""
    rmses = np.asarray(rmses)
    return float(np.mean(rmses < threshold)) if rmses.size else 0.0


def inlier_ratio_3d(src: np.ndarray, ref: np.ndarray, transform: np.ndarray, tau: float = 0.1) -> float:
    """Fraction of correspondences within tau after transforming src
    (reference ``registration_utils.py:142-147``)."""
    moved = apply_transform(src, transform)
    residuals = np.linalg.norm(ref - moved, axis=1)
    return float(np.mean(residuals < tau))


def modified_chamfer_distance(raw_points, ref_points, src_points,
                              gt_transform, est_transform) -> float:
    """Modified chamfer distance (RPMNet formulation; reference
    ``registration_utils.py:114-131``): ``d(T·src → raw) + d(ref →
    (T·gt⁻¹)·raw)``."""
    from scipy.spatial import cKDTree

    aligned_src = apply_transform(src_points, est_transform)
    d_pq = cKDTree(raw_points).query(aligned_src)[0].mean()
    composed = est_transform @ np.linalg.inv(gt_transform)
    aligned_raw = apply_transform(raw_points, composed)
    d_qp = cKDTree(aligned_raw).query(ref_points)[0].mean()
    return float(d_pq + d_qp)


def overlap_ratio(ref_points: np.ndarray, src_points: np.ndarray,
                  transform: np.ndarray | None = None,
                  positive_radius: float = 0.1) -> float:
    """Fraction of ref points with a src neighbor within radius after
    alignment (reference ``registration_utils.py:150-156``)."""
    from scipy.spatial import cKDTree

    if transform is not None:
        src_points = apply_transform(src_points, transform)
    dists, _ = cKDTree(src_points).query(ref_points)
    return float(np.mean(dists < positive_radius))


def ground_truth_correspondences(ref_points: np.ndarray, src_points: np.ndarray,
                                 transform: np.ndarray, matching_radius: float):
    """GT correspondence pairs via nearest-neighbor search after alignment
    (reference ``registration_utils.py:162-174``).

    Returns (ref_idx, src_idx) arrays of matched pairs within the radius.
    """
    from scipy.spatial import cKDTree

    src_aligned = apply_transform(src_points, transform)
    dists, idx = cKDTree(src_aligned).query(ref_points)
    keep = dists < matching_radius
    return np.nonzero(keep)[0], idx[keep]


def correspondence_precision_recall(pred_ref_idx, pred_src_idx,
                                    gt_ref_idx, gt_src_idx):
    """Sparse-correspondence precision/recall (reference
    ``registration_utils.py:254-282``)."""
    gt = set(zip(np.asarray(gt_ref_idx).tolist(), np.asarray(gt_src_idx).tolist()))
    pred = list(zip(np.asarray(pred_ref_idx).tolist(), np.asarray(pred_src_idx).tolist()))
    if not pred or not gt:
        return 0.0, 0.0
    hits = sum(1 for p in pred if p in gt)
    return hits / len(pred), hits / len(gt)


# ---------------------------------------------------------------------------
# Orientation / scale errors of epipolar models (reference cv_utils.py:430-475)
# ---------------------------------------------------------------------------

def orientation_error(pts1: np.ndarray, pts2: np.ndarray, M: np.ndarray,
                      ang: np.ndarray) -> np.ndarray:
    """Angular deviation between epipolar-line normals vs SIFT orientation
    difference (reference ``cv_utils.py:430-456``)."""
    n = pts1.shape[0]
    h1 = np.concatenate([pts1, np.ones((n, 1))], axis=1)
    h2 = np.concatenate([pts2, np.ones((n, 1))], axis=1)
    l1 = (M.T @ h2.T)[0:2]  # (2, N)
    l2 = (M @ h1.T)[0:2]
    n1 = l1 / (np.linalg.norm(l1, axis=0, keepdims=True) + _EPS)
    n2 = l2 / (np.linalg.norm(l2, axis=0, keepdims=True) + _EPS)
    alpha = np.arccos(np.clip(np.sum(n1 * n2, axis=0), -1.0, 1.0))
    return np.abs(alpha - np.asarray(ang).reshape(-1))


def scale_error(pts1: np.ndarray, pts2: np.ndarray, M: np.ndarray,
                scale_ratio: np.ndarray) -> float:
    """Scale consistency of epipolar line norms (reference
    ``cv_utils.py:459-475``)."""
    n = pts1.shape[0]
    h1 = np.concatenate([pts1, np.ones((n, 1))], axis=1)
    h2 = np.concatenate([pts2, np.ones((n, 1))], axis=1)
    l1 = (M.T @ h2.T)[0:2]
    l2 = (M @ h1.T)[0:2]
    l1_norm = np.linalg.norm(np.asarray(scale_ratio).reshape(-1) * l1)
    l2_norm = np.linalg.norm(l2)
    return float(abs(l1_norm - l2_norm))
