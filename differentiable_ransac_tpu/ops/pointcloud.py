"""Point-cloud utilities for the 3D-registration workload.

Numpy counterparts of the reference's
``geotransformer/utils/pointcloud.py`` helpers (``:43-273``): transform
application/composition/inversion, random rotations, keypoint sampling with
NMS, and depth-image back-projection.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def apply_transform(points: np.ndarray, transform: np.ndarray,
                    normals: Optional[np.ndarray] = None):
    """(N, 3) through (4, 4); normals rotate only
    (reference ``pointcloud.py:43-51``)."""
    R, t = transform[:3, :3], transform[:3, 3]
    out = points @ R.T + t
    if normals is not None:
        return out, normals @ R.T
    return out


def nearest_neighbor(q_points: np.ndarray, s_points: np.ndarray,
                     return_index: bool = False):
    """Nearest support point per query point
    (reference ``pointcloud.py:11-22``)."""
    from scipy.spatial import cKDTree

    distances, indices = cKDTree(s_points).query(q_points, k=1)
    return (distances, indices) if return_index else distances


def regularize_normals(points: np.ndarray, normals: np.ndarray,
                       positive: bool = True) -> np.ndarray:
    """Flip normals so the origin lies on their positive (or negative) side
    (reference ``pointcloud.py:25-40``)."""
    toward_origin = -(points * normals).sum(axis=-1, keepdims=True) > 0
    sign = np.where(toward_origin, 1.0, -1.0)
    if not positive:
        sign = -sign
    return normals * sign


def transform_from_rotation_translation(R: np.ndarray,
                                        t: np.ndarray) -> np.ndarray:
    """(3, 3) + (3,) -> (4, 4) (reference ``pointcloud.py:65-78``)."""
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def rotation_translation_from_transform(T: np.ndarray):
    """(4, 4) -> ((3, 3), (3,)) (reference ``pointcloud.py:81-93``)."""
    return T[:3, :3], T[:3, 3]


def compose_transforms(*transforms: np.ndarray) -> np.ndarray:
    """T = T_n ∘ … ∘ T_1: apply transforms[0] first
    (reference ``pointcloud.py:54-76``)."""
    out = np.eye(4)
    for T in transforms:
        out = T @ out
    return out


def inverse_transform(transform: np.ndarray) -> np.ndarray:
    """Rigid inverse: (Rᵀ, −Rᵀt) (reference ``pointcloud.py:79-109``)."""
    R, t = transform[:3, :3], transform[:3, 3]
    inv = np.eye(4)
    inv[:3, :3] = R.T
    inv[:3, 3] = -R.T @ t
    return inv


def random_rotation(rotation_factor: float = 1.0,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random z-up-biased rotation as a (4, 4) transform
    (reference ``pointcloud.py:112-133`` samples Euler angles scaled by the
    rotation factor)."""
    rng = rng or np.random.default_rng()
    euler = rng.uniform(-1.0, 1.0, 3) * np.pi * rotation_factor
    cx, cy, cz = np.cos(euler)
    sx, sy, sz = np.sin(euler)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = Rz @ Ry @ Rx
    return T


def random_rotation_v2(rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Uniform-axis random rotation, angle ∈ [0, π)
    (reference ``pointcloud.py:119-125``) — built from the axis-angle
    (Rodrigues) form instead of scipy Euler composition."""
    rng = rng or np.random.default_rng()
    axis = rng.uniform(-0.5, 0.5, 3)
    axis = axis / (np.linalg.norm(axis) + 1e-8)
    theta = np.pi * rng.uniform()
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def random_transform(rotation_magnitude_deg: float,
                     translation_magnitude: float,
                     rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random (4, 4) rigid transform with bounded rotation (degrees) and
    translation (reference ``pointcloud.py:128-136``)."""
    rng = rng or np.random.default_rng()
    T = random_rotation(rotation_magnitude_deg / 180.0, rng)
    T[:3, 3] = rng.uniform(-translation_magnitude, translation_magnitude, 3)
    return T


def random_sample_keypoint_indices(
        n_points: int, num: int,
        scores: Optional[np.ndarray] = None,
        rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Uniform (or score-weighted, without replacement) keypoint subset
    (reference ``pointcloud.py:139-179`` random/with-scores variants —
    index-based; slice points/feats with the result)."""
    rng = rng or np.random.default_rng()
    if n_points <= num:
        return np.arange(n_points)
    p = None if scores is None else scores / np.sum(scores)
    return rng.choice(n_points, num, replace=False, p=p)


def sample_keypoints_with_nms(
        points: np.ndarray, scores: np.ndarray, num: int, radius: float,
        weighted: bool = False,
        rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """NMS keypoint selection: greedy radius suppression in score order,
    then either the top ``num`` survivors (``weighted=False``, reference
    ``pointcloud.py:182-207``) or a score-weighted random subset of the
    survivors (``weighted=True``, ``:210-239``). Returns indices."""
    survivors = sample_keypoints(points, scores, len(points), nms_radius=radius)
    if len(survivors) <= num:
        return survivors
    if not weighted:
        return survivors[:num]
    rng = rng or np.random.default_rng()
    p = scores[survivors] / np.sum(scores[survivors])
    return rng.choice(survivors, num, replace=False, p=p)


def sample_keypoints(points: np.ndarray, scores: np.ndarray, num: int,
                     nms_radius: Optional[float] = None) -> np.ndarray:
    """Top-scoring keypoint indices, optionally with radius NMS
    (reference ``pointcloud.py:139-239``)."""
    order = np.argsort(-scores)
    if nms_radius is None:
        return order[:num]
    from scipy.spatial import cKDTree

    selected: list = []
    suppressed = np.zeros(len(points), bool)
    tree = cKDTree(points)
    for i in order:
        if suppressed[i]:
            continue
        selected.append(i)
        if len(selected) >= num:
            break
        for j in tree.query_ball_point(points[i], nms_radius):
            suppressed[j] = True
    return np.asarray(selected, np.int64)


def depth_to_points(depth: np.ndarray, intrinsics: np.ndarray,
                    depth_scale: float = 1.0, depth_limit: float = 6.0) -> np.ndarray:
    """Back-project a depth image to a 3D point cloud
    (reference ``pointcloud.py:245-273``).

    Args:
        depth: (H, W) depth image.
        intrinsics: (3, 3) camera matrix.

    Returns:
        (M, 3) valid points (0 < z < depth_limit).
    """
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    z = depth / depth_scale
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    z_flat = z.reshape(-1)
    return pts[(z_flat > 0) & (z_flat < depth_limit)]
