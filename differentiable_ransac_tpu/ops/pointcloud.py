"""Point-cloud utilities for the 3D-registration workload.

Numpy counterparts of the reference's
``geotransformer/utils/pointcloud.py`` helpers (``:43-273``): transform
application/composition/inversion, random rotations, keypoint sampling with
NMS, and depth-image back-projection.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def apply_transform(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """(N, 3) through (4, 4) (reference ``pointcloud.py:43-51``)."""
    R, t = transform[:3, :3], transform[:3, 3]
    return points @ R.T + t


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
