"""Synthetic two-view / 3D-registration problem generators.

Used by the unit tests (the reference has no test suite; its gradient
smoke-check notebook ``kornia_5pc_example.ipynb`` generates random-geometry
problems the same way) and by ``bench.py`` for reproducible benchmarks.
"""

from __future__ import annotations

import numpy as np


def random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform random rotation via QR of a Gaussian matrix."""
    A = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diagonal(R))
    if np.linalg.det(Q) < 0:
        Q[:, 2] = -Q[:, 2]
    return Q


def essential_from_pose(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    tx = np.array([
        [0, -t[2], t[1]],
        [t[2], 0, -t[0]],
        [-t[1], t[0], 0],
    ])
    return tx @ R


def two_view_problem(
    n_points: int = 100,
    noise: float = 0.0,
    outlier_ratio: float = 0.0,
    seed: int = 0,
    focal: float = 1000.0,
    im_size: tuple = (1024, 1024),
):
    """Generate a calibrated two-view problem.

    Camera 1 is canonical [I|0]; camera 2 is [R|t]. 3D points are placed in
    front of both cameras. Correspondences are returned in *calibrated*
    (K-normalized) coordinates (the E-estimation convention of the
    reference's dataset pipeline, ``datasets.py:84-95``) plus the pixel-space
    versions and intrinsics.

    Returns a dict with: matches (N, 4) calibrated, matches_px (N, 4),
    E (3, 3) with x2ᵀEx1=0, F (3, 3) pixel-space, R, t, K, inlier_mask (N,).
    """
    rng = np.random.default_rng(seed)
    # Moderate relative pose (realistic two-view geometry; a fully random
    # rotation yields camera-behind-points configurations whose E is
    # near-degenerate and unrepresentative).
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(np.radians(5), np.radians(30))
    K_axis = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    R = np.eye(3) + np.sin(angle) * K_axis + (1 - np.cos(angle)) * (K_axis @ K_axis)
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t)

    # sample 3D points in front of camera 1
    X = rng.uniform([-2, -2, 4], [2, 2, 12], size=(n_points, 3))

    x1 = X / X[:, 2:3]
    Xc2 = X @ R.T + t
    assert (Xc2[:, 2] > 0.5).all(), "degenerate synthetic configuration"
    x2 = Xc2 / Xc2[:, 2:3]

    m1 = x1[:, :2] + rng.normal(scale=noise / focal, size=(n_points, 2))
    m2 = x2[:, :2] + rng.normal(scale=noise / focal, size=(n_points, 2))

    n_out = int(n_points * outlier_ratio)
    inlier_mask = np.ones(n_points, bool)
    if n_out:
        idx = rng.choice(n_points, n_out, replace=False)
        inlier_mask[idx] = False
        m2[idx] = rng.uniform(-0.5, 0.5, size=(n_out, 2))

    matches = np.concatenate([m1, m2], axis=1)

    K = np.array([
        [focal, 0.0, im_size[1] / 2],
        [0.0, focal, im_size[0] / 2],
        [0.0, 0.0, 1.0],
    ])
    px1 = m1 * focal + np.array([im_size[1] / 2, im_size[0] / 2])
    px2 = m2 * focal + np.array([im_size[1] / 2, im_size[0] / 2])
    matches_px = np.concatenate([px1, px2], axis=1)

    E = essential_from_pose(R, t)
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)

    return {
        "matches": matches.astype(np.float32),
        "matches_px": matches_px.astype(np.float32),
        "E": E.astype(np.float32),
        "F": (F / np.linalg.norm(F)).astype(np.float32),
        "R": R.astype(np.float32),
        "t": t.astype(np.float32),
        "K": K.astype(np.float32),
        "im_size": np.asarray(im_size, np.float32),
        "inlier_mask": inlier_mask,
    }


def rigid_problem(n_points: int = 200, noise: float = 0.0, outlier_ratio: float = 0.0, seed: int = 0):
    """3D registration problem: (N, 6) correspondences + GT (4, 4) transform."""
    rng = np.random.default_rng(seed)
    R = random_rotation(rng)
    t = rng.normal(size=3)
    src = rng.uniform(-1, 1, size=(n_points, 3))
    ref = src @ R.T + t + rng.normal(scale=noise, size=(n_points, 3))
    inlier_mask = np.ones(n_points, bool)
    n_out = int(n_points * outlier_ratio)
    if n_out:
        idx = rng.choice(n_points, n_out, replace=False)
        inlier_mask[idx] = False
        ref[idx] = rng.uniform(-2, 2, size=(n_out, 3))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return {
        "points": np.concatenate([src, ref], axis=1).astype(np.float32),
        "transform": T.astype(np.float32),
        "inlier_mask": inlier_mask,
    }
