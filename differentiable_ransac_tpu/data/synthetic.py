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


def _frustum_points(rng, n, tan_x, tan_y, z_near, z_far, planar: bool):
    """3D points inside camera-1's frustum. ``planar`` puts them on a random
    tilted plane with small thickness (quasi-degenerate scene)."""
    z = rng.uniform(z_near, z_far, size=n)
    x = rng.uniform(-0.9, 0.9, size=n) * tan_x * z
    y = rng.uniform(-0.9, 0.9, size=n) * tan_y * z
    X = np.stack([x, y, z], axis=1)
    if planar:
        # project depths onto a plane z = c + a·x + b·y, keep ~2% thickness
        a, b = rng.uniform(-0.25, 0.25, size=2)
        c = rng.uniform(z_near + 1.0, z_far - 1.0)
        z_pl = c + a * x + b * y + rng.normal(scale=0.02 * c, size=n)
        z_pl = np.clip(z_pl, z_near * 0.5, z_far * 1.5)
        X = np.stack([x / z * z_pl, y / z * z_pl, z_pl], axis=1)
    return X


def _roll_angle_deg(R: np.ndarray) -> float:
    """Apparent in-plane rotation of R (what SIFT orientations see)."""
    return float(np.degrees(np.arctan2(R[1, 0], R[0, 0])))


def realistic_two_view_problem(
    n_points: int = 500,
    noise: float = 1.0,
    outlier_ratio: float = 0.3,
    seed: int = 0,
    scene_type: str | None = None,
):
    """A distribution-honest synthetic two-view problem (VERDICT r4 task 2).

    Differences from :func:`two_view_problem` (which stays fixed — the unit
    tests calibrate thresholds against it):

    * **Varied intrinsics**: per-camera focal (log-uniform 600–2400 px),
      non-square image sizes, jittered principal points, K1 ≠ K2.
    * **Scene mixture**: ``general`` box scenes, ``planar`` quasi-degenerate
      scenes (points on a tilted plane — the regime where E/F estimation
      actually differentiates engines), and ``forward`` motion (epipole in
      the image, small-parallax geometry).
    * **Keypoint-pool mismatch outliers**: an outlier pairs image-1 keypoint
      *i* with the true image-2 projection of a DIFFERENT 3D point *j*
      (what descriptor mismatching produces), only ~20% are uniform junk —
      matching real SIFT statistics instead of uniform image-2 noise.
    * **Correlated side channels** (what the reference's 7-channel CLNet
      input exists to exploit, ``/root/reference/datasets.py:67-95``,
      ``model_cl.py:386``): SNN ratios low for inliers / near-1 for
      outliers with overlapping tails; feature scale ratios consistent
      with per-point depth change × focal ratio for inliers; orientation
      differences clustering around the camera's apparent roll for
      inliers. Outlier side channels come from the mismatched keypoint.

    Returns the :func:`two_view_problem` dict plus ``K1``, ``K2``,
    ``im_size1``, ``im_size2``, ``ratios``, ``f_size1``, ``f_size2``,
    ``ang1``, ``ang2`` and ``scene_type``.

    Note: applying the reference's Lowe filter (ratio < 0.8) to these
    records removes ~25% of outliers and ~1% of inliers, so the effective
    post-filter outlier ratio is lower than ``outlier_ratio`` — exactly the
    behavior the filter exists for on real data.
    """
    rng = np.random.default_rng(seed)
    if scene_type is None:
        scene_type = rng.choice(["general", "planar", "forward"],
                                p=[0.6, 0.2, 0.2])

    # ---- intrinsics: two distinct cameras -------------------------------
    def camera():
        W = float(rng.integers(960, 2048))
        H = W * rng.uniform(0.55, 1.0)
        f = float(np.exp(rng.uniform(np.log(600.0), np.log(2400.0))))
        pp = np.array([W / 2 + rng.uniform(-0.03, 0.03) * W,
                       H / 2 + rng.uniform(-0.03, 0.03) * H])
        K = np.array([[f, 0.0, pp[0]], [0.0, f, pp[1]], [0.0, 0.0, 1.0]])
        return K, np.array([H, W]), f

    K1, im_size1, f1 = camera()
    K2, im_size2, f2 = camera()

    # ---- relative pose by scene type (retried if the frustums barely
    # overlap — a wide rotation plus an unlucky baseline can leave no
    # co-visible volume; the angle range narrows with each retry) --------
    tan_x1 = (im_size1[1] / 2) / f1
    tan_y1 = (im_size1[0] / 2) / f1
    z_near, z_far = 4.0, 12.0
    for attempt in range(16):
        shrink = 0.75 ** attempt
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        if scene_type == "forward":
            angle = rng.uniform(np.radians(2), np.radians(10)) * shrink
        else:
            angle = rng.uniform(np.radians(5), np.radians(45)) * shrink
        K_axis = np.array([
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ])
        R = (np.eye(3) + np.sin(angle) * K_axis
             + (1 - np.cos(angle)) * (K_axis @ K_axis))
        if scene_type == "forward":
            t = np.array([0.0, 0.0, -1.0]) + 0.15 * rng.normal(size=3)
        else:
            t = rng.normal(size=3)
        t = t / np.linalg.norm(t)
        # baseline length relative to scene depth (narrow .. wide)
        baseline = rng.uniform(0.3, 1.6) * shrink

        # ---- 3D points: resample until visible in both cameras ----------
        X = np.zeros((n_points, 3))
        need = np.ones(n_points, bool)
        for _ in range(64):
            n_need = int(need.sum())
            if n_need == 0:
                break
            cand = _frustum_points(rng, n_need, tan_x1, tan_y1, z_near, z_far,
                                   planar=(scene_type == "planar"))
            Xc2 = cand @ R.T + baseline * t
            ok = Xc2[:, 2] > 0.5
            x2c = Xc2[:, :2] / Xc2[:, 2:3]
            px2 = x2c * f2 + np.array([K2[0, 2], K2[1, 2]])
            ok &= ((px2[:, 0] > 0) & (px2[:, 0] < im_size2[1])
                   & (px2[:, 1] > 0) & (px2[:, 1] < im_size2[0]))
            idx = np.flatnonzero(need)[ok]
            X[idx] = cand[ok]
            need[idx] = False
        if (~need).sum() >= max(16, n_points // 10):
            break
    good = np.flatnonzero(~need)
    if good.size == 0:
        raise RuntimeError("realistic_two_view_problem: no visible points")
    if need.any():  # fill the stragglers from already-placed points
        X[need] = X[rng.choice(good, int(need.sum()))]

    d1 = X[:, 2].copy()
    Xc2 = X @ R.T + baseline * t
    d2 = Xc2[:, 2].copy()
    x1 = X[:, :2] / X[:, 2:3]
    x2 = Xc2[:, :2] / Xc2[:, 2:3]

    # ---- keypoint attributes in each image ------------------------------
    # SIFT scale ~ feature size / depth; orientations uniform in image 1
    world_scale = np.exp(rng.uniform(np.log(2.0), np.log(24.0), size=n_points))
    s1 = world_scale * f1 / d1 / 1000.0
    s2_true = (world_scale * f2 / d2 / 1000.0
               * np.exp(rng.normal(scale=0.15, size=n_points)))
    ang1 = rng.uniform(0, 360, size=n_points)
    roll = _roll_angle_deg(R)
    ang2_true = (ang1 + roll + rng.normal(scale=8.0, size=n_points)) % 360.0

    # ---- outliers: descriptor mismatches from the keypoint pool ---------
    n_out = int(n_points * outlier_ratio)
    inlier_mask = np.ones(n_points, bool)
    m2 = x2.copy()
    s2 = s2_true.copy()
    ang2 = ang2_true.copy()
    if n_out:
        out_idx = rng.choice(n_points, n_out, replace=False)
        inlier_mask[out_idx] = False
        # 80%: wrong-but-real keypoint from the pool (j != i)
        shift = rng.integers(1, n_points, size=n_out)
        j = (out_idx + shift) % n_points
        m2[out_idx] = x2[j]
        s2[out_idx] = s2_true[j]
        ang2[out_idx] = ang2_true[j]
        # 20%: uniform junk inside image 2
        n_junk = max(1, n_out // 5)
        junk = rng.choice(out_idx, n_junk, replace=False)
        px = np.stack([rng.uniform(0, im_size2[1], n_junk),
                       rng.uniform(0, im_size2[0], n_junk)], axis=1)
        m2[junk] = (px - np.array([K2[0, 2], K2[1, 2]])) / f2
        s2[junk] = np.exp(rng.uniform(np.log(1.0), np.log(6.0), n_junk))
        ang2[junk] = rng.uniform(0, 360, n_junk)

    # ---- SNN ratios: the dominant learned cue ---------------------------
    ratios = np.where(
        inlier_mask,
        np.clip(rng.normal(0.45, 0.13, n_points), 0.05, 1.0),
        np.clip(rng.normal(0.72, 0.13, n_points), 0.05, 1.0),
    ).astype(np.float32)

    # ---- pixel noise (per-camera focal) ---------------------------------
    m1 = x1 + rng.normal(scale=noise / f1, size=(n_points, 2))
    m2 = m2 + rng.normal(scale=noise / f2, size=(n_points, 2))

    matches = np.concatenate([m1, m2], axis=1)
    px1 = m1 * f1 + np.array([K1[0, 2], K1[1, 2]])
    px2 = m2 * f2 + np.array([K2[0, 2], K2[1, 2]])
    matches_px = np.concatenate([px1, px2], axis=1)

    E = essential_from_pose(R, baseline * t)
    E = E / np.linalg.norm(E)
    F = np.linalg.inv(K2).T @ E @ np.linalg.inv(K1)

    return {
        "matches": matches.astype(np.float32),
        "matches_px": matches_px.astype(np.float32),
        "E": E.astype(np.float32),
        "F": (F / np.linalg.norm(F)).astype(np.float32),
        "R": R.astype(np.float32),
        "t": (baseline * t).astype(np.float32),
        "K": K1.astype(np.float32),
        "K1": K1.astype(np.float32),
        "K2": K2.astype(np.float32),
        "im_size": im_size1.astype(np.float32),
        "im_size1": im_size1.astype(np.float32),
        "im_size2": im_size2.astype(np.float32),
        "inlier_mask": inlier_mask,
        "ratios": ratios,
        "f_size1": s1.astype(np.float32),
        "f_size2": s2.astype(np.float32),
        "ang1": ang1.astype(np.float32),
        "ang2": ang2.astype(np.float32),
        "scene_type": str(scene_type),
    }


def rigid_problem(n_points: int = 200, noise: float = 0.0, outlier_ratio: float = 0.0,
                  seed: int = 0, mismatch_outliers: float = 0.0):
    """3D registration problem: (N, 6) correspondences + GT (4, 4) transform.

    ``mismatch_outliers``: fraction of outliers drawn as wrong-but-real
    point-pool mismatches (``ref[i] ≈ R·src[j] + t`` for j≠i — what a
    descriptor matcher actually produces) instead of uniform junk. Default
    0 keeps the historical distribution the unit tests calibrate against;
    the corpus writer passes 0.8 (VERDICT r4 task 2 realism).
    """
    rng = np.random.default_rng(seed)
    R = random_rotation(rng)
    t = rng.normal(size=3)
    src = rng.uniform(-1, 1, size=(n_points, 3))
    ref_true = src @ R.T + t
    ref = ref_true + rng.normal(scale=noise, size=(n_points, 3))
    inlier_mask = np.ones(n_points, bool)
    n_out = int(n_points * outlier_ratio)
    if n_out:
        idx = rng.choice(n_points, n_out, replace=False)
        inlier_mask[idx] = False
        n_mis = int(round(n_out * mismatch_outliers))
        if n_mis:
            shift = rng.integers(1, n_points, size=n_mis)
            j = (idx[:n_mis] + shift) % n_points
            ref[idx[:n_mis]] = (ref_true[j]
                                + rng.normal(scale=max(noise, 1e-3),
                                             size=(n_mis, 3)))
        if n_out > n_mis:
            ref[idx[n_mis:]] = rng.uniform(-2, 2, size=(n_out - n_mis, 3))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return {
        "points": np.concatenate([src, ref], axis=1).astype(np.float32),
        "transform": T.astype(np.float32),
        "inlier_mask": inlier_mask,
    }
