"""Two-plane scene renderer: real pixel imagery with exact ground truth.

Renders a textured background plane (z = d_bg) plus a foreground square
(z = d_fg) seen by two cameras — per-plane homography warps of real pixel
textures, so the pair is NON-planar (well-posed essential matrix) while
every ground-truth correspondence is known in closed form.

Used by the real-JPEG end-to-end pipeline test (``tests/test_images.py``)
and by the learned-matcher training corpus (``scripts/train_matcher_e2e.py``
— the in-environment stand-in for the reference's LoFTR finetuning data,
``/root/reference/train_ransac_loftr.py:15-40``; no real PhotoTourism
imagery or LoFTR package exists here, but the rendered pairs are real
pixels matched by real correlation, not synthetic feature vectors).
"""

from __future__ import annotations

import numpy as np


def smooth_texture(rng: np.random.Generator, h: int, w: int, cell: int = 8) -> np.ndarray:
    """Smooth random texture with enough structure for patch matching."""
    t = rng.uniform(0, 1, (h // cell + 2, w // cell + 2))
    t = np.kron(t, np.ones((cell, cell)))[:h, :w]
    k = np.ones(5) / 5.0
    for ax in (0, 1):
        t = np.apply_along_axis(lambda v: np.convolve(v, k, mode="same"), ax, t)
    t = t + 0.15 * rng.uniform(0, 1, (h, w))  # high-freq detail
    t = (t - t.min()) / (t.max() - t.min() + 1e-9)
    return t.astype(np.float32)


def bilinear(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    h, w = img.shape
    x0 = np.clip(np.floor(x).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, h - 2)
    fx = np.clip(x - x0, 0, 1)
    fy = np.clip(y - y0, 0, 1)
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)


def _rot_axis(axis: int, deg: float) -> np.ndarray:
    a = np.radians(deg)
    c, s = np.cos(a), np.sin(a)
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    R = np.eye(3)
    R[i, i] = R[j, j] = c
    R[i, j], R[j, i] = (-s, s) if axis != 1 else (s, -s)
    return R


def render_two_plane_pair(seed: int = 0, h: int = 240, w: int = 320,
                          focal: float = 300.0, pose=None,
                          randomize_pose: bool = False):
    """Render one two-plane pair.

    Args:
        seed: texture (and, with ``randomize_pose``, pose) seed.
        pose: optional explicit ``(R, t)``.
        randomize_pose: sample small rotations and a sideways-dominant
            baseline per seed (the matcher-training corpus); default keeps
            the fixed historical pose of the JPEG pipeline test.

    Returns:
        dict with ``img0``/``img1`` (h, w) float32 in [0, 1], ``K``,
        ``R``, ``t``, ``E`` (unit norm), and the plane geometry
        (``d_bg``, ``d_fg``, ``fg_box``) needed to reconstruct GT flow.
    """
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float64)
    rng = np.random.default_rng(seed)
    if pose is not None:
        R, t = pose
    elif randomize_pose:
        R = (_rot_axis(0, rng.uniform(-1.5, 1.5))
             @ _rot_axis(1, rng.uniform(-2.0, 2.0))
             @ _rot_axis(2, rng.uniform(-1.5, 1.5)))
        t = np.array([rng.uniform(-0.7, 0.7), rng.uniform(-0.35, 0.35),
                      rng.uniform(-0.08, 0.08)])
        if np.linalg.norm(t[:2]) < 0.3:  # keep the direction observable
            t[0] = 0.5 * np.sign(t[0] if t[0] != 0 else 1.0)
    else:
        R = _rot_axis(1, 1.5) @ _rot_axis(2, 1.0)
        t = np.array([0.30, 0.10, 0.04])
    d_bg, d_fg = 10.0, 5.0

    tex_bg = smooth_texture(rng, h, w)
    tex_fg = smooth_texture(rng, h, w)
    fg_y = int(rng.integers(h // 4, h // 2)) if randomize_pose else 70
    fg_x = int(rng.integers(w // 4, w // 2)) if randomize_pose else 110
    fg_box = (fg_y, fg_y + 100, fg_x, fg_x + 100)  # y0, y1, x0, x1

    img0 = tex_bg.copy()
    y0b, y1b, x0b, x1b = fg_box
    img0[y0b:y1b, x0b:x1b] = tex_fg[y0b:y1b, x0b:x1b]

    def plane_H(d):
        n = np.array([0.0, 0.0, 1.0])
        return K @ (R + np.outer(t, n) / d) @ np.linalg.inv(K)

    HB_inv = np.linalg.inv(plane_H(d_bg))
    HF_inv = np.linalg.inv(plane_H(d_fg))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    ones = np.ones_like(xs)
    px2 = np.stack([xs, ys, ones], axis=-1)  # (h, w, 3)

    def backmap(Hi):
        q = px2 @ Hi.T
        return q[..., 0] / q[..., 2], q[..., 1] / q[..., 2]

    xb, yb = backmap(HB_inv)
    xf, yf = backmap(HF_inv)
    in_fg = (yf >= y0b) & (yf < y1b) & (xf >= x0b) & (xf < x1b)
    img1 = np.where(in_fg, bilinear(tex_fg, xf, yf), bilinear(tex_bg, xb, yb))

    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    E = E / np.linalg.norm(E)
    return {
        "img0": img0.astype(np.float32),
        "img1": img1.astype(np.float32),
        "K": K,
        "R": R,
        "t": t,
        "E": E,
        "d_bg": d_bg,
        "d_fg": d_fg,
        "fg_box": fg_box,
    }


def gt_flow(scene: dict, pts0: np.ndarray):
    """Exact image-0 → image-1 correspondence for rendered scenes.

    Args:
        scene: :func:`render_two_plane_pair` output.
        pts0: (N, 2) pixel coordinates ``(x, y)`` in image 0.

    Returns:
        (pts1 (N, 2), visible (N,) bool): forward-warped positions via the
        per-plane homographies (foreground square where covered, background
        elsewhere) and an in-bounds visibility mask.
    """
    K, R, t = scene["K"], scene["R"], scene["t"]
    y0b, y1b, x0b, x1b = scene["fg_box"]

    def plane_H(d):
        n = np.array([0.0, 0.0, 1.0])
        return K @ (R + np.outer(t, n) / d) @ np.linalg.inv(K)

    HB, HF = plane_H(scene["d_bg"]), plane_H(scene["d_fg"])
    x, y = pts0[:, 0], pts0[:, 1]
    in_fg = (y >= y0b) & (y < y1b) & (x >= x0b) & (x < x1b)
    q = np.concatenate([pts0, np.ones((pts0.shape[0], 1))], axis=1)
    pb = q @ HB.T
    pf = q @ HF.T
    p = np.where(in_fg[:, None], pf, pb)
    pts1 = p[:, :2] / p[:, 2:3]
    h, w = scene["img0"].shape
    visible = ((pts1[:, 0] >= 0) & (pts1[:, 0] < w)
               & (pts1[:, 1] >= 0) & (pts1[:, 1] < h))
    # occlusion: a background point whose image-1 position is covered by the
    # (nearer) foreground square is not visible there
    qb = np.concatenate([pts1, np.ones((pts1.shape[0], 1))], axis=1)
    back = qb @ np.linalg.inv(HF).T
    bx = back[:, 0] / back[:, 2]
    by = back[:, 1] / back[:, 2]
    covered = (by >= y0b) & (by < y1b) & (bx >= x0b) & (bx < x1b)
    visible &= in_fg | ~covered
    return pts1.astype(np.float32), visible
