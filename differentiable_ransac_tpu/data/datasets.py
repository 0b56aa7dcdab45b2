"""Data pipeline: readers for the reference's on-disk record formats.

Format parity (``/root/reference/datasets.py``):

* Two-view ``.npy`` records with indices 0-14: pts1, pts2, SNN ratios,
  im_size1, im_size2, K1, K2, gt_R, gt_t, feature sizes/angles
  (``datasets.py:37-50``). Lowe-ratio filtering (``:53-65``), side channels
  ``[ratio, scale_ratio, Δangle]`` (``:67-95``), E-mode calibration
  normalization / F-mode image-size normalization (``:70-95``),
  subsample-or-repeat-pad to exactly ``nfeatures`` (``:100-112``),
  ``gt_E = [t]× R`` and ``gt_F = K2⁻ᵀ gt_E K1⁻¹`` (``:115-126``).
* 3D ``.npz`` records with ``transform``, ``corr_scores``,
  ``src_corr_points``, ``ref_corr_points`` (``:326-336``), padded to
  ``num`` points (``:337-354``).

Host-side numpy only (no torch): batches are dicts of stacked numpy arrays
handed to the jitted train/eval steps. Output layout is channels-last
``(N, 7)`` (the TPU-friendly layout of the network).
"""

from __future__ import annotations

import math
import os
from typing import Dict, Iterator, List, Sequence

import numpy as np


def undistort_points(pts: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Pinhole normalization — equivalent to ``cv2.undistortPoints(pts, K,
    None)`` (reference ``datasets.py:86-87``): subtract principal point,
    divide by focal lengths."""
    c = np.array([K[0, 2], K[1, 2]], pts.dtype)
    f = np.array([K[0, 0], K[1, 1]], pts.dtype)
    return (pts - c) / f


def essential_from_pose_np(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """``gt_E = [t]× R`` (reference ``datasets.py:115-123``)."""
    t = np.asarray(t).reshape(3)
    tx = np.array([
        [0.0, -t[2], t[1]],
        [t[2], 0.0, -t[0]],
        [-t[1], t[0], 0.0],
    ], np.float32)
    return tx @ np.asarray(R, np.float32)


def _pad_or_subsample(arr: np.ndarray, n: int, rng: np.random.Generator,
                      zero_pad: bool = False) -> np.ndarray:
    """Exactly-n rows: random subsample if too many; repeat-pad (reference
    ``Dataset``) or zero-pad (reference ``DatasetZero``) if too few."""
    m = arr.shape[0]
    if m > n:
        return arr[rng.permutation(m)[:n]]
    if m < n:
        if zero_pad:
            out = np.zeros((n,) + arr.shape[1:], arr.dtype)
            out[:m] = arr
            return out
        reps = [arr]
        total = m
        while total < n:
            reps.append(arr[rng.permutation(m)])
            total += m
        return np.concatenate(reps, axis=0)[:n]
    return arr


class TwoViewRecords:
    """Reader for the PhotoTourism-style ``.npy`` correspondence records.

    Args:
        folders: directories of ``.npy`` files.
        ratio_threshold: Lowe SNN-ratio filter (reference default 0.8).
        nfeatures: pad/subsample target N (0 keeps variable size).
        fmat: F-mode (image-size normalization) vs E-mode (calibration
            normalization).
        zero_pad: zero-pad instead of repeat-pad (the reference's
            ``DatasetZero`` variant); a ``point_mask`` marks real rows.
    """

    def __init__(self, folders: Sequence[str], ratio_threshold: float = 0.8,
                 nfeatures: int = 2000, fmat: bool = False, zero_pad: bool = False,
                 seed: int = 0):
        self.ratio_threshold = ratio_threshold
        self.nfeatures = nfeatures
        self.fmat = fmat
        self.zero_pad = zero_pad
        self.minset = 7 if fmat else 5
        self.rng = np.random.default_rng(seed)
        self.files: List[str] = []
        for folder in folders:
            self.files += [os.path.join(folder, f) for f in sorted(os.listdir(folder))]

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        data = np.load(self.files[index], allow_pickle=True, encoding="latin1")
        pts1, pts2, ratios = data[0], data[1], data[2]
        im_size1 = np.asarray(data[3], np.float32)
        im_size2 = np.asarray(data[4], np.float32)
        K1 = np.asarray(data[5], np.float32)
        K2 = np.asarray(data[6], np.float32)
        gt_R = np.asarray(data[7], np.float32)
        gt_t = np.asarray(data[8], np.float32)
        f_size1 = np.asarray(data[9], np.float32)
        ang1 = np.asarray(data[10], np.float32)
        f_size2 = np.asarray(data[11], np.float32)
        ang2 = np.asarray(data[12], np.float32)

        keep = ratios[0, :, 0] < self.ratio_threshold
        if keep.sum() >= self.minset:
            pts1, pts2, ratios = pts1[:, keep], pts2[:, keep], ratios[:, keep]
            f_size1, f_size2 = f_size1[:, keep], f_size2[:, keep]
            ang1, ang2 = ang1[:, keep], ang2[:, keep]

        scale_ratio = f_size2 / np.maximum(f_size1, 1e-8)
        ang = ((ang2 - ang1) % 180.0) * (math.pi / 180.0)

        p1 = np.asarray(pts1[0], np.float32)  # (N, 2)
        p2 = np.asarray(pts2[0], np.float32)
        if self.fmat:
            p1 = (p1 - np.array([im_size1[1] / 2, im_size1[0] / 2], np.float32)) / im_size1.max()
            p2 = (p2 - np.array([im_size2[1] / 2, im_size2[0] / 2], np.float32)) / im_size2.max()
        else:
            p1 = undistort_points(p1, K1)
            p2 = undistort_points(p2, K2)

        corr = np.concatenate(
            [p1, p2, ratios[0].astype(np.float32),
             scale_ratio[0].astype(np.float32), ang[0].astype(np.float32)],
            axis=1,
        )  # (N, 7)

        n_real = corr.shape[0]
        if self.nfeatures > 0:
            corr = _pad_or_subsample(corr, self.nfeatures, self.rng, self.zero_pad)
            point_mask = np.zeros(self.nfeatures, np.float32)
            point_mask[: min(n_real, self.nfeatures)] = 1.0
            if not self.zero_pad:
                point_mask[:] = 1.0  # repeat-padded rows are real duplicates
        else:
            point_mask = np.ones(n_real, np.float32)

        gt_E = essential_from_pose_np(gt_R, gt_t)
        gt_F = np.linalg.inv(K2).T @ gt_E @ np.linalg.inv(K1)

        return {
            "correspondences": corr.astype(np.float32),
            "point_mask": point_mask,
            "gt_E": gt_E.astype(np.float32),
            "gt_F": gt_F.astype(np.float32),
            "gt_R": gt_R,
            "gt_t": gt_t.reshape(3),
            "K1": K1,
            "K2": K2,
            "im_size1": im_size1,
            "im_size2": im_size2,
        }

    def batches(self, batch_size: int, shuffle: bool = False,
                drop_last: bool = True, seed: int | None = None,
                skip: int = 0,
                order: "np.ndarray | None" = None) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked-record batches.

        ``seed`` makes the shuffle order a pure function of its value (for
        exact checkpoint resume — pass e.g. ``base_seed + epoch``); without
        it the internal stateful rng is used. ``skip`` drops the first N
        batches (resuming mid-epoch at a checkpointed batch index).
        ``order`` gives an explicit record order (difficulty bucketing:
        batching adaptive searches runs every lane to the SLOWEST lane's
        stopping bound, so grouping similar-difficulty pairs recovers the
        straggler penalty — see ``evaluate.difficulty_order``).
        """
        if order is not None:
            order = np.asarray(order)
        else:
            order = np.arange(len(self))
            if shuffle:
                (np.random.default_rng(seed) if seed is not None else self.rng
                 ).shuffle(order)
        for bi, start in enumerate(range(0, len(order), batch_size)):
            idx = order[start:start + batch_size]
            if len(idx) < batch_size and drop_last:
                return
            if bi < skip:
                continue
            items = [self[i] for i in idx]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}


class ThreeDRecords:
    """Reader for 3DMatch-style ``.npz`` correspondence records
    (reference ``Dataset3D``, ``datasets.py:311-359``)."""

    def __init__(self, folders: Sequence[str], num: int = 4000, seed: int = 0):
        self.num = num
        self.rng = np.random.default_rng(seed)
        self.files: List[str] = []
        for folder in folders:
            self.files += [os.path.join(folder, f) for f in sorted(os.listdir(folder))]

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        data = np.load(self.files[index])
        gt_pose = np.asarray(data["transform"], np.float32)
        scores = np.asarray(data["corr_scores"], np.float32)
        src = np.asarray(data["src_corr_points"], np.float32)
        ref = np.asarray(data["ref_corr_points"], np.float32)
        corr = np.concatenate([src, ref, scores[:, None]], axis=1)  # (N, 7)
        if self.num > 0:
            corr = _pad_or_subsample(corr, self.num, self.rng)
        return {"correspondences": corr, "gt_pose": gt_pose}

    def batches(self, batch_size: int, shuffle: bool = False,
                drop_last: bool = True, seed: int | None = None,
                skip: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked-record batches.

        ``seed`` makes the shuffle order a pure function of its value (for
        exact checkpoint resume — pass e.g. ``base_seed + epoch``); without
        it the internal stateful rng is used. ``skip`` drops the first N
        batches (resuming mid-epoch at a checkpointed batch index).
        """
        order = np.arange(len(self))
        if shuffle:
            (np.random.default_rng(seed) if seed is not None else self.rng
             ).shuffle(order)
        for bi, start in enumerate(range(0, len(order), batch_size)):
            idx = order[start:start + batch_size]
            if len(idx) < batch_size and drop_last:
                return
            if bi < skip:
                continue
            items = [self[i] for i in idx]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}


def write_synthetic_two_view_record(path: str, n_points: int = 500, seed: int = 0,
                                    im_size=(1024, 1024), focal: float = 1000.0,
                                    noise: float = 0.5, outlier_ratio: float = 0.3,
                                    realistic: bool = False):
    """Emit a synthetic record in the reference's exact 15-field ``.npy``
    layout — used by tests and demos in place of PhotoTourism data.

    ``realistic=True`` (corpus writers / PARITY, VERDICT r4 task 2) uses
    :func:`~differentiable_ransac_tpu.data.synthetic.realistic_two_view_problem`:
    varied per-camera intrinsics (K1≠K2), a general/planar/forward scene
    mixture, keypoint-pool mismatch outliers, and side channels (SNN
    ratio, feature scale, orientation) CORRELATED with inlier status the
    way SIFT statistics are — the signal the reference's 7-channel CLNet
    input exists to exploit (``/root/reference/datasets.py:67-95``).
    ``realistic=False`` keeps the historical uncorrelated-noise channels
    the unit tests calibrate against; ``im_size``/``focal`` only apply
    there (the realistic generator samples its own intrinsics).
    """
    from differentiable_ransac_tpu.data.synthetic import (
        realistic_two_view_problem,
        two_view_problem,
    )

    rng = np.random.default_rng(seed)
    n = n_points
    if realistic:
        p = realistic_two_view_problem(
            n_points=n_points, noise=noise, outlier_ratio=outlier_ratio,
            seed=seed)
        ratios = p["ratios"].reshape(1, n, 1)
        f_size1 = p["f_size1"].reshape(1, n, 1)
        f_size2 = p["f_size2"].reshape(1, n, 1)
        ang1 = p["ang1"].reshape(1, n, 1)
        ang2 = p["ang2"].reshape(1, n, 1)
    else:
        p = two_view_problem(n_points=n_points, noise=noise,
                             outlier_ratio=outlier_ratio,
                             seed=seed, focal=focal, im_size=im_size)
        p["K1"] = p["K2"] = p["K"]
        p["im_size1"] = p["im_size2"] = p["im_size"]
        ratios = rng.uniform(0.2, 1.0, (1, n, 1)).astype(np.float32)
        f_size1 = rng.uniform(1, 4, (1, n, 1)).astype(np.float32)
        f_size2 = rng.uniform(1, 4, (1, n, 1)).astype(np.float32)
        ang1 = rng.uniform(0, 360, (1, n, 1)).astype(np.float32)
        ang2 = rng.uniform(0, 360, (1, n, 1)).astype(np.float32)
    pts1 = p["matches_px"][:, :2][None]  # (1, N, 2)
    pts2 = p["matches_px"][:, 2:][None]
    record = np.empty(15, object)
    record[0] = pts1
    record[1] = pts2
    record[2] = ratios
    record[3] = list(p["im_size1"])
    record[4] = list(p["im_size2"])
    record[5] = p["K1"]
    record[6] = p["K2"]
    record[7] = p["R"]
    record[8] = p["t"].reshape(3, 1)
    record[9] = f_size1
    record[10] = ang1
    record[11] = f_size2
    record[12] = ang2
    record[13] = np.zeros((1, n, 4), np.float32)  # descriptor placeholders
    record[14] = np.zeros((1, n, 4), np.float32)
    np.save(path, record, allow_pickle=True)
    return p


def write_synthetic_rigid_record(path: str, n_points: int = 1000, seed: int = 0,
                                 noise: float = 0.01, outlier_ratio: float = 0.4,
                                 mismatch_outliers: float = 0.0):
    """Emit a synthetic 3D record in the reference's ``Dataset3D`` ``.npz``
    layout (``/root/reference/datasets.py:326-336``: ``transform``,
    ``corr_scores``, ``src_corr_points``, ``ref_corr_points``) so the torch
    reference and this framework can consume the IDENTICAL file.

    ``mismatch_outliers > 0`` draws that fraction of outliers as
    point-pool mismatches and switches the correspondence scores from the
    historical cleanly-separated cue to OVERLAPPING Gaussians (inliers
    N(0.7, 0.15), outliers N(0.4, 0.15), clipped to [0, 1]) — what a real
    3D feature matcher produces (VERDICT r4 task 2 realism)."""
    from differentiable_ransac_tpu.data.synthetic import rigid_problem

    p = rigid_problem(n_points=n_points, noise=noise,
                      outlier_ratio=outlier_ratio, seed=seed,
                      mismatch_outliers=mismatch_outliers)
    rng = np.random.default_rng(seed)
    inl = p["inlier_mask"].astype(np.float32)
    if mismatch_outliers > 0:
        scores = np.clip(np.where(
            p["inlier_mask"],
            rng.normal(0.7, 0.15, n_points),
            rng.normal(0.4, 0.15, n_points),
        ), 0.0, 1.0).astype(np.float32)
    else:
        # historical: noisy but separable inlier cue
        scores = (inl * 0.5 + 0.25
                  + rng.uniform(-0.2, 0.2, n_points).astype(np.float32))
    np.savez(path, transform=p["transform"], corr_scores=scores,
             src_corr_points=p["points"][:, :3],
             ref_corr_points=p["points"][:, 3:])
    return p
