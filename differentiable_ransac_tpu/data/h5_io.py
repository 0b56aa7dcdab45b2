"""HDF5 ground-truth IO for the image-based (LoFTR) evaluation protocol.

Counterpart of the reference's h5 plumbing: ``load_h5``
(``feature_utils.py:13-25``) and the ``DatasetPicture``/``DatasetPictureTest``
ground-truth files ``Egt.h5 / Fgt.h5 / K1_K2.h5 / R.h5 / T.h5``
(``datasets.py:243-307,361-429``). Image decoding itself is delegated to the
caller's matcher stack (the reference uses kornia; any loader works with
:class:`differentiable_ransac_tpu.matchers.MatcherAdapter`).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np


def load_h5(filename: str) -> Dict[str, np.ndarray]:
    """Load an h5 file into a dict (reference ``feature_utils.py:13-25``)."""
    import h5py

    out: Dict[str, np.ndarray] = {}
    if not os.path.exists(filename):
        return out
    with h5py.File(filename, "r") as f:
        for key in f.keys():
            out[key] = f[key][()]
    return out


class PairGroundTruth:
    """Per-pair GT lookup for a PhotoTourism-style scene directory holding
    ``Egt.h5``, ``Fgt.h5``, ``K1_K2.h5``, ``R.h5``, ``T.h5`` plus an
    evaluation pair list (reference ``datasets.py:254-286``)."""

    def __init__(self, scene_dir: str, pair_list: Sequence[str]):
        self.gt_E = load_h5(os.path.join(scene_dir, "Egt.h5"))
        self.gt_F = load_h5(os.path.join(scene_dir, "Fgt.h5"))
        self.K1_K2 = load_h5(os.path.join(scene_dir, "K1_K2.h5"))
        self.R = load_h5(os.path.join(scene_dir, "R.h5"))
        self.T = load_h5(os.path.join(scene_dir, "T.h5"))
        self.pairs: List[tuple] = []
        for k in pair_list:
            parts = str(k).split("_")
            img1 = parts[1] + "_" + parts[2]
            img2 = parts[3] + "_" + parts[4].split(".")[0]
            self.pairs.append((img1, img2))

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img1, img2 = self.pairs[index]
        match_id = f"{img1}-{img2}"
        R1, R2 = self.R[img1], self.R[img2]
        T1, T2 = self.T[img1], self.T[img2]
        gt_R = R2 @ R1.T
        gt_t = T2 - gt_R @ T1
        return {
            "image_id1": img1,
            "image_id2": img2,
            "gt_E": np.asarray(self.gt_E[match_id]),
            "gt_F": np.asarray(self.gt_F[match_id]),
            "gt_R": np.asarray(gt_R),
            "gt_t": np.asarray(gt_t).reshape(3),
            "K1": np.asarray(self.K1_K2[match_id][0][0]),
            "K2": np.asarray(self.K1_K2[match_id][0][1]),
        }
