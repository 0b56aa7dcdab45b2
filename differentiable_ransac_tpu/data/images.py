"""Image-backed datasets for the matcher (LoFTR-style) pipeline.

Counterpart of the reference's ``DatasetPicture`` / ``DatasetPictureTest``
(``/root/reference/datasets.py:243-307,361-429``): grayscale image pairs +
h5 ground truth (Egt/Fgt/K1_K2/R/T), with the train/valid split taken from
the scene's ``evaluation_list/<scene>_train.npy`` / ``<scene>_list.npy``
key files. Images are decoded host-side (this is IO, not TPU compute) and
converted to grayscale with the same luma weights the reference's kornia
call uses (Rec.601: 0.299 R + 0.587 G + 0.114 B).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from differentiable_ransac_tpu.data.h5_io import PairGroundTruth

_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def load_gray_image(path: str) -> np.ndarray:
    """Load an image as (H, W) float32 grayscale in [0, 1].

    Decoder chain: OpenCV → PIL → ``.npy`` sidecar (for synthetic tests).
    Grayscale uses the reference's kornia ``rgb_to_grayscale`` weights
    (``datasets.py:300-307``).
    """
    if path.endswith(".npy"):
        img = np.load(path)
    else:
        img = None
        try:
            import cv2

            bgr = cv2.imread(path, cv2.IMREAD_COLOR)
            if bgr is not None:
                img = bgr[:, :, ::-1]  # BGR -> RGB
        except ImportError:
            pass
        if img is None:
            try:
                from PIL import Image

                img = np.asarray(Image.open(path).convert("RGB"))
            except ImportError as e:
                raise RuntimeError(f"no decoder available for {path}") from e
    img = np.asarray(img)
    if img.ndim == 3:
        img = img[..., :3].astype(np.float32) @ _LUMA
    else:
        img = img.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    return img.astype(np.float32)


def scene_pair_keys(scene_dir: str, valid: bool) -> List[str]:
    """Pair-key list for a scene: ``evaluation_list/<scene>_train.npy`` for
    training, ``<scene>_list.npy`` for validation/test (reference
    ``datasets.py:373-377,255-256``)."""
    scene_dir = scene_dir.rstrip("/")
    scene = os.path.basename(scene_dir)
    parent = os.path.dirname(scene_dir)
    name = f"{scene}_list.npy" if valid else f"{scene}_train.npy"
    path = os.path.join(parent, "evaluation_list", name)
    return [str(k) for k in np.load(path)]


class PictureDataset:
    """Grayscale image pairs + h5 GT for matcher training/evaluation.

    Args:
        scene_dir: directory holding ``images/``, ``Egt.h5``, ``Fgt.h5``,
            ``K1_K2.h5``, ``R.h5``, ``T.h5``.
        valid: use the validation pair list instead of the train list
            (reference ``DatasetPicture(valid=...)``, ``datasets.py:364,373-377``).
        pair_keys: explicit key list overriding the evaluation_list lookup.
        image_ext: image filename extension inside ``images/``.
    """

    def __init__(self, scene_dir: str, valid: bool = False,
                 pair_keys: Optional[Sequence[str]] = None,
                 image_ext: str = ".jpg"):
        self.scene_dir = scene_dir.rstrip("/")
        keys = list(pair_keys) if pair_keys is not None else scene_pair_keys(
            scene_dir, valid)
        self.gt = PairGroundTruth(self.scene_dir, keys)
        self.image_dir = os.path.join(self.scene_dir, "images")
        self.image_ext = image_ext

    def __len__(self):
        return len(self.gt)

    def _image_path(self, image_id: str) -> str:
        p = os.path.join(self.image_dir, image_id + self.image_ext)
        if not os.path.exists(p) and os.path.exists(p + ".npy"):
            return p + ".npy"
        npy = os.path.join(self.image_dir, image_id + ".npy")
        if not os.path.exists(p) and os.path.exists(npy):
            return npy
        return p

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rec = self.gt[index]
        rec = dict(rec)
        rec["image0"] = load_gray_image(self._image_path(rec["image_id1"]))
        rec["image1"] = load_gray_image(self._image_path(rec["image_id2"]))
        return rec

    def pairs(self):
        for i in range(len(self)):
            yield self[i]
