"""Learned-matcher integration: the LoFTR joint-finetuning hook.

The reference finetunes LoFTR end-to-end through the RANSAC layer
(``/root/reference/train_ransac_loftr.py:15-94``): the matcher produces
correspondences + confidences, confidences feed the Gumbel sampler as
logits, and the pose/match loss back-propagates into the matcher.

This framework is matcher-agnostic: any callable producing
``(mkpts0, mkpts1, confidence)`` plugs in through :class:`MatcherAdapter`.
For a JAX matcher the full pipeline is one differentiable jitted program;
for external torch matchers (LoFTR's reference implementation) the adapter
falls back to the confidence-only coupling (gradients stop at the matcher
boundary — matching the reference's ``test_ransac_loftr.py`` inference
path). The LoFTR package itself is not vendored; pass your own.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.config import RansacConfig
from differentiable_ransac_tpu.engine import ransac_test, ransac_train


@dataclasses.dataclass
class MatchPrediction:
    """Matcher output for one image pair."""

    mkpts0: np.ndarray  # (M, 2) pixels in image 0
    mkpts1: np.ndarray  # (M, 2) pixels in image 1
    confidence: np.ndarray  # (M,)


class MatcherAdapter:
    """Wraps an external matcher for RANSAC coupling.

    Args:
        matcher_fn: ``(image0, image1) -> MatchPrediction``.
        nfeatures: fixed correspondence budget (pad/subsample, reference
            ``train_ransac_loftr.py:28-33`` normalizes then feeds the layer).
        confidence_thresholds: fallback ladder — if fewer than ``min_matches``
            survive a threshold, try the next lower one (reference
            ``test_ransac_loftr.py:28-59``).
    """

    def __init__(self, matcher_fn: Callable, nfeatures: int = 1024,
                 confidence_thresholds=(0.5, 0.2, 0.0), min_matches: int = 16,
                 seed: int = 0):
        self.matcher_fn = matcher_fn
        self.nfeatures = nfeatures
        self.confidence_thresholds = confidence_thresholds
        self.min_matches = min_matches
        self.rng = np.random.default_rng(seed)

    def correspondences(self, image0, image1, K1: np.ndarray, K2: np.ndarray):
        """Match a pair and return calibrated, fixed-size RANSAC inputs.

        Returns dict: points (nfeatures, 4) calibrated, logits (nfeatures,),
        point_mask (nfeatures,).
        """
        pred = self.matcher_fn(image0, image1)
        conf = np.asarray(pred.confidence)
        keep = None
        for thr in self.confidence_thresholds:
            cand = conf >= thr
            if cand.sum() >= self.min_matches:
                keep = cand
                break
        if keep is None:
            keep = np.ones_like(conf, bool)
        p0 = np.asarray(pred.mkpts0)[keep]
        p1 = np.asarray(pred.mkpts1)[keep]
        c = conf[keep]

        # calibrate
        p0n = (p0 - K1[:2, 2]) / np.array([K1[0, 0], K1[1, 1]])
        p1n = (p1 - K2[:2, 2]) / np.array([K2[0, 0], K2[1, 1]])
        pts = np.concatenate([p0n, p1n], axis=1).astype(np.float32)

        n = pts.shape[0]
        out = np.zeros((self.nfeatures, 4), np.float32)
        logits = np.full((self.nfeatures,), -1e9, np.float32)
        mask = np.zeros((self.nfeatures,), np.float32)
        if n >= self.nfeatures:
            sel = self.rng.permutation(n)[: self.nfeatures]
            out[:] = pts[sel]
            logits[:] = np.log(np.clip(c[sel], 1e-6, 1.0))
            mask[:] = 1.0
        else:
            out[:n] = pts
            logits[:n] = np.log(np.clip(c, 1e-6, 1.0))
            mask[:n] = 1.0
        return {"points": out, "logits": logits, "point_mask": mask}


def matcher_ransac_pose(adapter: MatcherAdapter, cfg: RansacConfig,
                        image0, image1, K1, K2, key: jax.Array):
    """Full matcher → RANSAC → (R, t) inference for one pair
    (the ``test_ransac_loftr.py`` pipeline shape)."""
    from differentiable_ransac_tpu.engine import normalized_threshold
    from differentiable_ransac_tpu.ops import pose

    inp = adapter.correspondences(image0, image1, np.asarray(K1), np.asarray(K2))
    thr = normalized_threshold(cfg, jnp.asarray(K1), jnp.asarray(K2))
    model, mask, score, iters = ransac_test(
        cfg, jnp.asarray(inp["points"]), jnp.asarray(inp["logits"]), key,
        threshold=thr, point_mask=jnp.asarray(inp["point_mask"]),
    )
    pts = inp["points"]
    real = inp["point_mask"] > 0
    R, t = pose.recover_pose(model, jnp.asarray(pts[real, :2]), jnp.asarray(pts[real, 2:]))
    return {"E": model, "R": R, "t": t, "inlier_mask": mask, "score": score}


def matcher_finetune_loss(cfg: RansacConfig, points: jnp.ndarray,
                          logits: jnp.ndarray, gt_E: jnp.ndarray,
                          gt_mask: jnp.ndarray, key: jax.Array):
    """Differentiable matcher-finetuning loss: confidence logits → Gumbel
    sampling → hypotheses → symmetric-epipolar match loss. Gradients flow
    into ``logits`` (a JAX matcher's confidence head plugs in directly;
    reference counterpart ``train_ransac_loftr.py:41-93``)."""
    from differentiable_ransac_tpu.losses import match_loss

    models, valid = ransac_train(cfg, points, logits, gt_E, key)
    return match_loss(models, valid, points[:, :2], points[:, 2:4], gt_mask)
