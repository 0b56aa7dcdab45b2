#!/usr/bin/env python
"""Matcher → RANSAC pose evaluation (the reference ``test_ransac_loftr.py``
protocol): per pair, run an external matcher (LoFTR or any callable), feed
its confidences to the Gumbel sampler, recover the pose, report AUC@5/10/20.

The matcher is injected: pass a module path exposing
``build_matcher() -> callable(image0, image1) -> MatchPrediction``
(e.g. a thin wrapper over kornia's LoFTR). GT comes from the scene's
Egt/Fgt/K1_K2/R/T h5 files (reference ``datasets.py:243-307``).
"""

import argparse
import importlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
from differentiable_ransac_tpu.data.h5_io import PairGroundTruth
from differentiable_ransac_tpu.matchers import MatcherAdapter, matcher_ransac_pose
from differentiable_ransac_tpu.ops import metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--pair_list", required=True, help=".npy list of pair keys")
    ap.add_argument("--image_dir", default=None)
    ap.add_argument("--matcher", required=True,
                    help="python module exposing build_matcher()")
    ap.add_argument("--nfeatures", type=int, default=1024)
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--max_iterations", type=int, default=1000)
    args = ap.parse_args()

    matcher_mod = importlib.import_module(args.matcher)
    matcher_fn = matcher_mod.build_matcher()
    adapter = MatcherAdapter(matcher_fn, nfeatures=args.nfeatures)

    gt = PairGroundTruth(args.scene_dir, np.load(args.pair_list))
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       threshold=args.threshold, max_iterations=args.max_iterations)

    image_dir = args.image_dir or os.path.join(args.scene_dir, "images")
    load_image = getattr(matcher_mod, "load_image", None)

    errs = []
    for i in range(len(gt)):
        item = gt[i]
        img0 = img1 = None
        if load_image is not None:
            img0 = load_image(os.path.join(image_dir, item["image_id1"] + ".jpg"))
            img1 = load_image(os.path.join(image_dir, item["image_id2"] + ".jpg"))
        out = matcher_ransac_pose(adapter, cfg, img0, img1,
                                  item["K1"], item["K2"], jax.random.PRNGKey(i))
        R, t = np.asarray(out["R"]), np.asarray(out["t"])
        dR, dT = metrics.pose_error(R, item["gt_R"], t.reshape(3, 1),
                                    item["gt_t"].reshape(3, 1))
        errs.append(max(dR, dT))
        if (i + 1) % 50 == 0:
            print(f"{i+1}/{len(gt)} pairs...")

    aucs = metrics.auc(errs)
    print(f"AUC@5/10/20 = {aucs[0]:.4f}/{aucs[1]:.4f}/{aucs[2]:.4f} "
          f"median={np.median(errs):.2f}deg over {len(errs)} pairs")


if __name__ == "__main__":
    main()
