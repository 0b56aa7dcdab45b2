#!/usr/bin/env python
"""Generate a synthetic PhotoTourism-style training corpus.

Writes train/valid/test splits of two-view records in the reference's exact
15-field ``.npy`` layout (``/root/reference/datasets.py:37-50``) under
``<out>/<scene>/{train_data,valid_data,test_data}/`` — the directory shape
``scripts/train_e2e.py`` consumes. Noise and outlier ratios are drawn per
record from configurable ranges (mixed regimes, VERDICT r3 task 1), with
seeds disjoint from the PARITY eval records (which use ``--seed 0``-derived
seeds 0..scenes-1).

Example:
    python scripts/make_synthetic_corpus.py --out data_corpus --train 2048 \
        --valid 64 --test 0 --nf 500
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from differentiable_ransac_tpu.data.datasets import (
    write_synthetic_rigid_record,
    write_synthetic_two_view_record,
)


def write_split(folder: str, n: int, nf: int, rng: np.random.Generator,
                noise_range, outlier_range, seed_base: int, rigid: bool = False,
                realistic: bool = True):
    os.makedirs(folder, exist_ok=True)
    writer = write_synthetic_rigid_record if rigid else write_synthetic_two_view_record
    ext = "npz" if rigid else "npy"
    for i in range(n):
        noise = float(rng.uniform(*noise_range))
        outliers = float(rng.uniform(*outlier_range))
        kw = ({"mismatch_outliers": 0.8} if rigid else
              {"realistic": True}) if realistic else {}
        writer(
            os.path.join(folder, f"pair_{i:05d}.{ext}"),
            n_points=nf, seed=seed_base + i, noise=noise,
            outlier_ratio=outliers, **kw,
        )
    print(f"{folder}: {n} records (noise {noise_range}, outliers {outlier_range}, "
          f"realistic={realistic})")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data_corpus")
    ap.add_argument("--scene", default="synth")
    ap.add_argument("--train", type=int, default=2048)
    ap.add_argument("--valid", type=int, default=64)
    ap.add_argument("--test", type=int, default=0)
    ap.add_argument("--nf", type=int, default=500)
    ap.add_argument("--noise_lo", type=float, default=0.25)
    ap.add_argument("--noise_hi", type=float, default=2.0)
    ap.add_argument("--outlier_lo", type=float, default=0.1)
    ap.add_argument("--outlier_hi", type=float, default=0.6)
    ap.add_argument("--seed", type=int, default=100000,
                    help="base record seed (train records use seed..seed+N; "
                         "keep disjoint from the PARITY eval seeds 0..63)")
    ap.add_argument("--realistic", type=int, default=1,
                    help="1 (default): distribution-honest records — "
                         "correlated SIFT-like side channels, keypoint-pool "
                         "mismatch outliers, varied intrinsics, "
                         "general/planar/forward scene mixture (VERDICT r4 "
                         "task 2). 0: the historical uncorrelated-noise "
                         "generator (round ≤4 corpora).")
    ap.add_argument("--rigid", type=int, default=0,
                    help="1: write 3DMatch-style rigid .npz records "
                         "(Dataset3D layout) under <out>/{train,test}/ — "
                         "the directory shape scripts/train_point.py and "
                         "scripts/eval_point.py consume. Noise is in metric "
                         "units (defaults 0.005-0.03 if the ranges were "
                         "left at their pixel-scale defaults).")
    args = ap.parse_args()

    if args.rigid and args.noise_lo == 0.25 and args.noise_hi == 2.0:
        args.noise_lo, args.noise_hi = 0.005, 0.03

    rng = np.random.default_rng(args.seed)
    noise_range = (args.noise_lo, args.noise_hi)
    outlier_range = (args.outlier_lo, args.outlier_hi)
    if args.rigid:
        # train_point.py reads <data_path>/train/, eval_point.py <data_path>/test/
        write_split(os.path.join(args.out, "train"), args.train, args.nf, rng,
                    noise_range, outlier_range, args.seed, rigid=True,
                    realistic=bool(args.realistic))
        write_split(os.path.join(args.out, "test"), max(args.valid, args.test),
                    args.nf, rng, noise_range, outlier_range,
                    args.seed + args.train, rigid=True,
                    realistic=bool(args.realistic))
        return
    root = os.path.join(args.out, args.scene)
    write_split(os.path.join(root, "train_data"), args.train, args.nf, rng,
                noise_range, outlier_range, args.seed,
                realistic=bool(args.realistic))
    if args.valid:
        write_split(os.path.join(root, "valid_data"), args.valid, args.nf,
                    rng, noise_range, outlier_range, args.seed + args.train,
                    realistic=bool(args.realistic))
    if args.test:
        write_split(os.path.join(root, "test_data"), args.test, args.nf, rng,
                    noise_range, outlier_range,
                    args.seed + args.train + args.valid,
                    realistic=bool(args.realistic))


if __name__ == "__main__":
    main()
