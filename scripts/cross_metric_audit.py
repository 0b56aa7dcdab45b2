#!/usr/bin/env python
"""Cross-metric audit of the parity headline (VERDICT r2 missing #4).

PARITY.md's tables score each framework with its own metric stack. The
unit tests in ``tests/test_metric_parity.py`` prove the stacks are
numerically identical on random inputs; this script closes the loop on the
REAL estimated models: it loads the per-scene models dumped by
``parity.py --dump`` and scores BOTH model sets with BOTH metric stacks —
ours (``ops.metrics`` / ``ops.pose``) and the reference's own
(``/root/reference/cv_utils.py``) — printing the 2×2 table. If the
headline (e.g. F1 0.638 vs 0.492) is real, each model set must get the
same number from either stack.

Usage:
    python scripts/parity.py --fmat 1 ... --dump /tmp/dump_F.npz
    python scripts/cross_metric_audit.py --dump /tmp/dump_F.npz \
        --data_dir <records folder printed by parity.py> --fmat 1
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"


def load_pairs(folder, nf, fmat):
    from differentiable_ransac_tpu.data.datasets import TwoViewRecords

    ds = TwoViewRecords([folder.rstrip("/") + "/"], 0.8, nf, fmat)
    batch = next(iter(ds.batches(len(ds))))
    return batch


def our_E_errors(models, batch):
    from differentiable_ransac_tpu.evaluate import evaluate_essential_batch

    return [r["err_pose"] for r in evaluate_essential_batch(models, batch)]


def ref_E_errors(models, batch):
    sys.path.insert(0, REFERENCE)
    import torch
    from cv_utils import eval_essential_matrix

    errs = []
    for b in range(models.shape[0]):
        pts1 = np.asarray(batch["correspondences"][b][:, 0:2])
        pts2 = np.asarray(batch["correspondences"][b][:, 2:4])
        errR, errT = eval_essential_matrix(
            pts1, pts2, torch.from_numpy(np.asarray(models[b])).float(),
            torch.from_numpy(np.asarray(batch["gt_R"][b])).float(),
            torch.from_numpy(np.asarray(batch["gt_t"][b]).reshape(3, 1)).float(),
        )
        errs.append(max(float(errR), float(errT)))
    sys.path.remove(REFERENCE)
    return errs


def pixel_pts(batch, b):
    feats = np.asarray(batch["correspondences"][b])
    s1 = np.asarray(batch["im_size1"][b])
    s2 = np.asarray(batch["im_size2"][b])
    p1 = feats[:, 0:2] * s1.max() + np.array([s1[1] / 2, s1[0] / 2])
    p2 = feats[:, 2:4] * s2.max() + np.array([s2[1] / 2, s2[0] / 2])
    return p1, p2


def our_F_scores(models, batch, threshold=0.75):
    from differentiable_ransac_tpu.ops import metrics

    f1s, epis = [], []
    for b in range(models.shape[0]):
        p1, p2 = pixel_pts(batch, b)
        valid, f1, _, epi = metrics.f_error(
            p1.T, p2.T, np.asarray(models[b]),
            np.asarray(batch["gt_F"][b]), threshold)
        if valid:
            f1s.append(f1)
            epis.append(epi)
    return f1s, epis


def ref_F_scores(models, batch, threshold=0.75):
    sys.path.insert(0, REFERENCE)
    from cv_utils import f_error as ref_f_error

    f1s, epis = [], []
    for b in range(models.shape[0]):
        p1, p2 = pixel_pts(batch, b)
        valid, f1, _, epi = ref_f_error(
            p1.T[:, :, None], p2.T[:, :, None], np.asarray(models[b]),
            np.asarray(batch["gt_F"][b]), threshold)
        if valid:
            f1s.append(float(f1))
            epis.append(float(epi))
    sys.path.remove(REFERENCE)
    return f1s, epis


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", required=True)
    ap.add_argument("--ref_dump", default=None,
                    help="take ref_models from this npz instead (e.g. when "
                         "--dump came from a --skip_reference run)")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--nf", type=int, default=500)
    ap.add_argument("--fmat", type=int, default=0)
    ap.add_argument("--out", default=None, help="append markdown here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # metric-only; no search

    d = np.load(args.dump)
    ref_models, our_models = d["ref_models"], d["our_models"]
    if args.ref_dump:
        ref_models = np.load(args.ref_dump)["ref_models"]
    # the reference Dataset lists files UNSORTED (os.listdir,
    # /root/reference/datasets.py:30) while ours sorts — realign the
    # reference's model order to the sorted scene order the batch uses
    listing = os.listdir(args.data_dir)
    order = np.argsort(listing)  # position of sorted-rank i in ref order
    ref_models = ref_models[order[: len(ref_models)]]
    batch = load_pairs(args.data_dir, args.nf, bool(args.fmat))
    n = min(len(ref_models), len(our_models), len(batch["gt_R"]))
    assert n > 0
    batch = {k: v[:n] for k, v in batch.items()}
    ref_models, our_models = ref_models[:n], our_models[:n]

    rows = []
    if args.fmat:
        for name, models in (("reference models", ref_models),
                             ("our models", our_models)):
            fo, eo = our_F_scores(models, batch)
            fr, er = ref_F_scores(models, batch)
            rows.append((name,
                         f"F1 {np.mean(fo):.4f} / epi {np.median(eo):.4f}",
                         f"F1 {np.mean(fr):.4f} / epi {np.median(er):.4f}"))
    else:
        from differentiable_ransac_tpu.ops.metrics import auc

        for name, models in (("reference models", ref_models),
                             ("our models", our_models)):
            eo = our_E_errors(models, batch)
            er = ref_E_errors(models, batch)
            ao, ar = auc(eo), auc(er)
            rows.append((name,
                         f"AUC@5/10/20 {ao[0]:.4f}/{ao[1]:.4f}/{ao[2]:.4f}",
                         f"AUC@5/10/20 {ar[0]:.4f}/{ar[1]:.4f}/{ar[2]:.4f}"))

    hdr = "| model set | scored by OUR metrics | scored by REFERENCE cv_utils |"
    lines = [hdr, "|---|---|---|"] + [
        f"| {a} | {b} | {c} |" for a, b, c in rows
    ]
    table = "\n".join(lines)
    print(table)
    if args.out:
        mode = "F" if args.fmat else "E"
        with open(args.out, "a") as f:
            f.write(f"\n### Cross-metric audit ({mode}-mode, {n} scenes)\n\n")
            f.write(table + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
