#!/usr/bin/env python
"""End-to-end learning demo on synthetic data (no external datasets).

Generates two-view problems whose outliers correlate with a visible side
channel (mimicking SNN-ratio semantics: high ratio ⇒ likely outlier), trains
the CLNet importance network through the differentiable RANSAC layer with
the match loss (the reference's best setup, ``-sam 2 -w2 1``), and reports
pose-AUC before vs after training at a small hypothesis budget — where
learned sampling weights matter most.

Usage: python scripts/demo_synthetic.py [--steps 60] [--pairs-per-batch 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.config import (
    ModelKind,
    ProbType,
    RansacConfig,
    SamplerKind,
    TrainConfig,
)
from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.engine import ransac_test
from differentiable_ransac_tpu.models.clnet import select_prob_type
from differentiable_ransac_tpu.ops import metrics, pose
from differentiable_ransac_tpu.train import create_optimizer, create_train_state, make_train_step

N_POINTS = 256


def make_pair(seed, outlier_ratio=0.65):
    """Synthetic pair whose 'snn ratio' channel predicts outlierness."""
    p = two_view_problem(n_points=N_POINTS, noise=0.5, outlier_ratio=outlier_ratio,
                         seed=seed)
    rng = np.random.default_rng(seed + 10_000)
    inl = p["inlier_mask"]
    ratio = np.where(inl, rng.uniform(0.1, 0.55, N_POINTS),
                     rng.uniform(0.45, 1.0, N_POINTS)).astype(np.float32)
    side = np.stack([
        ratio,
        rng.uniform(0.5, 2.0, N_POINTS).astype(np.float32),
        rng.uniform(0, np.pi, N_POINTS).astype(np.float32),
    ], axis=1)
    feats = np.concatenate([p["matches"], side], axis=1)
    return p, feats


def batch_of(seeds):
    probs, feats = zip(*[make_pair(s) for s in seeds])
    K = np.stack([p["K"] for p in probs])
    return probs, {
        "correspondences": jnp.asarray(np.stack(feats)),
        "gt_E": jnp.asarray(np.stack([p["E"] for p in probs])),
        "gt_F": jnp.asarray(np.stack([p["F"] for p in probs])),
        "gt_R": jnp.asarray(np.stack([p["R"] for p in probs])),
        "gt_t": jnp.asarray(np.stack([p["t"] for p in probs])),
        "K1": jnp.asarray(K),
        "K2": jnp.asarray(K),
        "im_size1": jnp.asarray(np.stack([p["im_size"] for p in probs])),
        "im_size2": jnp.asarray(np.stack([p["im_size"] for p in probs])),
    }


def evaluate(model, state, seeds, eval_cfg, tag):
    """Pose AUC with a small adaptive budget (weights matter here)."""

    def _eval(params, stats, feats, k, thr):
        out = model.apply({"params": params, "batch_stats": stats}, feats,
                          train=False)
        weights = select_prob_type(out, 2)
        return jax.vmap(
            lambda f, w, kk, t: ransac_test(eval_cfg, f[:, :4], w, kk, threshold=t)[0]
        )(feats, weights, k, thr)

    eval_fn = jax.jit(_eval)
    errs = []
    w_in, w_out = [], []
    for group_start in range(0, len(seeds), 8):
        group = seeds[group_start:group_start + 8]
        probs, batch = batch_of(group)
        feats = batch["correspondences"]
        keys = jax.random.split(jax.random.PRNGKey(999), len(group))
        thr = jnp.full((len(group),), 2.0 / 1000.0, jnp.float32)
        models = eval_fn(state.params, state.batch_stats, feats, keys, thr)
        out = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                          feats, train=False)
        weights = np.asarray(out["weights"])
        for b, p in enumerate(probs):
            m = p["matches"][p["inlier_mask"]]
            err_q, err_t = pose.evaluate_pose(
                jnp.asarray(models[b]), jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:]),
                jnp.asarray(p["R"]), jnp.asarray(p["t"]),
            )
            errs.append(max(float(err_q), float(err_t)))
            w_in.append(weights[b][p["inlier_mask"]].mean())
            w_out.append(weights[b][~p["inlier_mask"]].mean())
    aucs = metrics.auc(errs)
    print(f"[{tag}] AUC@5/10/20 = {aucs[0]:.3f}/{aucs[1]:.3f}/{aucs[2]:.3f}  "
          f"median err = {np.median(errs):.2f}deg  "
          f"weight inlier/outlier = {np.mean(w_in):.3f}/{np.mean(w_out):.3f}")
    return aucs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--pairs-per-batch", type=int, default=4)
    args = ap.parse_args()

    tcfg = TrainConfig(w2=1.0, w1=1.0, learning_rate=2e-4, prob_type=ProbType.LOGITS)
    train_rcfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                              max_iterations=64, train=True, solver_precision=1)
    eval_rcfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                             max_iterations=96, ransac_batch_size=32, threshold=2.0)

    tx = create_optimizer(tcfg)
    model, state = create_train_state(jax.random.PRNGKey(0), tcfg, N_POINTS, tx)
    step = make_train_step(model, tx, tcfg, train_rcfg)

    # Train on a fixed pool of pairs (the honest scope of a synthetic demo:
    # the differentiable pipeline learns the planted outlier structure on
    # the training distribution; PhotoTourism-scale generalization needs
    # PhotoTourism-scale data). A held-out set is reported alongside.
    train_seeds = list(range(100, 132))
    held_seeds = list(range(5000, 5016))
    before_tr = evaluate(model, state, train_seeds, eval_rcfg, "untrained/train-set")
    before_ho = evaluate(model, state, held_seeds, eval_rcfg, "untrained/held-out")

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for it in range(args.steps):
        rng = np.random.default_rng(it)
        seeds = list(rng.choice(train_seeds, args.pairs_per_batch, replace=False))
        _, batch = batch_of(seeds)
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it:3d} loss {float(m['loss']):.4f} "
                  f"valid {float(m['valid_fraction']):.2f} ({time.time()-t0:.0f}s)")

    after_tr = evaluate(model, state, train_seeds, eval_rcfg, "trained/train-set")
    after_ho = evaluate(model, state, held_seeds, eval_rcfg, "trained/held-out")
    print(f"train-set AUC@10 {before_tr[1]:.3f} -> {after_tr[1]:.3f} "
          f"({'IMPROVED' if after_tr[1] > before_tr[1] else 'no gain'})")
    print(f"held-out  AUC@10 {before_ho[1]:.3f} -> {after_ho[1]:.3f}")


if __name__ == "__main__":
    main()
