#!/usr/bin/env python
"""Joint matcher finetuning through ∇-RANSAC (the reference
``train_ransac_loftr.py`` counterpart, ``:15-94,97-145``).

The reference back-propagates a pose/match loss through the RANSAC layer
into LoFTR's parameters. This driver demonstrates the same capability with
a small JAX matcher — a confidence head (MLP) over per-correspondence
descriptor features — optimized end-to-end through
``matcher_finetune_loss``: confidence logits → Gumbel sampling → 5PC
hypotheses → symmetric-epipolar loss. The gradients reaching the MLP are
MATCHER gradients (no CLNet anywhere in the loop).

Synthetic protocol: each correspondence carries a descriptor-similarity
feature vector that is informative of (but not equal to) its inlier
status; the head must learn to map features → sampling confidence. Success
criterion: pose AUC@10 on held-out pairs improves against the untrained
head, with the improvement driven purely by gradients through the sampler.

Run (TPU or CPU):
    python scripts/train_matcher.py --steps 60 --pairs 16
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.engine import ransac_test_fast
from differentiable_ransac_tpu.matchers import matcher_finetune_loss
from differentiable_ransac_tpu.ops import metrics, pose


FEATURE_DIM = 8


class ConfidenceHead(nn.Module):
    """The finetunable matcher component: descriptor features → logit."""

    hidden: int = 32

    @nn.compact
    def __call__(self, feats):  # (..., FEATURE_DIM) -> (...,)
        h = nn.relu(nn.Dense(self.hidden)(feats))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(1)(h)[..., 0]


def make_pair(seed: int, n_points: int, noise: float, outliers: float):
    """Synthetic pair + descriptor features correlated with inlier status.

    The feature vector is a random projection of a noisy inlier cue —
    informative but not separable without learning (emulating descriptor
    similarity scores of a real matcher)."""
    p = two_view_problem(n_points=n_points, noise=noise, outlier_ratio=outliers,
                         seed=seed)
    rng = np.random.default_rng(10_000 + seed)
    cue = p["inlier_mask"].astype(np.float32) + rng.normal(
        scale=0.6, size=n_points).astype(np.float32)
    proj = np.linalg.qr(rng.normal(size=(FEATURE_DIM, FEATURE_DIM)))[0][:, 0]
    feats = (cue[:, None] * proj[None, :]
             + rng.normal(scale=0.3, size=(n_points, FEATURE_DIM))
             ).astype(np.float32)
    return p, feats


def eval_auc(params, head, probs, feats, cfg_test, thr):
    """Pose AUC@5/10/20 with the head's confidences driving the search."""

    @jax.jit
    def search(f, pts, key):
        logits = head.apply({"params": params}, f)
        return ransac_test_fast(cfg_test, pts, logits, key, threshold=thr,
                                chunk=256, rescue_k=32)[0]

    errs = []
    for i, (p, f) in enumerate(zip(probs, feats)):
        E = search(jnp.asarray(f), jnp.asarray(p["matches"]),
                   jax.random.PRNGKey(i))
        x = p["matches"]
        err_q, err_t = pose.evaluate_pose(
            E, jnp.asarray(x[:, :2]), jnp.asarray(x[:, 2:]),
            jnp.asarray(p["R"]), jnp.asarray(p["t"]), svd=True)
        errs.append(max(float(err_q), float(err_t)))
    return metrics.auc(errs, thresholds=(5, 10, 20)), errs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--pairs", type=int, default=16, help="training pairs")
    ap.add_argument("--eval_pairs", type=int, default=20)
    ap.add_argument("--nf", type=int, default=256)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--outliers", type=float, default=0.6)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--hypotheses", type=int, default=256,
                    help="training hypothesis budget per pair")
    ap.add_argument("--test_iterations", type=int, default=256,
                    help="eval search budget (smaller -> confidence matters "
                         "more)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None, help="write JSON result here")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg_train = RansacConfig(model=ModelKind.ESSENTIAL,
                             sampler=SamplerKind.GUMBEL, train=True,
                             max_iterations=args.hypotheses)
    cfg_test = RansacConfig(model=ModelKind.ESSENTIAL,
                            sampler=SamplerKind.GUMBEL,
                            max_iterations=args.test_iterations)
    thr = jnp.asarray(2.0 / 1000.0, jnp.float32)

    train = [make_pair(s, args.nf, args.noise, args.outliers)
             for s in range(args.pairs)]
    held = [make_pair(10_000 + s, args.nf, args.noise, args.outliers)
            for s in range(args.eval_pairs)]

    head = ConfidenceHead()
    params = head.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, FEATURE_DIM)))["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    pts = jnp.asarray(np.stack([p["matches"] for p, _ in train]))
    fts = jnp.asarray(np.stack([f for _, f in train]))
    gtE = jnp.asarray(np.stack([p["E"] for p, _ in train]))
    gtm = jnp.asarray(np.stack([p["inlier_mask"] for p, _ in train])
                      .astype(np.float32))

    def loss_fn(params, key):
        logits = head.apply({"params": params}, fts)  # (B, N)
        keys = jax.random.split(key, pts.shape[0])
        losses = jax.vmap(
            lambda p, l, g, m, k: matcher_finetune_loss(cfg_train, p, l, g, m, k)
        )(pts, logits, gtE, gtm, keys)
        return jnp.mean(losses)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, \
            optax.global_norm(grads)

    probs_h = [p for p, _ in held]
    feats_h = [f for _, f in held]
    auc0, errs0 = eval_auc(params, head, probs_h, feats_h, cfg_test, thr)
    print(f"before: AUC@5/10/20 = {auc0[0]:.3f}/{auc0[1]:.3f}/{auc0[2]:.3f} "
          f"median_err={np.median(errs0):.2f}deg")

    key = jax.random.PRNGKey(42)
    t0 = time.time()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, gnorm = step(params, opt_state, sub)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d} loss={float(loss):.4f} "
                  f"gnorm={float(gnorm):.3e}")
        assert np.isfinite(float(loss)), "loss diverged"
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s")

    auc1, errs1 = eval_auc(params, head, probs_h, feats_h, cfg_test, thr)
    print(f"after : AUC@5/10/20 = {auc1[0]:.3f}/{auc1[1]:.3f}/{auc1[2]:.3f} "
          f"median_err={np.median(errs1):.2f}deg")
    result = {
        "auc10_before": float(auc0[1]), "auc10_after": float(auc1[1]),
        "auc5_before": float(auc0[0]), "auc5_after": float(auc1[0]),
        "median_err_before": float(np.median(errs0)),
        "median_err_after": float(np.median(errs1)),
        "steps": args.steps, "outliers": args.outliers,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
