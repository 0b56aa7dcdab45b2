#!/usr/bin/env python
"""Joint matcher finetuning through ∇-RANSAC (the reference
``train_ransac_loftr.py`` counterpart, ``:15-94,97-145``).

The reference back-propagates a pose/match loss through the RANSAC layer
into LoFTR's parameters. Two gradient paths exist there and both are
mirrored here:

1. **coordinates** — the matched keypoints ``mkpts0_f``/``mkpts1_f`` are
   LoFTR outputs and enter the epipolar loss (and the minimal solver)
   directly, so the matcher learns to LOCALIZE better. This is the smooth,
   dominant signal (and exercises our implicit-diff solver VJPs
   end-to-end).
2. **confidence** — ``mconf`` drives the Gumbel sampler; the
   straight-through gradient teaches which correspondences to sample. This
   REINFORCE-like path is high-variance (measured: per-key logit gradients
   flip sign between problems), which is why the coordinate path carries
   the demonstration and confidence separation is reported as a secondary
   diagnostic.

This driver trains a small JAX matcher head — per-correspondence
descriptor features → (Δcoordinates, confidence logit) — end-to-end
through ``matcher_finetune_loss``: refined points + confidence → Gumbel
sampling → 5PC hypotheses → symmetric-epipolar loss. No CLNet anywhere in
the loop.

Synthetic protocol: correspondences carry a SYSTEMATIC localization error
that is a (fixed, unknown) linear function of their descriptor features —
the learnable analogue of a matcher's correlated localization bias — plus
irreducible noise; outliers are random. The head must learn to regress the
correction (and, secondarily, inlier confidence). Success criterion: pose
AUC on held-out pairs improves after finetuning, driven by gradients
through the RANSAC layer.

Run (TPU or CPU):
    python scripts/train_matcher.py --steps 200 --pairs 16
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
# max learnable correction, calibrated units (≈5 px at f=1000)
OFFSET_SCALE = 5.0 / 1000.0


class MatcherHead(nn.Module):
    """The finetunable matcher component: descriptor features →
    (coordinate correction, confidence logit) — the two outputs whose
    reference counterparts are LoFTR's fine-level coordinates and
    ``mconf``."""

    hidden: int = 32

    @nn.compact
    def __call__(self, feats):  # (..., FEATURE_DIM)
        h = nn.relu(nn.Dense(self.hidden)(feats))
        h = nn.relu(nn.Dense(self.hidden)(h))
        conf = nn.Dense(1)(h)[..., 0]                      # (...,)
        off = nn.tanh(nn.Dense(4)(h)) * OFFSET_SCALE       # (..., 4)
        return conf, off


def make_pair(seed: int, n_points: int, bias_px: float, outliers: float,
              irreducible_px: float = 0.3):
    """Synthetic pair whose inlier matches carry a feature-predictable
    localization bias (magnitude ``bias_px``) + irreducible noise, and
    whose features also carry a noisy inlier cue."""
    p = two_view_problem(n_points=n_points, noise=irreducible_px,
                         outlier_ratio=outliers, seed=seed)
    rng = np.random.default_rng(10_000 + seed)
    feats = rng.normal(size=(n_points, FEATURE_DIM)).astype(np.float32)
    # noisy inlier cue lives in the features too (confidence is learnable)
    cue = p["inlier_mask"].astype(np.float32) + rng.normal(
        scale=0.6, size=n_points).astype(np.float32)
    feats[:, 0] += cue
    # systematic bias: fixed linear map features -> 4D coordinate error
    A = np.linalg.qr(np.random.default_rng(777).normal(
        size=(FEATURE_DIM, FEATURE_DIM)))[0][:, :4]
    bias = (feats @ A) * (bias_px / 1000.0)  # calibrated units
    matches = p["matches"].copy()
    matches += bias.astype(np.float32)
    return p, matches.astype(np.float32), feats


def eval_auc(params, head, probs, raw_pts, feats, cfg_test, thr):
    """Pose AUC@5/10/20 with the head refining coordinates and driving the
    search with its confidences."""

    @jax.jit
    def search(f, pts, key):
        logits, off = head.apply({"params": params}, f)
        return ransac_test_fast(cfg_test, pts + off, logits, key,
                                threshold=thr, chunk=256, rescue_k=32)[0]

    errs = []
    for i, (p, x, f) in enumerate(zip(probs, raw_pts, feats)):
        E = search(jnp.asarray(f), jnp.asarray(x), jax.random.PRNGKey(i))
        clean = p["matches"]
        err_q, err_t = pose.evaluate_pose(
            E, jnp.asarray(clean[:, :2]), jnp.asarray(clean[:, 2:]),
            jnp.asarray(p["R"]), jnp.asarray(p["t"]), svd=True)
        errs.append(max(float(err_q), float(err_t)))
    return metrics.auc(errs, thresholds=(5, 10, 20)), errs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--pairs", type=int, default=16, help="training pairs")
    ap.add_argument("--eval_pairs", type=int, default=32)
    ap.add_argument("--nf", type=int, default=256)
    ap.add_argument("--bias_px", type=float, default=4.0,
                    help="systematic feature-predictable localization bias")
    ap.add_argument("--outliers", type=float, default=0.5)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--hypotheses", type=int, default=128,
                    help="training hypothesis budget per pair")
    ap.add_argument("--test_iterations", type=int, default=256,
                    help="eval search budget")
    ap.add_argument("--threshold_px", type=float, default=1.0,
                    help="search threshold in px (tight: localization "
                         "quality dominates)")
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
    thr = jnp.asarray(args.threshold_px / 1000.0, jnp.float32)

    train = [make_pair(s, args.nf, args.bias_px, args.outliers)
             for s in range(args.pairs)]
    held = [make_pair(10_000 + s, args.nf, args.bias_px, args.outliers)
            for s in range(args.eval_pairs)]

    head = MatcherHead()
    params = head.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, FEATURE_DIM)))["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    pts = jnp.asarray(np.stack([x for _, x, _ in train]))
    fts = jnp.asarray(np.stack([f for _, _, f in train]))
    gtE = jnp.asarray(np.stack([p["E"] for p, _, _ in train]))
    gtm = jnp.asarray(np.stack([p["inlier_mask"] for p, _, _ in train])
                      .astype(np.float32))

    def loss_fn(params, key):
        logits, off = head.apply({"params": params}, fts)  # (B, N), (B, N, 4)
        refined = pts + off
        keys = jax.random.split(key, pts.shape[0])
        losses = jax.vmap(
            lambda p, l, g, m, k: matcher_finetune_loss(cfg_train, p, l, g, m, k)
        )(refined, logits, gtE, gtm, keys)
        return jnp.mean(losses)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, \
            optax.global_norm(grads)

    probs_h = [p for p, _, _ in held]
    raw_h = [x for _, x, _ in held]
    feats_h = [f for _, _, f in held]
    params0 = params
    auc0, errs0 = eval_auc(params, head, probs_h, raw_h, feats_h, cfg_test, thr)
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

    auc1, errs1 = eval_auc(params, head, probs_h, raw_h, feats_h, cfg_test, thr)
    print(f"after : AUC@5/10/20 = {auc1[0]:.3f}/{auc1[1]:.3f}/{auc1[2]:.3f} "
          f"median_err={np.median(errs1):.2f}deg")

    def residual_px(params):
        """Mean remaining localization error of true-inlier matches after
        the head's correction — the direct evidence for gradient path 1."""
        res = []
        for p, x, f in zip(probs_h, raw_h, feats_h):
            _, off = head.apply({"params": params}, jnp.asarray(f))
            err = (x + np.asarray(off)) - p["matches"]
            m = p["inlier_mask"]
            res.append(float(np.linalg.norm(err[m], axis=-1).mean() * 1000))
        return float(np.mean(res))

    def separation(params):
        """Mean learned confidence of true inliers minus outliers —
        the (noisy) gradient path 2 diagnostic."""
        seps = []
        for p, _, f in zip(probs_h, raw_h, feats_h):
            lg, _ = head.apply({"params": params}, jnp.asarray(f))
            lg = np.asarray(lg)
            m = p["inlier_mask"]
            seps.append(float(lg[m].mean() - lg[~m].mean()))
        return float(np.mean(seps))

    res0, res1 = residual_px(params0), residual_px(params)
    sep0, sep1 = separation(params0), separation(params)
    print(f"inlier localization residual: {res0:.2f}px -> {res1:.2f}px")
    print(f"confidence separation (inlier - outlier logit): "
          f"{sep0:+.3f} -> {sep1:+.3f}")
    result = {
        "auc10_before": float(auc0[1]), "auc10_after": float(auc1[1]),
        "auc5_before": float(auc0[0]), "auc5_after": float(auc1[0]),
        "median_err_before": float(np.median(errs0)),
        "median_err_after": float(np.median(errs1)),
        "residual_px_before": res0, "residual_px_after": res1,
        "separation_before": sep0, "separation_after": sep1,
        "steps": args.steps, "outliers": args.outliers,
        "bias_px": args.bias_px,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
