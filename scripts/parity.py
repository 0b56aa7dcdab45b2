#!/usr/bin/env python
"""Head-to-head parity harness: the torch reference vs this framework on
IDENTICAL synthetic scenes.

Both pipelines consume the same reference-format 15-field ``.npy`` records
(written by ``write_synthetic_two_view_record``) and the same pretrained
CLNet weights — the reference loads its shipped checkpoint directly
(``/root/reference/pretrained_models/``), this framework loads the SAME
checkpoint through the tensor-for-tensor importer
(``data/torch_import.py``, forward-parity ≤ 4e-5). What is compared is
therefore the full eval pipeline semantics: data loading → weight
prediction → adaptive RANSAC search → refit → metrics.

Reference side mirrors ``/root/reference/test.py:8-106`` exactly (its own
Dataset, DeepRansac_CLNet.forward in predict mode, its own
eval_essential_matrix / f_error / AUC); our side runs
``evaluate.make_eval_step`` + our metric stack.

Usage:
    python scripts/parity.py --scenes 16 --nf 500 --noise 1.0 \
        --outliers 0.4 --out PARITY.md
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"


def generate_records(folder: str, n_scenes: int, nf: int, noise: float,
                     outliers: float, seed0: int, realistic: bool = False):
    from differentiable_ransac_tpu.data.datasets import (
        write_synthetic_two_view_record,
    )

    os.makedirs(folder, exist_ok=True)
    for i in range(n_scenes):
        write_synthetic_two_view_record(
            os.path.join(folder, f"pair_{i:04d}.npy"),
            n_points=nf, seed=seed0 + i, noise=noise, outlier_ratio=outliers,
            realistic=realistic,
        )


def run_reference(folder: str, args):
    """The reference's own test.py pipeline (torch CPU), imported in place."""
    sys.path.insert(0, REFERENCE)
    import torch
    from datasets import Dataset as RefDataset
    from model_cl import DeepRansac_CLNet
    from cv_utils import eval_essential_matrix, f_error, AUC
    from utils import create_parser

    opt = create_parser("parity-reference").parse_args([])
    opt.device = "cpu"
    opt.fmat = args.fmat
    # sampler id 2 = Gumbel-softmax mask-select branch (ransac.py:58-65) —
    # the only in-framework sampler that works in the reference's test path
    # (id 1 routes to `sampler.sample()` argless and crashes on float
    # indices; id 0's UniformSampler.sample() has the batch_generate bug,
    # SURVEY §2.2); id 3 = Gumbel 8PC for F.
    opt.sampler = 3 if args.fmat else 2
    opt.threshold = args.threshold
    opt.precision = 1
    opt.tr = 0
    opt.nfeatures = args.nf

    model = DeepRansac_CLNet(opt)
    sd = torch.load(args.ckpt, map_location="cpu")
    model.load_state_dict(sd)
    model.eval()

    ds = RefDataset([folder + "/"], opt.snn, opt.nfeatures, fmat=bool(opt.fmat))
    loader = torch.utils.data.DataLoader(ds, batch_size=args.batch_size,
                                         shuffle=False)

    max_errors, f1s, epis, est_models = [], [], [], []
    scene_f1s = []  # per-scene −F1 (F mode), parallel to est_models
    search_time = 0.0
    with torch.no_grad():
        for td in loader:
            corr = td["correspondences"].float()
            K1, K2 = td["K1"].float(), td["K2"].float()
            s1, s2 = td["im_size1"].float(), td["im_size2"].float()
            t0 = time.perf_counter()
            models, weights, _ = model(corr, K1, K2, s1, s2)
            search_time += time.perf_counter() - t0
            for b, est in enumerate(models):
                if opt.fmat:
                    import cv2
                    from cv_utils import denormalize_pts_inplace

                    E = K2[b].transpose(-1, -2) @ est @ K1[b]
                    denormalize_pts_inplace(corr[b, 0:2], s1[b])
                    denormalize_pts_inplace(corr[b, 2:4], s2[b])
                    pts1 = corr[b, 0:2].numpy()
                    pts2 = corr[b, 2:4].numpy()
                    valid, F1, _, epi = f_error(
                        pts1, pts2, est.numpy(), td["gt_F"][b].float().numpy(),
                        0.75)
                    if valid:
                        f1s.append(F1)
                        epis.append(epi)
                    scene_f1s.append(-float(F1) if valid else 0.0)
                    pts1 = cv2.undistortPoints(
                        pts1.transpose(2, 1, 0), K1[b].numpy(), None)
                    pts2 = cv2.undistortPoints(
                        pts2.transpose(2, 1, 0), K2[b].numpy(), None)
                    errR, errT = eval_essential_matrix(
                        pts1.squeeze(), pts2.squeeze(), E,
                        td["gt_R"][b].float(), td["gt_t"][b].float())
                else:
                    pts1 = corr[b, 0:2].squeeze(-1).numpy().T
                    pts2 = corr[b, 2:4].squeeze(-1).numpy().T
                    errR, errT = eval_essential_matrix(
                        pts1, pts2, est, td["gt_R"][b].float(),
                        td["gt_t"][b].float())
                max_errors.append(max(float(errR), float(errT)))
                est_models.append(np.asarray(est))
    sys.path.remove(REFERENCE)

    out = {
        "AUC@5": AUC(max_errors)[0],
        "AUC@10": AUC(max_errors)[1],
        "AUC@20": AUC(max_errors)[2],
        "median_pose_error": float(np.median(max_errors)),
        "search_s_per_pair": search_time / len(max_errors),
    }
    if args.fmat:
        out["F1"] = float(np.mean(f1s)) if f1s else 0.0
        out["median_epi_error"] = float(np.median(epis)) if epis else float("nan")
    return out, (scene_f1s if args.fmat else max_errors), est_models


def generate_rigid_records(folder: str, n_scenes: int, nf: int, noise: float,
                           outliers: float, seed0: int, realistic: bool = False):
    from differentiable_ransac_tpu.data.datasets import (
        write_synthetic_rigid_record,
    )

    os.makedirs(folder, exist_ok=True)
    for i in range(n_scenes):
        write_synthetic_rigid_record(
            os.path.join(folder, f"scan_{i:04d}.npz"),
            n_points=nf, seed=seed0 + i, noise=noise, outlier_ratio=outliers,
            mismatch_outliers=0.8 if realistic else 0.0,
        )


def run_reference_rigid(folder: str, args):
    """The reference's 3D pipeline (torch CPU) driven through its own
    components: ``Dataset3D`` → ``GumbelSoftmaxSampler`` →
    ``RigidTransformationSVDBasedSolver`` → residual scoring → refit.

    The reference's first-party 3D path is unrunnable/broken as shipped,
    in three independent ways:

    1. ``RANSAC3D``'s test branch references undefined ``scores`` /
       ``inlier_masks`` (the scoring call is commented out,
       ``/root/reference/ransac.py:387-390``); its intended eval hands off
       to ``pymagsac`` (absent here).
    2. ``estimate_model``'s default ``flag=True`` takes
       ``svd(covᵀ·cov)`` (``rigid_…_solver.py:51-52``) — for ``covᵀcov =
       V S² Vᵀ`` this yields ``R = V Vᵀ = I``: every hypothesis carries an
       identity rotation.
    3. Even with ``flag=False``, the composed model stores ``R`` in the
       transposed convention relative to its own ``squared_residual``
       (``t = −Rᵀc₀ + c₁`` at ``:66`` implies ``p₂ = Rᵀp₁ + t``, but
       ``squared_residual`` applies ``R p₁ + t``, ``:84-89``).

    This driver therefore reports TWO reference variants: ``as shipped``
    (defaults, scoring repaired to the inlier count the commented-out line
    implies) and ``repaired`` (``flag=False`` + transposed composition, the
    solver the reference evidently intended). Metrics are the reference's
    own ``registration_utils``. The paper's 3D numbers come from pymagsac,
    not this solver (``test_magsac_point.py:46-53``).
    """
    sys.path.insert(0, REFERENCE)
    import torch
    from datasets import Dataset3D
    from estimators.rigid_transformation_SVD_based_solver import (
        RigidTransformationSVDBasedSolver,
    )
    from samplers.gumbel_sampler import GumbelSoftmaxSampler
    from registration_utils import compute_registration_error

    est = RigidTransformationSVDBasedSolver(device="cpu")
    sampler = GumbelSoftmaxSampler(64, 3, device="cpu",
                                   data_type=torch.float32)
    ds = Dataset3D([folder + "/"], num=args.nf)
    loader = torch.utils.data.DataLoader(ds, batch_size=1, shuffle=False)

    def solve(minimal, repaired):
        models, R, t, _ = est.estimate_model(minimal, flag=not repaired)
        if repaired and models.shape[0] > 0:
            fixed = models.clone()
            fixed[:, :3, :3] = models[:, :3, :3].transpose(-1, -2)
            models = fixed
        return models

    variants = {"as shipped": False, "repaired": True}
    outs, rmse_map, model_map = {}, {}, {}
    for vname, repaired in variants.items():
        rres, rtes, rmses, est_models = [], [], [], []
        search_time = 0.0
        with torch.no_grad():
            for td in loader:
                matches = td["correspondences"][0].float()  # (N, 7)
                pts = matches[:, :6]
                gt = td["gt_pose"][0].numpy()
                logits = torch.zeros(pts.shape[0])
                t0 = time.perf_counter()
                best_score, best_model, best_mask = -1, torch.eye(4), None
                iterations = 0
                while iterations < args.rigid_iterations:
                    samples, _ = sampler.sample(logits)
                    sel = pts.repeat([samples.shape[0], 1, 1]) * samples.unsqueeze(-1)
                    minimal = sel[samples != 0].view(samples.shape[0], -1, 6)
                    models = solve(minimal, repaired)
                    if models.shape[0] == 0:
                        iterations += samples.shape[0]
                        continue
                    _, _, masks = est.squared_residual(
                        pts[:, :3], pts[:, 3:],
                        models[:, :3, :].transpose(-1, -2), threshold=0.03)
                    scores = masks.sum(-1)
                    bi = torch.argmax(scores)
                    if float(scores[bi]) > best_score:
                        best_score = float(scores[bi])
                        best_model = models[bi]
                        best_mask = masks[bi]
                    iterations += samples.shape[0]
                if best_mask is not None and best_mask.sum() >= 3:
                    inl = pts[best_mask.nonzero(as_tuple=True)[0]].unsqueeze(0)
                    refit = solve(inl, repaired)
                    if refit.shape[0] > 0:
                        _, _, m2 = est.squared_residual(
                            pts[:, :3], pts[:, 3:],
                            refit[:, :3, :].transpose(-1, -2), threshold=0.03)
                        if float(m2[0].sum()) >= best_score:
                            best_model = refit[0]
                search_time += time.perf_counter() - t0
                estT = best_model.numpy()
                rre, rte = compute_registration_error(gt, estT)
                src = pts[:, :3].numpy()
                rmse = float(np.sqrt(np.mean(np.sum(
                    ((src @ gt[:3, :3].T + gt[:3, 3])
                     - (src @ estT[:3, :3].T + estT[:3, 3])) ** 2, axis=1))))
                rres.append(rre); rtes.append(rte); rmses.append(rmse)
                est_models.append(estT)
        outs[vname] = {
            "RRE_deg": float(np.mean(rres)),
            "RTE": float(np.mean(rtes)),
            "RMSE": float(np.mean(rmses)),
            "recall@0.2": float(np.mean(np.asarray(rmses) < 0.2)),
            "search_s_per_pair": search_time / len(rres),
        }
        rmse_map[vname] = rmses
        model_map[vname] = est_models
    sys.path.remove(REFERENCE)
    return outs, rmse_map["repaired"], model_map["repaired"]


def run_ours_rigid(folder: str, args):
    """This framework's 3D pipeline (``eval_point.py`` semantics, uniform
    weights) on the same records."""
    import jax
    import jax.numpy as jnp

    from differentiable_ransac_tpu.config import (
        ModelKind, RansacConfig, SamplerKind, ScoringKind,
    )
    from differentiable_ransac_tpu.data.datasets import ThreeDRecords
    from differentiable_ransac_tpu.engine import pilot_sigma_max, ransac_test
    from differentiable_ransac_tpu.ops import metrics as M

    rcfg = RansacConfig(model=ModelKind.RIGID, sampler=SamplerKind.GUMBEL,
                        threshold=0.03, max_iterations=args.rigid_iterations,
                        scoring=(ScoringKind.MAGSAC if args.scoring == "magsac"
                                 else ScoringKind.MSAC),
                        sigma_max=max(args.sigma_max, 0.0))
    ds = ThreeDRecords([folder + "/"], num=args.nf)

    net_apply = None
    if getattr(args, "our_ckpt", None):
        # self-trained rigid CLNet ('trained here' column, VERDICT r4 task 1):
        # weights predicted from the (N, 7) xyz|xyz'|score correspondences
        from differentiable_ransac_tpu.config import TrainConfig
        from differentiable_ransac_tpu.models.clnet import select_prob_type
        from differentiable_ransac_tpu.train import (
            create_optimizer, create_train_state, load_checkpoint,
        )

        tcfg = TrainConfig(nfeatures=args.nf)
        model, state = create_train_state(
            jax.random.PRNGKey(0), tcfg, args.nf, create_optimizer(tcfg))
        state = load_checkpoint(args.our_ckpt, state)
        params, bstats = state.params, state.batch_stats
        prob = int(getattr(args, "prob", 0))

        def net_apply(corr):
            out = model.apply({"params": params, "batch_stats": bstats},
                              corr, train=False)
            return select_prob_type(out, prob)

    rigid_per_pair = (args.sigma_max < 0
                      and getattr(args, "sigma_mode", "scene") == "pair")
    if args.sigma_max < 0 and not rigid_per_pair:
        # auto σ from the first scan's residual scale (per-SCENE median)
        b0 = next(iter(ThreeDRecords([folder + "/"], num=args.nf)
                       .batches(args.batch_size, drop_last=False)))
        corr0 = jnp.asarray(b0["correspondences"])[..., :6]
        mults = jax.jit(jax.vmap(
            lambda p, k: pilot_sigma_max(
                rcfg, p, jnp.zeros(p.shape[0], p.dtype), k)
        ))(corr0, jax.random.split(jax.random.PRNGKey(7), corr0.shape[0]))
        auto = float(np.median(np.asarray(mults)))
        print(f"auto sigma_max (rigid): {auto:.2f} x threshold")
        rcfg = rcfg.replace(sigma_max=auto)
    elif rigid_per_pair:
        print("sigma_max (rigid): per-pair pilot σ̂ (traced sigma_mult)")

    @jax.jit
    def infer(corr, key):
        keys = jax.random.split(key, corr.shape[0])
        if net_apply is not None:
            weights = net_apply(corr)
        else:
            weights = jnp.zeros(corr.shape[:2], corr.dtype)
        if rigid_per_pair:
            # per-pair σ̂ (VERDICT r4 task 8): each scan's own pilot
            # estimate feeds the traced sigma_mult
            sm = jax.vmap(
                lambda p, w, k: pilot_sigma_max(rcfg, p[:, :6], w, k)
            )(corr, weights,
              jax.random.split(jax.random.PRNGKey(7), corr.shape[0]))
            return jax.vmap(
                lambda p, w, k, s: ransac_test(rcfg, p[:, :6], w, k,
                                               sigma_mult=s)
            )(corr, weights, keys, sm)
        return jax.vmap(
            lambda p, w, k: ransac_test(rcfg, p[:, :6], w, k)
        )(corr, weights, keys)

    per_key = []
    warmed = False
    for ki in range(max(1, args.keys)):
        rres, rtes, rmses, est_models = [], [], [], []
        search_time = 0.0
        for batch in ds.batches(args.batch_size, drop_last=False):
            corr = jnp.asarray(batch["correspondences"])
            if not warmed:
                jax.block_until_ready(infer(corr, jax.random.PRNGKey(0))[0])
                warmed = True
            t0 = time.perf_counter()
            models, masks, scores, iters = infer(corr, jax.random.PRNGKey(ki))
            jax.block_until_ready(models)
            search_time += time.perf_counter() - t0
            models = np.asarray(models)
            for b in range(models.shape[0]):
                gt = np.asarray(batch["gt_pose"][b])
                rre, rte = M.compute_registration_error(gt, models[b])
                src = np.asarray(batch["correspondences"][b][:, :3])
                rmse = M.registration_rmse(src, gt, models[b])
                rres.append(rre); rtes.append(rte); rmses.append(rmse)
                est_models.append(models[b])
        out = {
            "RRE_deg": float(np.mean(rres)),
            "RTE": float(np.mean(rtes)),
            "RMSE": float(np.mean(rmses)),
            "recall@0.2": float(np.mean(np.asarray(rmses) < 0.2)),
            "search_s_per_pair": search_time / len(rres),
        }
        per_key.append(out)
        if args.keys > 1:
            print(f"ours key{ki}:", {k: round(v, 4) for k, v in out.items()})
    out = {k: float(np.mean([a[k] for a in per_key])) for k in per_key[0]}
    return out, rmses, est_models


def run_ours(folder: str, args):
    """This framework's eval pipeline with the SAME (imported) weights."""
    import jax
    import jax.numpy as jnp

    from differentiable_ransac_tpu.config import (
        ModelKind, RansacConfig, SamplerKind, ScoringKind,
    )
    from differentiable_ransac_tpu.data.datasets import TwoViewRecords
    from differentiable_ransac_tpu.data.torch_import import load_reference_clnet
    from differentiable_ransac_tpu.evaluate import (
        aggregate_essential,
        aggregate_fundamental,
        evaluate_essential_batch,
        evaluate_fundamental_batch,
        make_eval_step,
    )
    from differentiable_ransac_tpu.models.clnet import CLNet

    rcfg = RansacConfig(
        model=ModelKind.FUNDAMENTAL if args.fmat else ModelKind.ESSENTIAL,
        sampler=SamplerKind.GUMBEL_8PT if args.fmat else SamplerKind.GUMBEL,
        threshold=args.threshold,
        max_iterations=5000,
        scoring=(ScoringKind.MAGSAC if args.scoring == "magsac"
                 else ScoringKind.MSAC),
        sigma_max=args.sigma_max,
        prescreen=args.prescreen,
    )
    if getattr(args, "our_ckpt", None):
        # self-trained weights (task: train-from-scratch parity): load the
        # train.py pickle checkpoint into a fresh CLNet state
        from differentiable_ransac_tpu.config import TrainConfig
        from differentiable_ransac_tpu.train import (
            create_optimizer, create_train_state, load_checkpoint,
        )

        tcfg = TrainConfig(nfeatures=args.nf)
        model, state = create_train_state(
            jax.random.PRNGKey(0), tcfg, args.nf, create_optimizer(tcfg),
            sampling_rate=getattr(args, "our_sr", 1.0))
        state = load_checkpoint(args.our_ckpt, state)
        params, bstats = state.params, state.batch_stats
    else:
        params, bstats = load_reference_clnet(args.ckpt)
        model = CLNet()

    ds = TwoViewRecords([folder + "/"], 0.8, args.nf, rcfg.fmat)

    per_pair_sigma = None
    if args.sigma_max < 0:  # auto: estimate the noise scale from the data
        from differentiable_ransac_tpu.engine import (
            normalized_threshold, pilot_sigma_max,
        )
        from differentiable_ransac_tpu.evaluate import _prepare_pair_points

        def pilot_mults(batch):
            pts = _prepare_pair_points(
                {k: jnp.asarray(v) for k, v in batch.items()}, rcfg.fmat)
            if rcfg.fmat:
                thr = jnp.full((pts.shape[0],), rcfg.threshold, pts.dtype)
            else:
                thr = jax.vmap(
                    lambda K1, K2: normalized_threshold(rcfg, K1, K2)
                )(jnp.asarray(batch["K1"]), jnp.asarray(batch["K2"])
                  ).astype(pts.dtype)
            return jax.jit(jax.vmap(
                lambda p, t, k: pilot_sigma_max(
                    rcfg, p, jnp.zeros(p.shape[0], p.dtype), k, threshold=t)
            ))(pts, thr, jax.random.split(jax.random.PRNGKey(7), pts.shape[0]))

        if args.sigma_mode == "pair":
            # per-pair traced σ̂ (VERDICT r4 task 8): each pair's own pilot
            # estimate rides the already-traced sigma_mult input
            per_pair_sigma = pilot_mults
            print("sigma_max: per-pair pilot σ̂ (traced sigma_mult)")
        else:
            # fresh dataset instance: consuming a pilot batch must not
            # advance the eval dataset's stateful padding rng
            ds_pilot = TwoViewRecords([folder + "/"], 0.8, args.nf, rcfg.fmat)
            mults = pilot_mults(next(iter(ds_pilot.batches(args.batch_size))))
            auto = float(np.median(np.asarray(mults)))
            print(f"auto sigma_max: {auto:.2f} x threshold "
                  f"(per-pair range {float(np.min(mults)):.2f}-"
                  f"{float(np.max(mults)):.2f})")
            rcfg = rcfg.replace(sigma_max=auto)

    eval_fn = make_eval_step(model, rcfg, prob_type=getattr(args, "prob", 0),
                             fast=not args.exact,
                             chunk=args.chunk, rescue_k=args.rescue_k,
                             rescue_refine=args.rescue_refine)
    def permute_side(batch):
        """Side-channel ablation (VERDICT r4 task 2 'done' criterion): shuffle
        channels 4:7 (SNN ratio, scale ratio, Δangle) ACROSS correspondences
        per pair — marginals preserved, correlation with inlier status
        destroyed. A trained net that uses the side channels must lose
        accuracy under this."""
        if not getattr(args, "permute_side", 0):
            return batch
        rngp = np.random.default_rng(12345)
        c = np.array(batch["correspondences"])
        for b in range(c.shape[0]):
            c[b, :, 4:7] = c[b, rngp.permutation(c.shape[1]), 4:7]
        out = dict(batch)
        out["correspondences"] = c
        return out

    per_key_aggs = []
    warmed = False
    sigma_cache = {}
    for ki in range(max(1, args.keys)):
        results = []
        est_models = []
        search_time = 0.0
        n_pairs = 0
        for bi, batch in enumerate(ds.batches(args.batch_size)):
            batch = permute_side(batch)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            sm = None
            if per_pair_sigma is not None:
                sigma_cache.setdefault(bi, per_pair_sigma(batch))
                sm = sigma_cache[bi]
            if not warmed:  # compile outside the timed region
                jax.block_until_ready(
                    eval_fn(params, bstats, jb, jax.random.PRNGKey(0),
                            sigma_mult=sm)[0])
                warmed = True
            t0 = time.perf_counter()
            models, masks, scores, iters, w = eval_fn(
                params, bstats, jb, jax.random.PRNGKey(ki), sigma_mult=sm)
            jax.block_until_ready(models)
            search_time += time.perf_counter() - t0
            n_pairs += models.shape[0]
            est_models.append(np.asarray(models))
            if rcfg.fmat:
                results += evaluate_fundamental_batch(models, batch, 0.75)
            else:
                results += evaluate_essential_batch(models, batch)
        agg = (aggregate_fundamental if rcfg.fmat
               else aggregate_essential)(results)
        agg["search_s_per_pair"] = search_time / max(n_pairs, 1)
        per_key_aggs.append(agg)
        if args.keys > 1:
            print(f"ours key{ki}:",
                  {k: round(v, 4) for k, v in agg.items()})
    # per-scene comparison values from the LAST key: pose error (E) / F1 (F)
    errs = [r.get("err_pose", -r.get("F1", 0.0)) for r in results]
    # single-run AUCs move by ±0.08-0.10 at high noise (PARITY.md) — with
    # --keys N report the mean over independent search keys
    agg = {k: float(np.mean([a[k] for a in per_key_aggs]))
           for k in per_key_aggs[0]}
    return agg, errs, np.concatenate(est_models, axis=0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--nf", type=int, default=500)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--outliers", type=float, default=0.4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fmat", type=int, default=0)
    ap.add_argument("--rigid", type=int, default=0,
                    help="1: 3D rigid-registration parity (RRE/RTE/RMSE/"
                         "recall) instead of E/F")
    ap.add_argument("--rigid_iterations", type=int, default=2048,
                    help="fixed hypothesis budget for BOTH sides in rigid "
                         "mode (the ref's adaptive path is unrunnable, so "
                         "equal budgets keep the comparison fair)")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--ckpt", default=os.path.join(
        REFERENCE, "pretrained_models/saved_model_5PC_l_epi/model.net"))
    ap.add_argument("--scoring", choices=["msac", "magsac"], default="msac",
                    help="our-side model-selection quality: plain MSAC or "
                         "σ-marginalized MAGSAC++ consensus during the "
                         "search (the reference has no runnable in-tree "
                         "counterpart for the latter — its MAGSAC path "
                         "shells out to the absent pymagsac)")
    ap.add_argument("--keys", type=int, default=1,
                    help="run our side with N independent search keys and "
                         "report the mean (single-run AUCs carry ±0.08-0.10 "
                         "spread at high noise; the reference side stays "
                         "one run of its own stochastic pipeline)")
    ap.add_argument("--sigma_max", type=float, default=0.0,
                    help="MAGSAC sigma_max as a multiple of the threshold "
                         "(0 -> 1.0, the reference's sigma_th=threshold "
                         "hand-off); raise so 3.64*sigma_max covers the "
                         "true noise scale when the threshold is "
                         "misspecified low")
    ap.add_argument("--sigma_mode", choices=["scene", "pair"],
                    default="scene",
                    help="with --sigma_max -1: 'scene' estimates ONE σ̂ "
                         "(median of a pilot batch, the r4 behavior); "
                         "'pair' feeds each pair its OWN pilot σ̂ through "
                         "the traced sigma_mult (VERDICT r4 task 8)")
    ap.add_argument("--prescreen", type=int, default=0,
                    help="fast-engine ranking-subset size (0 -> engine "
                         "default 256); raise toward nf for less ranking "
                         "noise at high outlier/noise levels")
    ap.add_argument("--chunk", type=int, default=512,
                    help="fast-engine hypothesis chunk width")
    ap.add_argument("--rescue_refine", type=int, default=16,
                    help="two-stage rescue: f64-re-solve only the best "
                         "rescue_refine of the carried samples after a "
                         "full-point f32 re-rank (0 = f64 for all)")
    ap.add_argument("--rescue_k", type=int, default=64,
                    help="fast-engine carried top-k re-solved at f64")
    ap.add_argument("--exact", action="store_true",
                    help="use the all-f64 reference-semantics search "
                         "(ransac_test) instead of the fast engine")
    ap.add_argument("--our_ckpt", default=None,
                    help="evaluate THIS framework's own trained checkpoint "
                         "(train.py pickle, written by save_checkpoint) "
                         "instead of the imported reference weights — the "
                         "'trained here' PARITY column")
    ap.add_argument("--realistic", type=int, default=1,
                    help="1 (default): distribution-honest records (SIFT-"
                         "like correlated side channels, keypoint-pool "
                         "mismatch outliers, varied intrinsics, scene "
                         "mixture); 0: the round-≤4 uncorrelated-noise "
                         "generator (reproduces the historical tables)")
    ap.add_argument("--permute_side", type=int, default=0,
                    help="ablation: shuffle the side channels (ratio/scale/"
                         "angle) across correspondences on OUR side before "
                         "the network — measures how much the net relies "
                         "on them")
    ap.add_argument("--our_sr", type=float, default=1.0,
                    help="CLNet sampling_rate for --our_ckpt (match the "
                         "value the checkpoint was trained with)")
    ap.add_argument("--prob", type=int, default=0,
                    help="prob_type fed to the sampler (0 normalized "
                         "weights — the reference predict path; 2 logits — "
                         "what our from-scratch training uses)")
    ap.add_argument("--skip_reference", action="store_true")
    ap.add_argument("--data_dir", default=None,
                    help="reuse an existing record folder instead of "
                         "generating")
    ap.add_argument("--out", default=None, help="append results to this md file")
    ap.add_argument("--dump", default=None,
                    help="save per-scene estimated models (.npz) for "
                         "cross-metric analysis")
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX side onto CPU (the axon TPU plugin "
                         "ignores JAX_PLATFORMS; this uses jax.config)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.data_dir:
        folder = args.data_dir
    else:
        folder = tempfile.mkdtemp(prefix="parity_")
        gen = generate_rigid_records if args.rigid else generate_records
        gen(folder, args.scenes, args.nf, args.noise,
            args.outliers, args.seed, realistic=bool(args.realistic))
    print(f"records: {folder} ({args.scenes} scenes, nf={args.nf}, "
          f"noise={args.noise}{'' if args.rigid else 'px'}, "
          f"outliers={args.outliers}, realistic={bool(args.realistic)})")

    if args.rigid:
        ours, our_errs, our_models = run_ours_rigid(folder, args)
        print("ours     :", {k: round(v, 4) for k, v in ours.items()})
        refs = {}
        if not args.skip_reference:
            refs, ref_errs, ref_models = run_reference_rigid(folder, args)
            for vn, r in refs.items():
                print(f"reference ({vn}):", {k: round(v, 4) for k, v in r.items()})
        if args.out:
            with open(args.out, "a") as f:
                tag = ", self-trained ckpt" if args.our_ckpt else ""
                if args.sigma_mode == "pair" and args.sigma_max < 0:
                    tag += ", per-pair sigma"
                f.write(f"\n### rigid 3D, {args.scenes} scenes, nf={args.nf},"
                        f" noise={args.noise}, outliers={args.outliers}, "
                        f"H={args.rigid_iterations}, seed={args.seed}, "
                        f"realistic={bool(args.realistic)}{tag}\n\n")
                keys = sorted(ours)
                f.write("| metric | ref (as shipped) | ref (repaired) "
                        "| this framework |\n|---|---|---|---|\n")
                for k in keys:
                    r1 = (f"{refs['as shipped'][k]:.4f}"
                          if "as shipped" in refs else "—")
                    r2 = (f"{refs['repaired'][k]:.4f}"
                          if "repaired" in refs else "—")
                    f.write(f"| {k} | {r1} | {r2} | {ours[k]:.4f} |\n")
        return 0

    ours, our_errs, our_models = run_ours(folder, args)
    print("ours     :", {k: round(v, 4) for k, v in ours.items()})
    if not args.skip_reference:
        ref, ref_errs, ref_models = run_reference(folder, args)
        print("reference:", {k: round(v, 4) for k, v in ref.items()})
        if our_errs is not None and len(our_errs) == len(ref_errs):
            print("per-scene max pose error (ref vs ours):")
            for i, (re_, oe) in enumerate(zip(ref_errs, our_errs)):
                flag = " <-- ours worse" if oe > re_ + 1.0 else (
                    " <-- ours better" if re_ > oe + 1.0 else "")
                print(f"  scene {i:3d}: ref {re_:7.2f}  ours {oe:7.2f}{flag}")
        if args.dump:
            np.savez(args.dump, ref_models=np.stack(ref_models),
                     our_models=our_models,
                     ref_errs=np.asarray(ref_errs),
                     our_errs=np.asarray(our_errs if our_errs else []))
            print(f"dumped models to {args.dump}")
    else:
        ref = None
        if args.dump:
            # ours-only dump (cross_metric_audit.py accepts a missing
            # ref_models via an empty array)
            np.savez(args.dump, ref_models=np.zeros((0, 3, 3)),
                     our_models=our_models,
                     our_errs=np.asarray(our_errs if our_errs else []))
            print(f"dumped models to {args.dump}")

    if args.out:
        mode = "F" if args.fmat else "E"
        with open(args.out, "a") as f:
            scor = "" if args.scoring == "msac" else f", ours={args.scoring}"
            if args.sigma_mode == "pair" and args.sigma_max < 0:
                scor += ", per-pair sigma"
            tag = ", self-trained ckpt" if args.our_ckpt else ""
            tag += ", PERMUTED side channels" if args.permute_side else ""
            f.write(f"\n### {mode}-mode, {args.scenes} scenes, nf={args.nf}, "
                    f"noise={args.noise}px, outliers={args.outliers}, "
                    f"t={args.threshold}, seed={args.seed}, "
                    f"realistic={bool(args.realistic)}{scor}{tag}\n\n")
            keys = sorted(set(ours) | set(ref or {}))
            f.write("| metric | reference (torch CPU) | this framework |\n")
            f.write("|---|---|---|\n")
            for k in keys:
                rv = f"{ref[k]:.4f}" if ref and k in ref else "—"
                ov = f"{ours[k]:.4f}" if k in ours else "—"
                f.write(f"| {k} | {rv} | {ov} |\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
