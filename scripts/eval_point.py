#!/usr/bin/env python
"""3D rigid-registration evaluation (the reference ``test_magsac_point.py``
counterpart): RRE / RTE / RMSE / registration recall on 3DMatch-style data."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.config import ModelKind, session_string
from differentiable_ransac_tpu.data.datasets import ThreeDRecords
from differentiable_ransac_tpu.engine import ransac_test
from differentiable_ransac_tpu.models.clnet import select_prob_type
from differentiable_ransac_tpu.ops import metrics as M
from differentiable_ransac_tpu.train import create_optimizer, create_train_state, load_checkpoint
from differentiable_ransac_tpu.utils import MetricsLogger, build_parser, configs_from_args


def main():
    parser = build_parser("TPU ∇-RANSAC 3D registration eval")
    parser.add_argument("--num_points", "-max", type=int, default=4000)
    parser.add_argument("--use_network", "-us", type=int, default=1,
                        help="0: uniform weights, 1: CLNet weights")
    # -t semantics for 3D follow the reference's ``sigma_th=opt.threshold``
    # hand-off (``test_magsac_point.py:46-53``) — a user-provided -t is the
    # inlier threshold in metric (scene) units. The shared parser default
    # (0.75, tuned for pixel residuals) is senseless for 3D, so use a None
    # sentinel: only when -t was NOT passed fall back to 0.05, the scale of
    # the solver residual bound (rigid.py). An explicit ``-t 0.75`` is
    # honored.
    parser.set_defaults(threshold=None)
    parser.add_argument("--mesh", default=None,
                        help="multi-chip (pairs,hyp) mesh: 'P,H' or 'auto' "
                             "(all local devices on hyp); the adaptive "
                             "search is hypothesis-sharded with a global "
                             "stopping bound. Requires -bs divisible by P.")
    args = parser.parse_args()
    args.tr = 0
    thr3d = args.threshold if args.threshold is not None else 0.05
    args.threshold = thr3d
    tcfg, rcfg = configs_from_args(args)
    rcfg = rcfg.replace(model=ModelKind.RIGID, threshold=thr3d, max_iterations=5000)

    ds = ThreeDRecords([os.path.join(args.data_path, "test/")], num=args.num_points)

    if rcfg.sigma_max < 0:
        # -smax -1: σ_max from the data's own residual scale (pilot search;
        # see PARITY.md rigid stress cell — auto-σ was worth 4.5× RRE)
        from differentiable_ransac_tpu.engine import pilot_sigma_max

        b0 = next(iter(ThreeDRecords(
            [os.path.join(args.data_path, "test/")], num=args.num_points
        ).batches(tcfg.batch_size, drop_last=False)))
        corr0 = jnp.asarray(b0["correspondences"])[..., :6]
        mults = jax.jit(jax.vmap(
            lambda p, k: pilot_sigma_max(rcfg, p, jnp.zeros(p.shape[0], p.dtype), k)
        ))(corr0, jax.random.split(jax.random.PRNGKey(7), corr0.shape[0]))
        auto = round(float(np.median(np.asarray(mults))), 2)
        print(f"auto sigma_max = {auto} x threshold")
        rcfg = rcfg.replace(sigma_max=auto)
    model, state = create_train_state(
        jax.random.PRNGKey(0), tcfg, args.num_points, create_optimizer(tcfg)
    )
    if args.model:
        state = load_checkpoint(args.model, state)

    from differentiable_ransac_tpu.parallel import mesh_from_spec

    mesh = mesh_from_spec(args.mesh, tcfg.batch_size)

    @jax.jit
    def infer(params, batch_stats, corr, key):
        if args.use_network:
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              corr, train=False)
            weights = select_prob_type(out, int(tcfg.prob_type))
        else:
            weights = jnp.zeros(corr.shape[:2], corr.dtype)
        if mesh is not None:
            from differentiable_ransac_tpu.parallel import sharded_ransac_adaptive

            B = corr.shape[0]
            seeds = jax.random.randint(
                key, (B,), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
            thrs = jnp.full((B,), rcfg.threshold, corr.dtype)
            return sharded_ransac_adaptive(
                rcfg, mesh, corr[..., :6], weights, seeds, thrs)
        keys = jax.random.split(key, corr.shape[0])
        return jax.vmap(
            lambda p, w, k: ransac_test(rcfg, p[:, :6], w, k)
        )(corr, weights, keys)

    logger = MetricsLogger(args.out_dir, session_string("point_eval", tcfg, rcfg))
    rres, rtes, rmses = [], [], []
    t0, n_pairs = time.time(), 0
    for batch in ds.batches(tcfg.batch_size):
        models, masks, scores, iters = infer(
            state.params, state.batch_stats,
            jnp.asarray(batch["correspondences"]), jax.random.PRNGKey(0),
        )
        models = np.asarray(models)
        for b in range(models.shape[0]):
            gt = np.asarray(batch["gt_pose"][b])
            rre, rte = M.compute_registration_error(gt, models[b])
            src = np.asarray(batch["correspondences"][b][:, :3])
            rmse = M.registration_rmse(src, gt, models[b])
            rres.append(rre); rtes.append(rte); rmses.append(rmse)
        n_pairs += models.shape[0]

    recall = M.registration_recall(rmses)
    line = (f"RRE={np.mean(rres):.3f}deg RTE={np.mean(rtes):.4f} "
            f"RMSE={np.mean(rmses):.4f} RR={recall:.4f} "
            f"pairs/s={n_pairs / (time.time() - t0):.2f}")
    print(line)
    logger.log_text(line)
    logger.close()


if __name__ == "__main__":
    main()
