#!/usr/bin/env python
"""3D rigid-registration training (the reference ``train_point.py``
counterpart, ``/root/reference/train_point.py:9-135``): mean hypothesis
residual loss on 3DMatch-style records, with full orbax resume (params,
optimizer, RNG, data cursor) and per-epoch validation (RRE/RTE/recall via
the adaptive eval engine with the in-training network weights) — neither of
which the reference has.

Example:
    python scripts/make_synthetic_corpus.py --rigid 1 --out data_rigid \
        --train 1024 --valid 32 --nf 1000
    python scripts/train_point.py -pth data_rigid -nf 1000 -bs 8 -e 12 \
        -lr 2e-4 --num_points 1000
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.checkpoint import CheckpointManager, DataPosition
from differentiable_ransac_tpu.config import ModelKind, session_string
from differentiable_ransac_tpu.data.datasets import ThreeDRecords
from differentiable_ransac_tpu.train import (
    create_optimizer,
    create_train_state,
    load_checkpoint,
    make_train_step_rigid,
    save_checkpoint,
)
from differentiable_ransac_tpu.utils import MetricsLogger, build_parser, configs_from_args


def make_rigid_validation_fn(model, tcfg, rcfg):
    """Per-epoch validation: adaptive eval search with the current network
    weights on the test split; reports mean RRE/RTE and recall@0.2."""
    from differentiable_ransac_tpu.engine import ransac_test
    from differentiable_ransac_tpu.models.clnet import select_prob_type
    from differentiable_ransac_tpu.ops import metrics as M

    eval_cfg = rcfg.replace(max_iterations=2000)

    @jax.jit
    def infer(params, batch_stats, corr, key):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          corr, train=False)
        weights = select_prob_type(out, int(tcfg.prob_type))
        keys = jax.random.split(key, corr.shape[0])
        return jax.vmap(
            lambda p, w, k: ransac_test(eval_cfg, p[:, :6], w, k)
        )(corr, weights, keys)

    def validate(state, ds, key):
        rres, rtes, rmses = [], [], []
        for batch in ds.batches(tcfg.batch_size, drop_last=False):
            models, _, _, _ = infer(state.params, state.batch_stats,
                                    jnp.asarray(batch["correspondences"]), key)
            models = np.asarray(models)
            for b in range(models.shape[0]):
                gt = np.asarray(batch["gt_pose"][b])
                rre, rte = M.compute_registration_error(gt, models[b])
                src = np.asarray(batch["correspondences"][b][:, :3])
                rres.append(rre)
                rtes.append(rte)
                rmses.append(M.registration_rmse(src, gt, models[b]))
        return {
            "RRE_deg": float(np.mean(rres)),
            "RTE": float(np.mean(rtes)),
            "recall@0.2": float(np.mean(np.asarray(rmses) < 0.2)),
        }

    return validate


def main():
    parser = build_parser("TPU ∇-RANSAC 3D registration training")
    parser.add_argument("--num_points", "-max", type=int, default=4000)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest orbax checkpoint in the "
                             "session dir (full state: params, opt, step, "
                             "RNG, data position)")
    parser.add_argument("--mesh", default=None,
                        help="multi-chip (pairs,hyp) mesh: 'P,H' or 'auto'; "
                             "hypothesis generation + residual loss are "
                             "sharded. Requires -bs divisible by P.")
    args = parser.parse_args()
    args.tr = 1
    tcfg, rcfg = configs_from_args(args)
    rcfg = rcfg.replace(model=ModelKind.RIGID, threshold=0.03, max_iterations=1000)

    from differentiable_ransac_tpu.parallel import mesh_from_spec

    mesh = mesh_from_spec(args.mesh, tcfg.batch_size)

    ds = ThreeDRecords([os.path.join(args.data_path, "train/")], num=args.num_points)
    valid_dir = os.path.join(args.data_path, "test/")
    valid_ds = (ThreeDRecords([valid_dir], num=args.num_points)
                if os.path.isdir(valid_dir) else None)
    tx = create_optimizer(tcfg, steps_per_epoch=max(1, len(ds) // tcfg.batch_size))
    model, state = create_train_state(jax.random.PRNGKey(tcfg.seed), tcfg, args.num_points, tx)
    if args.model:
        state = load_checkpoint(args.model, state)
    if mesh is not None:
        from differentiable_ransac_tpu.train import make_train_step_rigid_mesh

        step_fn = make_train_step_rigid_mesh(model, tx, tcfg, rcfg, mesh)
    else:
        step_fn = make_train_step_rigid(model, tx, tcfg, rcfg)
    logger = MetricsLogger(args.out_dir, session_string("point", tcfg, rcfg))
    key = jax.random.PRNGKey(tcfg.seed + 1)
    validate = (make_rigid_validation_fn(model, tcfg, rcfg)
                if valid_ds is not None else None)

    ckpt = CheckpointManager(os.path.join(logger.dir, "ckpt"), max_to_keep=3)
    start_epoch, start_batch = 0, 0
    if args.resume and ckpt.latest_step() is not None:
        state, rkey, data = ckpt.restore(state)
        if rkey is not None:
            key = rkey
        if data is not None:
            start_epoch, start_batch = data.epoch, data.batch
        print(f"resumed step {int(state.step)} "
              f"(epoch {start_epoch}, batch {start_batch})")

    for epoch in range(start_epoch, tcfg.epochs):
        t0 = time.time()
        skip = start_batch if epoch == start_epoch else 0
        for bi, batch in enumerate(
            ds.batches(tcfg.batch_size, shuffle=True,
                       seed=tcfg.seed + epoch, skip=skip)
        ):
            key, sub = jax.random.split(key)
            if mesh is not None:
                from differentiable_ransac_tpu.train import shard_batch

                jb = shard_batch(batch, mesh)
            else:
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, jb, sub)
            if int(state.step) % 10 == 0:
                logger.log(int(state.step), {k: float(v) for k, v in metrics.items()},
                           prefix="train/")
                print(f"epoch {epoch} step {int(state.step)} "
                      f"loss {float(metrics['loss']):.5f} "
                      f"({time.time() - t0:.1f}s)", flush=True)
        ckpt.save(int(state.step), state, rng=key,
                  data=DataPosition(epoch + 1, 0, tcfg.seed))
        save_checkpoint(os.path.join(logger.dir, f"model_epoch_{epoch}.pkl"), state)
        if validate is not None:
            agg = validate(state, valid_ds, key)
            logger.log(int(state.step), agg, prefix="valid/")
            print(f"epoch {epoch} valid: {agg}", flush=True)
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
