#!/usr/bin/env python
"""3D rigid-registration training (the reference ``train_point.py``
counterpart): mean hypothesis residual loss on 3DMatch-style records."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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


def main():
    parser = build_parser("TPU ∇-RANSAC 3D registration training")
    parser.add_argument("--num_points", "-max", type=int, default=4000)
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

    for epoch in range(tcfg.epochs):
        for batch in ds.batches(tcfg.batch_size, shuffle=True):
            key, sub = jax.random.split(key)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, jb, sub)
            if int(state.step) % 10 == 0:
                logger.log(int(state.step), {k: float(v) for k, v in metrics.items()},
                           prefix="train/")
                print(f"epoch {epoch} step {int(state.step)} loss {float(metrics['loss']):.5f}")
        save_checkpoint(os.path.join(logger.dir, f"model_epoch_{epoch}.pkl"), state)
    logger.close()


if __name__ == "__main__":
    main()
