#!/usr/bin/env python
"""End-to-end E/F training (the reference ``train.py`` counterpart).

Example (the reference's best config, ``README.md:144``):
    python scripts/train_e2e.py -pth <data> -nf 2000 -bs 32 -sam 2 -w2 1 -tr 1

Multi-chip: ``--mesh P,H`` (or ``--mesh auto`` for all local devices)
shards the step over a ``(pairs, hyp)`` mesh — batches on the data axis,
hypotheses on the hyp axis (SURVEY §2.13); requires ``-bs`` divisible by P.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.checkpoint import CheckpointManager, DataPosition
from differentiable_ransac_tpu.config import session_string
from differentiable_ransac_tpu.data.datasets import TwoViewRecords
from differentiable_ransac_tpu.train import (
    create_optimizer,
    create_train_state,
    load_checkpoint,
    make_train_step,
)
from differentiable_ransac_tpu.utils import MetricsLogger, build_parser, configs_from_args


def main():
    parser = build_parser("TPU ∇-RANSAC end-to-end training")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest orbax checkpoint in the "
                             "session dir (full state: params, opt, step, "
                             "RNG, data position)")
    parser.add_argument("--mesh", default=None,
                        help="multi-chip (pairs,hyp) mesh: 'P,H' or 'auto' "
                             "(all local devices on hyp). Requires -bs "
                             "divisible by P; falls back to single-device "
                             "when only one device is present.")
    args = parser.parse_args()
    args.tr = 1
    tcfg, rcfg = configs_from_args(args)

    from differentiable_ransac_tpu.parallel import mesh_from_spec

    mesh = mesh_from_spec(args.mesh, tcfg.batch_size)

    train_dirs = [os.path.join(args.data_path, args.datasets, "train_data/")]
    valid_dirs = [os.path.join(args.data_path, args.datasets, "valid_data/")]
    train_ds = TwoViewRecords(train_dirs, tcfg.snn_threshold, tcfg.nfeatures, rcfg.fmat)
    valid_ds = (
        TwoViewRecords(valid_dirs, tcfg.snn_threshold, tcfg.nfeatures, rcfg.fmat)
        if os.path.isdir(valid_dirs[0])
        else None
    )

    tx = create_optimizer(tcfg, steps_per_epoch=max(1, len(train_ds) // tcfg.batch_size))
    model, state = create_train_state(jax.random.PRNGKey(tcfg.seed), tcfg,
                                      tcfg.nfeatures, tx,
                                      sampling_rate=args.sampling_rate)
    if args.model:
        state = load_checkpoint(args.model, state)
    if mesh is not None:
        from differentiable_ransac_tpu.train import make_train_step_mesh

        step_fn = make_train_step_mesh(model, tx, tcfg, rcfg, mesh)
    else:
        step_fn = make_train_step(model, tx, tcfg, rcfg)

    session = session_string("e2e", tcfg, rcfg)
    logger = MetricsLogger(args.out_dir, session)
    key = jax.random.PRNGKey(tcfg.seed + 1)

    validate = None
    if valid_ds is not None:
        from differentiable_ransac_tpu.evaluate import make_validation_fn

        # Built ONCE (jit cache survives across epochs); dispatches the
        # metric stack on rcfg.fmat and runs sharded when --mesh is set.
        validate = make_validation_fn(model, tcfg, rcfg, mesh=mesh)

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
            train_ds.batches(tcfg.batch_size, shuffle=True,
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
                      f"loss {float(metrics['loss']):.4f} "
                      f"({time.time() - t0:.1f}s)")
        ckpt.save(int(state.step), state, rng=key,
                  data=DataPosition(epoch + 1, 0, tcfg.seed))

        if validate is not None:
            agg = validate(state, valid_ds, key)
            logger.log(int(state.step), agg, prefix="valid/")
            print(f"epoch {epoch} valid: {agg}")

    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
