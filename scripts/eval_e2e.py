#!/usr/bin/env python
"""E/F evaluation over PhotoTourism-style scenes (the reference ``test.py``
counterpart): AUC@5/10/20 for E; F1/median-epi for F.

Example (the reference demo config, ``README.md:186``):
    python scripts/eval_e2e.py -pth <data> -nf 2000 -bs 32 -fmat 1 -sam 3 -t 2
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.config import OUTDOOR_TEST_SCENES, session_string
from differentiable_ransac_tpu.data.datasets import TwoViewRecords
from differentiable_ransac_tpu.evaluate import (
    aggregate_essential,
    aggregate_fundamental,
    evaluate_essential_batch,
    evaluate_fundamental_batch,
    make_eval_step,
)
from differentiable_ransac_tpu.train import create_optimizer, create_train_state, load_checkpoint
from differentiable_ransac_tpu.utils import MetricsLogger, build_parser, configs_from_args


def main():
    parser = build_parser("TPU ∇-RANSAC evaluation")
    parser.add_argument("--mesh", default=None,
                        help="multi-chip (pairs,hyp) mesh: 'P,H' or 'auto' "
                             "(all local devices on hyp). Requires -bs "
                             "divisible by P.")
    parser.add_argument("--bucket", type=int, default=0,
                        help="1: difficulty-bucketed batching — order pairs "
                             "by the SNN-ratio difficulty proxy so batched "
                             "adaptive searches group similar stopping "
                             "budgets (recovers the straggler penalty; "
                             "docs/BENCH_TPU.md round 5)")
    args = parser.parse_args()
    args.tr = 0
    tcfg, rcfg = configs_from_args(args)

    from differentiable_ransac_tpu.parallel import mesh_from_spec

    mesh = mesh_from_spec(args.mesh, tcfg.batch_size)

    scenes = OUTDOOR_TEST_SCENES if args.batch_mode else [args.datasets]
    model, state = create_train_state(
        jax.random.PRNGKey(0), tcfg, tcfg.nfeatures, create_optimizer(tcfg)
    )
    if args.model:
        state = load_checkpoint(args.model, state)
    if mesh is not None:
        from differentiable_ransac_tpu.evaluate import make_eval_step_mesh
        from differentiable_ransac_tpu.train import shard_batch

        eval_fn = make_eval_step_mesh(model, rcfg, mesh, int(tcfg.prob_type))
    else:
        eval_fn = make_eval_step(model, rcfg, int(tcfg.prob_type))
    logger = MetricsLogger(args.out_dir, session_string("eval", tcfg, rcfg))

    all_aggs = {}
    for scene in scenes:
        folder = os.path.join(args.data_path, scene, "test_data/")
        if not os.path.isdir(folder):
            print(f"skip {scene}: no data at {folder}")
            continue
        ds = TwoViewRecords([folder], tcfg.snn_threshold, tcfg.nfeatures, rcfg.fmat)
        order = None
        if args.bucket:
            from differentiable_ransac_tpu.evaluate import difficulty_order

            # fresh reader: the pre-pass must not advance the eval rng
            order = difficulty_order(TwoViewRecords(
                [folder], tcfg.snn_threshold, tcfg.nfeatures, rcfg.fmat),
                tcfg.snn_threshold)
        results, t_total, n_pairs = [], 0.0, 0
        for batch in ds.batches(tcfg.batch_size, order=order):
            if mesh is not None:
                jb = shard_batch(batch, mesh)
            else:
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
            t0 = time.time()
            models, masks, scores, iters, w = eval_fn(
                state.params, state.batch_stats, jb, jax.random.PRNGKey(0)
            )
            models.block_until_ready()
            t_total += time.time() - t0
            n_pairs += models.shape[0]
            if rcfg.fmat:
                results += evaluate_fundamental_batch(models, batch, rcfg.threshold)
            else:
                results += evaluate_essential_batch(models, batch)
        agg = (aggregate_fundamental if rcfg.fmat else aggregate_essential)(results)
        agg["pairs_per_s"] = n_pairs / max(t_total, 1e-9)
        all_aggs[scene] = agg
        line = f"{scene}: " + " ".join(f"{k}={v:.4f}" for k, v in agg.items())
        print(line)
        logger.log_text(line)

    if all_aggs:
        keys = list(next(iter(all_aggs.values())).keys())
        mean_agg = {k: float(np.mean([a[k] for a in all_aggs.values()])) for k in keys}
        line = "MEAN: " + " ".join(f"{k}={v:.4f}" for k, v in mean_agg.items())
        print(line)
        logger.log_text(line)
    logger.close()


if __name__ == "__main__":
    main()
