#!/usr/bin/env python
"""Export an orbax training checkpoint (written by ``train_e2e.py``) to the
portable pickle format ``train.load_checkpoint`` / ``parity.py --our_ckpt``
consume (params + batch_stats + opt_state + step).

Example:
    python scripts/export_ckpt.py --ckpt_dir results/<session>/ckpt \
        --out results/<session>/model_final.net --nf 500
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from differentiable_ransac_tpu.checkpoint import CheckpointManager
from differentiable_ransac_tpu.config import TrainConfig
from differentiable_ransac_tpu.train import (
    create_optimizer,
    create_train_state,
    save_checkpoint,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--nf", type=int, default=500)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")  # no accelerator needed
    tcfg = TrainConfig(nfeatures=args.nf)
    _, state = create_train_state(jax.random.PRNGKey(0), tcfg, args.nf,
                                  create_optimizer(tcfg))
    mgr = CheckpointManager(args.ckpt_dir)
    state, _, _ = mgr.restore(state, step=args.step)
    mgr.close()
    save_checkpoint(args.out, state)
    print(f"exported step {int(state.step)} -> {args.out}")


if __name__ == "__main__":
    main()
