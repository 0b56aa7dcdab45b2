"""Command-line flags — name-for-name parity with the reference parser
(``/root/reference/utils.py:7-83``) so its documented invocations
(``README.md:99-114,144``) translate directly."""

from __future__ import annotations

import argparse

from differentiable_ransac_tpu.config import (
    ModelKind,
    ProbType,
    RansacConfig,
    SamplerKind,
    ScoringKind,
    TrainConfig,
)


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=description, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--model", "-m", default=None, help="checkpoint to load")
    p.add_argument("--data_path", "-pth", default="dataset", help="dataset root")
    p.add_argument("--device", "-d", default="tpu", help="accelerator (tpu/cpu)")
    p.add_argument("--snn", "-snn", type=float, default=0.80, help="SNN ratio threshold")
    p.add_argument("--nfeatures", "-nf", type=int, default=2000)
    p.add_argument("--batch_size", "-bs", type=int, default=32)
    p.add_argument("--ransac_batch_size", "-rbs", type=int, default=64)
    p.add_argument("--fmat", "-fmat", type=int, default=0,
                   help="1: fundamental matrix, 0: essential matrix")
    p.add_argument("--scoring", "-s", type=int, default=1,
                   help="0 RANSAC, 1 MSAC, 2 MAGSAC (σ-consensus model "
                        "selection during the search)")
    p.add_argument("--prosac", "-prosac", type=int, default=0,
                   help="1: PROSAC-style sampling — importance from the "
                        "predicted-quality RANK (reference test_magsac.py:45)")
    p.add_argument("--sampler", "-sam", type=int, default=1,
                   help="0 uniform, 1/2 Gumbel-softmax minimal, 3 Gumbel 8PC")
    p.add_argument("--precision", "-pr", type=int, default=1,
                   help="0 fp16, 1 fp32, 2 fp64")
    p.add_argument("--tr", "-tr", type=int, default=0, help="1 train, 0 test")
    p.add_argument("--threshold", "-t", type=float, default=0.75)
    p.add_argument("--epochs", "-e", type=int, default=10)
    p.add_argument("--learning_rate", "-lr", type=float, default=1e-4)
    p.add_argument("--num_workers", "-nw", type=int, default=0)
    p.add_argument("--w0", "-w0", type=float, default=0, help="pose-loss weight")
    p.add_argument("--w1", "-w1", type=float, default=0, help="classification-loss weight")
    p.add_argument("--w2", "-w2", type=float, default=0, help="epipolar/match-loss weight")
    p.add_argument("--weighted", "-wei", type=int, default=0, help="weighted solves")
    p.add_argument("--datasets", "-ds", default="st_peters_square")
    p.add_argument("--batch_mode", "-bm", type=int, default=0,
                   help="1: run the 12-scene test list")
    p.add_argument("--prob", "-p", type=int, default=2,
                   help="0 normalized weights, 1 unnormalized, 2 logits")
    p.add_argument("--session", "-sid", default="")
    p.add_argument("--topk", "-topk", type=int, default=0)
    p.add_argument("--k", "-k", type=int, default=300)
    p.add_argument("--scheduler", "-sch", type=int, default=0)
    p.add_argument("--sampling_rate", "-sr", type=float, default=1.0,
                   help="CLNet iterative pruning rate (<1 keeps top N*sr "
                        "per pruning stage; reference model_cl.py:407-425)")
    p.add_argument("--eta_min", "-eta", type=float, default=1e-4)
    p.add_argument("--max_iterations", "-maxit", type=int, default=None,
                   help="override RANSAC iteration budget")
    p.add_argument("--lo", "-lo", type=int, default=0, help="local optimization 0-3")
    p.add_argument("--out_dir", "-o", default="results")
    p.add_argument("--sigma_max", "-smax", type=float, default=0.0,
                   help="MAGSAC sigma_max as a multiple of the threshold "
                        "(0 -> 1.0, the reference's sigma_th=threshold "
                        "hand-off, test_magsac.py:67). Raise so "
                        "3.64*sigma_max covers the true residual spread "
                        "when -t is misspecified low (see PARITY.md "
                        "F stress cell).")
    return p


def configs_from_args(args) -> tuple[TrainConfig, RansacConfig]:
    model = ModelKind.FUNDAMENTAL if args.fmat else ModelKind.ESSENTIAL
    if args.max_iterations is not None:
        max_iters = args.max_iterations
    elif args.tr:
        max_iters = 1000 if args.fmat else 100
    else:
        max_iters = 5000
    rcfg = RansacConfig(
        model=model,
        sampler=SamplerKind(args.sampler),
        threshold=args.threshold,
        max_iterations=max_iters,
        ransac_batch_size=args.ransac_batch_size,
        weighted=bool(args.weighted),
        train=bool(args.tr),
        lo=args.lo,
        precision=args.precision,
        scoring={0: ScoringKind.RANSAC, 2: ScoringKind.MAGSAC}.get(
            getattr(args, "scoring", 1), ScoringKind.MSAC),
        sigma_max=getattr(args, "sigma_max", 0.0),
    )
    tcfg = TrainConfig(
        batch_size=args.batch_size,
        nfeatures=args.nfeatures,
        snn_threshold=args.snn,
        learning_rate=args.learning_rate,
        epochs=args.epochs,
        w0=args.w0,
        w1=args.w1,
        w2=args.w2,
        prob_type=ProbType(args.prob),
        topk=bool(args.topk),
        k=args.k,
        scheduler=args.scheduler,
        eta_min=args.eta_min,
        session=args.session,
    )
    return tcfg, rcfg
