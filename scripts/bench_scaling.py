#!/usr/bin/env python
"""Scaling-efficiency benchmark: hypotheses/s at mesh sizes 1..N devices.

On real multi-chip/multi-host hardware this measures ICI/DCN scaling of the
hypothesis-sharded engine (pairs/s and hyp/s at 1 chip, 1 host, N hosts —
the BASELINE.md protocol). Without hardware, run on the virtual CPU mesh
(`--cpu N`) to validate the sharding path; those numbers measure correctness,
not performance.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="force a virtual CPU mesh with N devices")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--points", type=int, default=1000)
    ap.add_argument("--hypotheses", type=int, default=1024)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
    from differentiable_ransac_tpu.data.synthetic import two_view_problem
    from differentiable_ransac_tpu.parallel import make_mesh, sharded_ransac

    n_dev = jax.device_count()
    print(f"devices: {n_dev} ({jax.default_backend()})")

    B, N = args.pairs, args.points
    probs = [two_view_problem(n_points=N, noise=0.5, outlier_ratio=0.3, seed=i)
             for i in range(B)]
    pts = jnp.asarray(np.stack([p["matches"] for p in probs]))
    logits = jnp.zeros((B, N), jnp.float32)
    keys = jnp.arange(B, dtype=jnp.uint32)
    thr = jnp.full((B,), 2.0 / 1000.0, jnp.float32)

    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=args.hypotheses, threshold=2.0)

    results = {}
    sizes = [s for s in (1, 2, 4, 8, n_dev) if s <= n_dev]
    for n in sorted(set(sizes)):
        mesh = make_mesh(pairs=1, hyp=n, devices=jax.devices()[:n])
        fn = jax.jit(lambda a, b, c, d, mesh=mesh: sharded_ransac(cfg, mesh, a, b, c, d))
        out = fn(pts, logits, keys, thr)
        jax.block_until_ready(out)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(pts, logits, keys, thr)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        hyp_s = B * cfg.num_hypotheses / dt
        results[n] = hyp_s
        eff = hyp_s / (results[1] * n) if 1 in results and n > 1 else 1.0
        print(f"mesh hyp={n}: {hyp_s:,.0f} hyp/s  scaling-efficiency={eff:.2f}")


if __name__ == "__main__":
    main()
