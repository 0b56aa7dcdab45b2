"""Benchmark: hypotheses/second/chip on the 5PC essential pipeline.

Measures the full hypothesis loop — Gumbel minimal-sample drawing, Nistér
5PC solve, MSAC scoring of all N points, best-model argmax — as one jitted
program on the available accelerator, and compares against the PyTorch
reference (`/root/reference`) executing its own pipeline on CPU (the
reference has no GPU here; its published setup is CPU/GPU,
``README.md:99-114``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")

N_POINTS = 2000
PAIRS = 8
HYPOTHESES = 2048  # per pair


def measure_tpu(solver_precision: int = 2, use_pallas: bool = False,
                rescued: bool = False):
    import jax
    import jax.numpy as jnp

    from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
    from differentiable_ransac_tpu.data.synthetic import two_view_problem
    from differentiable_ransac_tpu.engine import ransac_fixed, ransac_fixed_rescued

    cfg = RansacConfig(
        model=ModelKind.ESSENTIAL,
        sampler=SamplerKind.GUMBEL,
        threshold=2.0,
        solver_precision=solver_precision,
        use_pallas_scoring=use_pallas,
    )
    probs = [two_view_problem(n_points=N_POINTS, noise=0.5, outlier_ratio=0.3, seed=i)
             for i in range(PAIRS)]
    pts = jnp.asarray(np.stack([p["matches"] for p in probs]))
    logits = jnp.zeros((PAIRS, N_POINTS), jnp.float32)
    thr = jnp.asarray(2.0 / 1000.0, jnp.float32)
    engine = ransac_fixed_rescued if rescued else ransac_fixed

    @jax.jit
    def run(pts, logits, key):
        keys = jax.random.split(key, PAIRS)
        out = jax.vmap(
            lambda p, l, k: engine(cfg, p, l, k, threshold=thr,
                                   num_hypotheses=HYPOTHESES)
        )(pts, logits, keys)
        return out["best_model"], out["best_score"]

    # compile + warmup; distinct keys per timed call (the axon dev tunnel
    # caches same-argument executions, which would fake the timing)
    m, s = run(pts, logits, jax.random.PRNGKey(0))
    m.block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        m, s = run(pts, logits, jax.random.PRNGKey(i + 1))
    m.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    hyps = PAIRS * HYPOTHESES
    return hyps / dt, dt


def measure_reference_baseline():
    """Throughput of the reference's own hypothesis pipeline on torch CPU:
    batched 5PC solve (``essential_matrix_estimator_nister.py:69-408``) +
    MSAC scoring of all points (``scorings/msac_score.py:12-55``), its
    in-tensor batch size 64 (``utils.py:33``)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["hyp_per_s"]

    sys.path.insert(0, "/root/reference")
    import torch
    from estimators.essential_matrix_estimator_nister import EssentialMatrixEstimatorNister
    from scorings.msac_score import MSACScore

    from differentiable_ransac_tpu.data.synthetic import two_view_problem

    p = two_view_problem(n_points=N_POINTS, noise=0.5, outlier_ratio=0.3, seed=0)
    matches = torch.from_numpy(p["matches"]).float()
    est = EssentialMatrixEstimatorNister(device="cpu")
    scorer = MSACScore(device="cpu")

    rbs = 64  # reference ransac_batch_size
    g = torch.Generator().manual_seed(0)

    def one_chunk():
        idx = torch.randint(0, N_POINTS, (rbs, 5), generator=g)
        samples = matches[idx]
        models = est.estimate_minimal_model(samples)
        scores, masks = scorer.score(matches, models, 2.0 / 1000.0)
        return scores

    one_chunk()  # warmup
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        one_chunk()
    dt = (time.perf_counter() - t0) / iters
    hyp_per_s = rbs / dt
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"hyp_per_s": hyp_per_s, "note": "torch-cpu reference 5PC+MSAC, rbs=64"}, f)
    sys.path.remove("/root/reference")
    return hyp_per_s


def main():
    variants = {}
    for name, kw in (
        ("mixed_rescued", dict(rescued=True)),
        ("f64_core", dict(solver_precision=2)),
    ):
        try:
            hyp_s, dt = measure_tpu(**kw)
            variants[name] = hyp_s
            print(f"# {name}: {hyp_s:.0f} hyp/s ({dt*1e3:.1f} ms/call)", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"# {name} failed: {e}", file=sys.stderr)
    ours = max(variants.values()) if variants else float("nan")
    try:
        baseline = measure_reference_baseline()
    except Exception:
        baseline = float("nan")
    print(json.dumps({
        "metric": "5pc_hypotheses_per_sec_per_chip",
        "value": round(ours, 1),
        "unit": "hyp/s",
        "vs_baseline": round(ours / baseline, 2) if baseline == baseline else None,
    }))


if __name__ == "__main__":
    main()
