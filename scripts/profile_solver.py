#!/usr/bin/env python
"""Runtime split of the f32 5PC solve stage (VERDICT r3 weak #6 / task 7).

Times cumulative PREFIXES of the Nistér solver pipeline as separate jitted
programs over a bench-sized batch (PAIRS×HYPOTHESES samples), so each
stage's marginal cost is the difference of consecutive prefixes. Prefixes
mirror the stage boundaries of ``solvers/essential.py::essential_5pt_nister``
(eigh null-space seed → monomial/trace tensor build → 10×10 Gauss–Jordan →
degree-10 Aberth roots → back-substitution + E composition).

Marginal costs of XLA-fused stages are approximate (fusion differs between
prefixes) but rank the stages reliably. Appends findings to docs/PROFILE.md
by hand — this script just prints the table.

Usage: python scripts/profile_solver.py  (runs on the default accelerator)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.ops.linalg import (
    gauss_jordan_solve,
    null_space_from_gram,
)
from differentiable_ransac_tpu.ops.polynomial import aberth_roots, polymul
from differentiable_ransac_tpu.solvers import essential as E

PAIRS, N, H = 8, 2000, 2048


def _samples():
    rng = np.random.default_rng(0)
    out = []
    for i in range(PAIRS):
        p = two_view_problem(n_points=N, noise=0.5, outlier_ratio=0.3, seed=i)
        idx = rng.integers(0, N, (H, 5))
        out.append(p["matches"][idx])
    return jnp.asarray(np.stack(out).reshape(-1, 5, 4), jnp.float32)


def stage_nullspace(s):
    A = E._constraint_rows(s)
    ns = null_space_from_gram(A, 4)[:, ::-1]
    return jnp.transpose(ns.reshape(3, 3, 4), (1, 0, 2))


def stage_monomials(s):
    P = stage_nullspace(s)
    dtype = P.dtype
    det_row = (
        E._o2(E._o1(P[0, 1], P[1, 2]) - E._o1(P[0, 2], P[1, 1]), P[2, 0])
        + E._o2(E._o1(P[0, 2], P[1, 0]) - E._o1(P[0, 0], P[1, 2]), P[2, 1])
        + E._o2(E._o1(P[0, 0], P[1, 1]) - E._o1(P[0, 1], P[1, 0]), P[2, 2])
    )
    d = jnp.einsum("ikp,jkq,spq->ijs", P, P, jnp.asarray(E._O1, dtype))
    d = d - 0.5 * (d[0, 0] + d[1, 1] + d[2, 2])[None, None, :] * jnp.eye(3, dtype=dtype)[:, :, None]
    trace_rows = jnp.einsum("iks,kjm,psm->ijp", d, P, jnp.asarray(E._O2, dtype)).reshape(9, 20)
    return jnp.concatenate([trace_rows, det_row[None, :]], axis=0)


def stage_gj(s):
    M = stage_monomials(s)
    elim, ok = gauss_jordan_solve(M[:, :10], M[:, 10:])
    return jnp.where(ok & jnp.all(jnp.isfinite(elim)), elim, 0.0)


def stage_roots(s):
    elim = stage_gj(s)

    def derived(i):
        r4, r5 = elim[4 + 2 * i], elim[5 + 2 * i]
        p = jnp.stack([r4[2], r4[1] - r5[2], r4[0] - r5[1], -r5[0]])
        q = jnp.stack([r4[5], r4[4] - r5[5], r4[3] - r5[4], -r5[3]])
        c = jnp.stack([r4[9], r4[8] - r5[9], r4[7] - r5[8], r4[6] - r5[7], -r5[6]])
        return p, q, c

    p0, q0, c0 = derived(0)
    p1, q1, c1 = derived(1)
    p2, q2, c2 = derived(2)
    poly = (polymul(p0, polymul(q1, c2) - polymul(q2, c1))
            - polymul(q0, polymul(p1, c2) - polymul(p2, c1))
            + polymul(c0, polymul(p1, q2) - polymul(p2, q1)))
    poly = poly / jnp.maximum(jnp.max(jnp.abs(poly)), 1e-30)
    roots, valid = aberth_roots(poly[None, :])
    return roots[0], valid[0]


def stage_full(s):
    return E.essential_5pt_nister(s, solve_dtype=jnp.float32)


def timeit(fn, s, iters=5):
    # distinct input per timed call: the axon dev tunnel caches
    # same-argument executions, which fakes the timing (bench.py gotcha)
    run = jax.jit(jax.vmap(fn))
    variants = [s + jnp.float32(1e-6) * i for i in range(iters + 1)]
    out = run(variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(variants[i + 1])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    s = _samples()
    print(f"backend={jax.default_backend()} samples={s.shape[0]}")
    stages = [
        ("eigh null-space seed", stage_nullspace),
        ("+ monomial/trace build", stage_monomials),
        ("+ 10x10 Gauss-Jordan", stage_gj),
        ("+ degree-10 Aberth", stage_roots),
        ("full solver (+backsub/compose)", stage_full),
    ]
    prev = 0.0
    for name, fn in stages:
        dt = timeit(fn, s)
        print(f"{name:34s} cum {dt*1e3:7.1f} ms  marginal {max(dt-prev,0)*1e3:7.1f} ms")
        prev = dt


if __name__ == "__main__":
    main()
