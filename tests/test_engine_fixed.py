"""Fixed-budget engine paths: prescreen + mixed-precision rescue."""

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.engine import ransac_fixed, ransac_fixed_rescued


def _model_distance(A, B):
    A = A / np.linalg.norm(A)
    B = B / np.linalg.norm(B)
    return min(np.linalg.norm(A - B), np.linalg.norm(A + B))


def test_ransac_fixed_finds_model():
    p = two_view_problem(n_points=400, noise=0.5, outlier_ratio=0.3, seed=0)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL, threshold=2.0)
    out = jax.jit(
        lambda k: ransac_fixed(cfg, jnp.asarray(p["matches"]),
                               jnp.zeros((400,), jnp.float32), k,
                               threshold=2e-3, num_hypotheses=512)
    )(jax.random.PRNGKey(0))
    assert _model_distance(np.asarray(out["best_model"]), p["E"]) < 0.08
    assert out["scores"].shape == (512 * 10,)


def test_ransac_fixed_prescreen_matches_full():
    """Prescreened search must find an (approximately) equally good model."""
    p = two_view_problem(n_points=600, noise=0.5, outlier_ratio=0.3, seed=1)
    base = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL, threshold=2.0)
    pts = jnp.asarray(p["matches"])
    lg = jnp.zeros((600,), jnp.float32)
    full = ransac_fixed(base, pts, lg, jax.random.PRNGKey(2), threshold=2e-3,
                        num_hypotheses=512)
    pre = ransac_fixed(base.replace(prescreen=128), pts, lg, jax.random.PRNGKey(2),
                       threshold=2e-3, num_hypotheses=512)
    d_full = _model_distance(np.asarray(full["best_model"]), p["E"])
    d_pre = _model_distance(np.asarray(pre["best_model"]), p["E"])
    assert d_pre < max(2 * d_full, 0.08), (d_full, d_pre)
    # scores of the survivors agree with the full pass at the best index
    assert float(pre["best_score"]) <= float(full["best_score"]) + 1e-3


def test_ransac_fixed_rescued_quality():
    """Mixed-precision rescue must deliver f64-class model quality."""
    p = two_view_problem(n_points=600, noise=0.5, outlier_ratio=0.3, seed=3)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL, threshold=2.0)
    pts = jnp.asarray(p["matches"])
    lg = jnp.zeros((600,), jnp.float32)
    out = jax.jit(
        lambda k: ransac_fixed_rescued(cfg, pts, lg, k, threshold=2e-3,
                                       num_hypotheses=1024)
    )(jax.random.PRNGKey(3))
    d = _model_distance(np.asarray(out["best_model"]), p["E"])
    assert d < 0.06, d
    assert np.isfinite(float(out["best_score"]))


def test_ransac_fixed_rescued_fundamental():
    p = two_view_problem(n_points=400, noise=0.3, outlier_ratio=0.2, seed=4)
    cfg = RansacConfig(model=ModelKind.FUNDAMENTAL, sampler=SamplerKind.GUMBEL,
                       threshold=0.75)
    out = ransac_fixed_rescued(cfg, jnp.asarray(p["matches_px"]),
                               jnp.zeros((400,), jnp.float32),
                               jax.random.PRNGKey(4), num_hypotheses=1024)
    assert _model_distance(np.asarray(out["best_model"]), p["F"]) < 0.08


def test_two_stage_rescue_matches_full_f64_rescue():
    """The round-4 two-stage rescue (full-point f32 re-rank -> f64 for the
    top rescue_refine only) must deliver the same best-score class as the
    round-3 full-f64 rescue of all carried samples, across several
    problems (f32-vs-f64 score correlation 0.97 is the design basis)."""
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       threshold=2.0)
    for seed in range(4):
        p = two_view_problem(n_points=400, noise=1.0, outlier_ratio=0.4,
                             seed=40 + seed)
        pts = jnp.asarray(p["matches"])
        lg = jnp.zeros((400,), jnp.float32)
        run = jax.jit(
            lambda k, r: ransac_fixed_rescued(
                cfg, pts, lg, k, threshold=2e-3, num_hypotheses=512,
                rescue_refine=r),
            static_argnums=1)
        two_stage = run(jax.random.PRNGKey(seed), 16)
        full = run(jax.random.PRNGKey(seed), 0)
        # same samples drawn (same key): the refined top-16 must contain a
        # model within a fraction of the full-rescue best score
        assert float(two_stage["best_score"]) >= 0.98 * float(full["best_score"]), (
            seed, float(two_stage["best_score"]), float(full["best_score"]))
        d = _model_distance(np.asarray(two_stage["best_model"]), p["E"])
        assert d < 0.08, (seed, d)
