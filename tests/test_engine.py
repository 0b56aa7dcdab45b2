"""RANSAC engine integration tests on synthetic problems."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
from differentiable_ransac_tpu.data.synthetic import rigid_problem, two_view_problem
from differentiable_ransac_tpu.engine import (
    ransac_test,
    ransac_train,
    ransac_train_rigid,
)
from differentiable_ransac_tpu.ops import pose


def _model_distance(A, B):
    A = A / np.linalg.norm(A)
    B = B / np.linalg.norm(B)
    return min(np.linalg.norm(A - B), np.linalg.norm(A + B))


def test_ransac_test_essential_finds_model():
    p = two_view_problem(n_points=500, noise=0.5, outlier_ratio=0.4, seed=0)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=1000, threshold=2.0)
    thr = jnp.asarray(2.0 / 1000.0)  # focal-normalized
    fwd = jax.jit(lambda pts, lg, k: ransac_test(cfg, pts, lg, k, threshold=thr))
    model, mask, score, iters = fwd(
        jnp.asarray(p["matches"]), jnp.zeros((500,)), jax.random.PRNGKey(0)
    )
    model, mask = np.asarray(model), np.asarray(mask)
    assert _model_distance(model, p["E"]) < 0.05
    # inlier mask overlaps ground truth well
    agree = (mask == p["inlier_mask"]).mean()
    assert agree > 0.9
    assert int(iters) <= 1000


def test_ransac_test_adaptive_early_exit():
    # Clean data: should stop long before max_iterations.
    p = two_view_problem(n_points=300, noise=0.1, outlier_ratio=0.0, seed=1)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, max_iterations=5000, threshold=2.0)
    thr = jnp.asarray(2.0 / 1000.0)
    model, mask, score, iters = jax.jit(
        lambda pts, lg, k: ransac_test(cfg, pts, lg, k, threshold=thr)
    )(jnp.asarray(p["matches"]), jnp.zeros((300,)), jax.random.PRNGKey(1))
    assert int(iters) < 5000
    assert _model_distance(np.asarray(model), p["E"]) < 0.05


def test_ransac_test_fundamental():
    p = two_view_problem(n_points=400, noise=0.3, outlier_ratio=0.3, seed=2)
    cfg = RansacConfig(model=ModelKind.FUNDAMENTAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=2000, threshold=0.75)
    model, mask, score, iters = jax.jit(
        lambda pts, lg, k: ransac_test(cfg, pts, lg, k)
    )(jnp.asarray(p["matches_px"]), jnp.zeros((400,)), jax.random.PRNGKey(2))
    d = _model_distance(np.asarray(model), p["F"])
    assert d < 0.05, d


def test_ransac_test_fundamental_8pt_sampler():
    p = two_view_problem(n_points=400, noise=0.3, outlier_ratio=0.2, seed=3)
    cfg = RansacConfig(model=ModelKind.FUNDAMENTAL, sampler=SamplerKind.GUMBEL_8PT,
                       max_iterations=1000, threshold=0.75)
    model, _, _, _ = jax.jit(
        lambda pts, lg, k: ransac_test(cfg, pts, lg, k)
    )(jnp.asarray(p["matches_px"]), jnp.zeros((400,)), jax.random.PRNGKey(3))
    assert _model_distance(np.asarray(model), p["F"]) < 0.05


def test_ransac_test_with_lo():
    p = two_view_problem(n_points=300, noise=0.5, outlier_ratio=0.4, seed=4)
    cfg = RansacConfig(model=ModelKind.FUNDAMENTAL, max_iterations=500,
                       threshold=0.75, lo=2, lo_iters=8)
    model, _, score_lo, _ = jax.jit(
        lambda pts, lg, k: ransac_test(cfg, pts, lg, k)
    )(jnp.asarray(p["matches_px"]), jnp.zeros((300,)), jax.random.PRNGKey(4))
    assert _model_distance(np.asarray(model), p["F"]) < 0.05


def test_ransac_train_essential_contains_good_models():
    p = two_view_problem(n_points=200, noise=0.5, outlier_ratio=0.2, seed=5)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=100, train=True)
    models, valid = jax.jit(
        lambda pts, lg, g, k: ransac_train(cfg, pts, lg, g, k)
    )(jnp.asarray(p["matches"]), jnp.zeros((200,)), jnp.asarray(p["E"]),
      jax.random.PRNGKey(5))
    assert models.shape == (128, 3, 3)  # ceil(100/64)*64
    models, valid = np.asarray(models), np.asarray(valid)
    assert valid.sum() > 64
    dists = [_model_distance(m, p["E"]) for m, v in zip(models, valid) if v]
    # contaminated minimal samples yield far-from-GT selections (the
    # reference keeps them too); what matters is that good hypotheses exist
    assert min(dists) < 0.05
    assert np.mean(np.asarray(dists) < 0.3) > 0.1


def test_ransac_train_gradients_flow_to_logits():
    p = two_view_problem(n_points=100, noise=0.5, outlier_ratio=0.2, seed=6)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=64, train=True)
    gt = jnp.asarray(p["E"])
    pts = jnp.asarray(p["matches"])

    def loss(logits):
        models, valid = ransac_train(cfg, pts, logits, gt, jax.random.PRNGKey(6))
        d = jnp.linalg.norm(models - gt[None], axis=(-2, -1))
        return jnp.sum(jnp.where(valid, d, 0.0))

    g = np.asarray(jax.grad(loss)(jnp.zeros((100,))))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_ransac_train_rigid():
    p = rigid_problem(n_points=300, noise=0.005, outlier_ratio=0.3, seed=7)
    cfg = RansacConfig(model=ModelKind.RIGID, sampler=SamplerKind.GUMBEL,
                       max_iterations=128, train=True, threshold=0.03)
    models, valid, res_sums, mean_res = jax.jit(
        lambda pts, lg, k: ransac_train_rigid(cfg, pts, lg, k)
    )(jnp.asarray(p["points"]), jnp.zeros((300,)), jax.random.PRNGKey(7))
    assert models.shape == (128, 4, 4)
    assert np.asarray(valid).sum() > 64
    assert np.isfinite(float(mean_res))


def test_ransac_test_rigid():
    p = rigid_problem(n_points=400, noise=0.005, outlier_ratio=0.4, seed=8)
    cfg = RansacConfig(model=ModelKind.RIGID, sampler=SamplerKind.GUMBEL,
                       max_iterations=1000, threshold=0.05)
    model, mask, score, iters = jax.jit(
        lambda pts, lg, k: ransac_test(cfg, pts, lg, k)
    )(jnp.asarray(p["points"]), jnp.zeros((400,)), jax.random.PRNGKey(8))
    model = np.asarray(model)
    err_R = np.degrees(np.arccos(np.clip(
        (np.trace(model[:3, :3] @ p["transform"][:3, :3].T) - 1) / 2, -1, 1)))
    err_t = np.linalg.norm(model[:3, 3] - p["transform"][:3, 3])
    assert err_R < 2.0
    assert err_t < 0.05


def test_ransac_test_point_mask_padding():
    p = two_view_problem(n_points=200, noise=0.3, outlier_ratio=0.2, seed=9)
    pts = np.concatenate([p["matches"], np.zeros((56, 4), np.float32)])
    mask = np.concatenate([np.ones(200, np.float32), np.zeros(56, np.float32)])
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, max_iterations=500, threshold=2.0)
    thr = jnp.asarray(2.0 / 1000.0)
    logits = jnp.where(jnp.asarray(mask) > 0, 0.0, -1e9)
    model, imask, _, _ = jax.jit(
        lambda a, b, k: ransac_test(cfg, a, b, k, threshold=thr,
                                    point_mask=jnp.asarray(mask))
    )(jnp.asarray(pts), logits, jax.random.PRNGKey(9))
    assert _model_distance(np.asarray(model), p["E"]) < 0.05
    assert not np.asarray(imask)[200:].any()
