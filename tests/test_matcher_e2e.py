"""Learned-matcher end-to-end coupling tests (VERDICT r4 task 5): a real
descriptor-CNN matcher whose match COORDINATES are differentiable, trained
through the RANSAC layer — the reference's LoFTR-finetuning pipeline shape
(``/root/reference/train_ransac_loftr.py:15-94,138-140``)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
from differentiable_ransac_tpu.data.render import gt_flow, render_two_plane_pair
from differentiable_ransac_tpu.matchers import matcher_finetune_loss
from differentiable_ransac_tpu.models.matcher import TinyMatcher, calibrated_points


@pytest.fixture(scope="module")
def small_pair():
    sc = render_two_plane_pair(seed=2, h=120, w=160, randomize_pose=True)
    return sc


@pytest.fixture(scope="module")
def matcher():
    return TinyMatcher(grid_step=2, window=6, margin=2)


def test_matcher_output_shapes_and_grid(small_pair, matcher):
    img0 = jnp.asarray(small_pair["img0"])[None]
    img1 = jnp.asarray(small_pair["img1"])[None]
    params = matcher.init(jax.random.PRNGKey(0), img0, img1)
    out = matcher.apply(params, img0, img1)
    G = out["mkpts0"].shape[0]
    assert out["mkpts1"].shape == (1, G, 2)
    assert out["confidence"].shape == (1, G)
    # soft-argmax coords stay inside the image
    assert float(out["mkpts1"].min()) >= 0.0
    assert float(out["mkpts1"][..., 0].max()) <= 160.0
    assert float(out["mkpts1"][..., 1].max()) <= 120.0


def test_pretraining_improves_matches(small_pair, matcher):
    """A few GT-flow supervised steps must reduce the match error —
    the matcher genuinely learns from pixels."""
    img0 = jnp.asarray(small_pair["img0"])[None]
    img1 = jnp.asarray(small_pair["img1"])[None]
    params = matcher.init(jax.random.PRNGKey(0), img0, img1)
    grid_px = np.asarray(matcher.grid(120, 160), np.float32) * 4.0 + 1.5
    gt1, vis = gt_flow(small_pair, grid_px)
    gt1 = jnp.asarray(gt1)
    visj = jnp.asarray(vis.astype(np.float32))

    def loss(p):
        out = matcher.apply(p, img0, img1)
        d = jnp.sum((out["mkpts1"][0] - gt1) ** 2, -1)
        return jnp.sum(jnp.sqrt(d + 1e-6) * visj) / jnp.sum(visj)

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = jax.jit(lambda p, o: (lambda l, g: (optax.apply_updates(
        p, tx.update(g, o, p)[0]), tx.update(g, o, p)[1], l))(
        *jax.value_and_grad(loss)(p)))
    l0 = float(loss(params))
    for _ in range(30):
        params, opt, l = step(params, opt)
    l1 = float(loss(params))
    assert l1 < l0 * 0.9, (l0, l1)


def test_engine_finetune_gradients_reach_conv_weights(small_pair, matcher):
    """matcher_finetune_loss gradients must reach the descriptor CNN through
    the match COORDINATES, not only the confidence logits — the coupling the
    round-4 adapter lacked (matchers.py:10-14 stopped gradients for torch
    matchers; reference backprops into LoFTR, train_ransac_loftr.py:138-140)."""
    img0 = jnp.asarray(small_pair["img0"])[None]
    img1 = jnp.asarray(small_pair["img1"])[None]
    params = matcher.init(jax.random.PRNGKey(0), img0, img1)
    grid_px = np.asarray(matcher.grid(120, 160), np.float32) * 4.0 + 1.5
    _, vis = gt_flow(small_pair, grid_px)
    gt_mask = jnp.asarray(vis)
    E = jnp.asarray(small_pair["E"], jnp.float32)
    K = jnp.asarray(small_pair["K"], jnp.float32)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=16, threshold=2.0, train=True,
                       solver_precision=1)

    def loss(p, stop_coords):
        out = matcher.apply(p, img0, img1)
        mk1 = out["mkpts1"][0]
        if stop_coords:
            mk1 = jax.lax.stop_gradient(mk1)
        pts = calibrated_points(out["mkpts0"], mk1, K)
        return matcher_finetune_loss(cfg, pts, out["logits"][0], E, gt_mask,
                                     jax.random.PRNGKey(3))

    g_full = jax.grad(lambda p: loss(p, False))(params)
    g_conf = jax.grad(lambda p: loss(p, True))(params)
    n_full = float(optax.global_norm(g_full))
    n_conf = float(optax.global_norm(g_conf))
    assert np.isfinite(n_full) and n_full > 0
    # the coordinate path must contribute beyond the confidence-only path
    leaves_full = jax.tree.leaves(g_full)
    leaves_conf = jax.tree.leaves(g_conf)
    diff = max(float(jnp.max(jnp.abs(a - b)))
               for a, b in zip(leaves_full, leaves_conf))
    assert diff > 0, "coordinate gradients did not reach the matcher weights"


def test_calibrated_points_gradients():
    K = jnp.asarray([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]])
    mk0 = jnp.asarray(np.random.default_rng(0).uniform(0, 160, (5, 2)),
                      jnp.float32)
    mk1 = jnp.asarray(np.random.default_rng(1).uniform(0, 160, (5, 2)),
                      jnp.float32)
    g = jax.grad(lambda m: jnp.sum(calibrated_points(mk0, m, K) ** 2))(mk1)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0
