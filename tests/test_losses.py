"""Loss and pose-recovery tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.losses import (
    classification_loss,
    essential_from_f_hypotheses,
    match_loss,
    pose_loss,
)
from differentiable_ransac_tpu.ops import pose


@pytest.fixture(scope="module")
def prob():
    return two_view_problem(n_points=100, noise=0.2, outlier_ratio=0.3, seed=0)


def test_recover_pose_selects_gt(prob):
    m = prob["matches"][prob["inlier_mask"]]
    R, t = pose.recover_pose(jnp.asarray(prob["E"]),
                             jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:]))
    err_R = np.degrees(float(pose.rotation_error(R, jnp.asarray(prob["R"]))))
    err_t = np.degrees(float(pose.translation_error(t, jnp.asarray(prob["t"]))))
    assert err_R < 1.0
    assert err_t < 2.0


def test_recover_pose_horn_variant(prob):
    m = prob["matches"][prob["inlier_mask"]]
    R, t = pose.recover_pose(jnp.asarray(prob["E"]),
                             jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:]), svd=False)
    err_R = np.degrees(float(pose.rotation_error(R, jnp.asarray(prob["R"]))))
    assert err_R < 1.0


def test_gt_inlier_mask_matches_geometry(prob):
    m = prob["matches"]
    mask = np.asarray(pose.gt_inlier_mask(jnp.asarray(prob["E"]),
                                          jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:])))
    # all true inliers are in front of both cameras
    assert mask[prob["inlier_mask"]].mean() > 0.95


def test_match_loss_ranks_models(prob):
    m = prob["matches"]
    gt_mask = jnp.asarray(prob["inlier_mask"].astype(np.float32))
    good = jnp.asarray(prob["E"])[None]
    rng = np.random.default_rng(0)
    bad = jnp.asarray(prob["E"] + rng.normal(scale=0.5, size=(3, 3)).astype(np.float32))[None]
    valid = jnp.ones((1,), bool)
    x1, x2 = jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:])
    lg = float(match_loss(good, valid, x1, x2, gt_mask))
    lb = float(match_loss(bad, valid, x1, x2, gt_mask))
    assert lg < lb
    assert 0 <= lg <= 1 and 0 <= lb <= 1


def test_match_loss_topk(prob):
    m = prob["matches"]
    gt_mask = jnp.asarray(prob["inlier_mask"].astype(np.float32))
    rng = np.random.default_rng(1)
    models = jnp.asarray(np.stack(
        [prob["E"]] + [prob["E"] + rng.normal(scale=0.5, size=(3, 3)).astype(np.float32)
                       for _ in range(7)]
    ))
    valid = jnp.ones((8,), bool)
    x1, x2 = jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:])
    l_all = float(match_loss(models, valid, x1, x2, gt_mask))
    l_top1 = float(match_loss(models, valid, x1, x2, gt_mask, topk=1))
    assert l_top1 <= l_all


def test_match_loss_ignores_invalid(prob):
    m = prob["matches"]
    gt_mask = jnp.asarray(prob["inlier_mask"].astype(np.float32))
    x1, x2 = jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:])
    good = jnp.asarray(prob["E"])
    junk = jnp.asarray(np.full((3, 3), 1e6, np.float32))
    models = jnp.stack([good, junk])
    l1 = float(match_loss(models, jnp.asarray([True, False]), x1, x2, gt_mask))
    l2 = float(match_loss(good[None], jnp.asarray([True]), x1, x2, gt_mask))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_pose_loss_finite_and_ranks(prob):
    m = prob["matches"][prob["inlier_mask"]][:40]
    x1, x2 = jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:])
    good = jnp.asarray(prob["E"])[None]
    rng = np.random.default_rng(2)
    bad = jnp.asarray(prob["E"] + rng.normal(scale=0.8, size=(3, 3)).astype(np.float32))[None]
    valid = jnp.ones((1,), bool)
    lg = float(pose_loss(good, valid, x1, x2, jnp.asarray(prob["R"]), jnp.asarray(prob["t"])))
    lb = float(pose_loss(bad, valid, x1, x2, jnp.asarray(prob["R"]), jnp.asarray(prob["t"])))
    assert np.isfinite(lg) and np.isfinite(lb)
    assert lg < lb


def test_classification_loss():
    w = jnp.asarray([0.9, 0.1, 0.8, 0.2])
    gt = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    good = float(classification_loss(w, gt))
    bad = float(classification_loss(1.0 - w, gt))
    assert good < bad


def test_essential_from_f_lift(prob):
    K = jnp.asarray(prob["K"])
    F = jnp.asarray(prob["F"])[None]
    E = np.asarray(essential_from_f_hypotheses(F, K, K))[0]
    E = E / np.linalg.norm(E)
    gt = prob["E"] / np.linalg.norm(prob["E"])
    assert min(np.linalg.norm(E - gt), np.linalg.norm(E + gt)) < 1e-4


def test_match_loss_gradient_through_models(prob):
    m = prob["matches"]
    gt_mask = jnp.asarray(prob["inlier_mask"].astype(np.float32))
    x1, x2 = jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:])

    def f(model):
        return match_loss(model[None], jnp.ones((1,), bool), x1, x2, gt_mask)

    g = np.asarray(jax.grad(f)(jnp.asarray(prob["E"] + 0.01)))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_pose_loss_chunked_matches_unchunked():
    """chunk>0 (the OOM-safe lax.map+remat path used by the train step)
    must reproduce the unchunked loss and gradient exactly, including a
    non-divisible hypothesis count (identity padding carries valid=0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from differentiable_ransac_tpu.data.synthetic import two_view_problem
    from differentiable_ransac_tpu.losses import pose_loss

    p = two_view_problem(60, noise=0.5, outlier_ratio=0.2, seed=8)
    rng = np.random.default_rng(0)
    H = 10
    models = jnp.asarray(
        p["E"][None] + 0.05 * rng.normal(size=(H, 3, 3)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=H) > 0.3)
    x1 = jnp.asarray(p["matches"][:, :2])
    x2 = jnp.asarray(p["matches"][:, 2:])
    args = (valid, x1, x2, jnp.asarray(p["R"]), jnp.asarray(p["t"]))

    full = pose_loss(models, *args)
    for chunk in (4, 5, 16):
        chunked = pose_loss(models, *args, chunk=chunk)
        np.testing.assert_allclose(float(chunked), float(full), rtol=1e-5)

    g_full = jax.grad(lambda m: pose_loss(m, *args))(models)
    g_chunk = jax.grad(lambda m: pose_loss(m, *args, chunk=4))(models)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_full),
                               rtol=2e-4, atol=1e-6)
