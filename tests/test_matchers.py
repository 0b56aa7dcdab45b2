"""Matcher-adapter (LoFTR-hook) tests with a synthetic matcher."""

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.matchers import (
    MatcherAdapter,
    MatchPrediction,
    matcher_finetune_loss,
    matcher_ransac_pose,
)
from differentiable_ransac_tpu.ops import pose


def _fake_matcher(prob):
    """A matcher that returns the synthetic GT correspondences in pixels,
    confident on inliers."""

    def fn(image0, image1):
        conf = np.where(prob["inlier_mask"], 0.9, 0.3).astype(np.float32)
        return MatchPrediction(
            mkpts0=prob["matches_px"][:, :2],
            mkpts1=prob["matches_px"][:, 2:],
            confidence=conf,
        )

    return fn


def test_adapter_produces_fixed_size_calibrated():
    prob = two_view_problem(n_points=200, noise=0.5, outlier_ratio=0.3, seed=0)
    ad = MatcherAdapter(_fake_matcher(prob), nfeatures=256)
    out = ad.correspondences(None, None, prob["K"], prob["K"])
    assert out["points"].shape == (256, 4)
    # the 0.5 confidence threshold admits exactly the confident matches
    n_conf = int(prob["inlier_mask"].sum())
    assert out["point_mask"].sum() == n_conf
    # calibrated coords match the generator's (first confident matches)
    conf_pts = prob["matches"][prob["inlier_mask"]]
    np.testing.assert_allclose(out["points"][:5], conf_pts[:5], atol=1e-5)


def test_adapter_confidence_ladder():
    prob = two_view_problem(n_points=30, seed=1)

    def low_conf(image0, image1):
        return MatchPrediction(prob["matches_px"][:, :2], prob["matches_px"][:, 2:],
                               np.full(30, 0.25, np.float32))

    ad = MatcherAdapter(low_conf, nfeatures=64, min_matches=16)
    out = ad.correspondences(None, None, prob["K"], prob["K"])
    assert out["point_mask"].sum() == 30  # 0.5 fails, 0.2 admits all


def test_matcher_ransac_pose_end_to_end():
    prob = two_view_problem(n_points=300, noise=0.5, outlier_ratio=0.4, seed=2)
    ad = MatcherAdapter(_fake_matcher(prob), nfeatures=512)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=500, threshold=2.0)
    out = matcher_ransac_pose(ad, cfg, None, None, prob["K"], prob["K"],
                              jax.random.PRNGKey(0))
    err_R = np.degrees(float(pose.rotation_error(out["R"], jnp.asarray(prob["R"]))))
    err_t = np.degrees(float(pose.translation_error(out["t"], jnp.asarray(prob["t"]))))
    assert err_R < 3.0, err_R
    assert err_t < 5.0, err_t


def test_matcher_finetune_loss_gradient():
    prob = two_view_problem(n_points=128, noise=0.5, outlier_ratio=0.2, seed=3)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=64, train=True)
    pts = jnp.asarray(prob["matches"])
    gt_mask = jnp.asarray(prob["inlier_mask"].astype(np.float32))

    def loss(logits):
        return matcher_finetune_loss(cfg, pts, logits, jnp.asarray(prob["E"]),
                                     gt_mask, jax.random.PRNGKey(3))

    val, g = jax.value_and_grad(loss)(jnp.zeros((128,), jnp.float32))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
