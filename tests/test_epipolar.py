"""Geometry-substrate unit tests against synthetic ground truth and numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.ops import epipolar


@pytest.fixture(scope="module")
def prob():
    return two_view_problem(n_points=50, seed=1)


def test_sampson_zero_for_inliers(prob):
    d = epipolar.sampson_squared(jnp.asarray(prob["E"]), jnp.asarray(prob["matches"]))
    assert d.shape == (50,)
    assert float(jnp.max(d)) < 1e-8


def test_sampson_nonzero_for_outliers():
    p = two_view_problem(n_points=100, outlier_ratio=0.5, seed=2)
    d = np.asarray(epipolar.sampson_squared(jnp.asarray(p["E"]), jnp.asarray(p["matches"])))
    inl = p["inlier_mask"]
    assert d[inl].max() < 1e-8
    assert np.median(d[~inl]) > 1e-4


def test_sampson_batched_models(prob):
    models = jnp.stack([jnp.asarray(prob["E"])] * 7)
    d = epipolar.sampson_squared(models, jnp.asarray(prob["matches"]))
    assert d.shape == (7, 50)


def test_symmetric_epipolar_zero(prob):
    m = prob["matches"]
    d = epipolar.symmetric_epipolar_squared(
        jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:]), jnp.asarray(prob["E"])
    )
    assert float(jnp.max(d)) < 1e-8


def test_hartley_normalize_statistics():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-100, 400, size=(3, 20, 4)).astype(np.float32)
    normalized, T1, T2t = epipolar.hartley_normalize(jnp.asarray(pts))
    n = np.asarray(normalized)
    # mass point ~0, avg distance ~sqrt(2) in both images
    assert np.abs(n.mean(axis=1)).max() < 1e-4
    d1 = np.linalg.norm(n[..., :2], axis=-1).mean(axis=1)
    d2 = np.linalg.norm(n[..., 2:], axis=-1).mean(axis=1)
    np.testing.assert_allclose(d1, np.sqrt(2), rtol=1e-4)
    np.testing.assert_allclose(d2, np.sqrt(2), rtol=1e-4)


def test_hartley_denormalization_consistency():
    """F fitted on normalized coords, mapped back via T2ᵀ F T1, must vanish
    on the original pixel coords."""
    p = two_view_problem(n_points=30, seed=3)
    pts = jnp.asarray(p["matches_px"][None])
    normalized, T1, T2t = epipolar.hartley_normalize(pts)
    # ground-truth F in normalized coordinates: F_n = T2⁻ᵀ F T1⁻¹; T2t is
    # already the transposed transform, so T2⁻ᵀ = inv(T2t).
    F = jnp.asarray(p["F"])
    Fn = jnp.linalg.inv(T2t[0]) @ F @ jnp.linalg.inv(T1[0])
    d = epipolar.sampson_squared(Fn, normalized[0])
    assert float(jnp.max(d)) < 1e-6
    # and the round trip
    F_back = T2t[0] @ Fn @ T1[0]
    np.testing.assert_allclose(np.asarray(F_back), np.asarray(F), atol=1e-5)


def test_normalize_denormalize_roundtrip():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 1000, size=(10, 2)).astype(np.float32))
    im_size = jnp.asarray([768.0, 1024.0])
    back = epipolar.denormalize_pts(epipolar.normalize_pts(pts, im_size), im_size)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), rtol=1e-5)


def test_normalize_keypoints_matches_calibration(prob):
    px = jnp.asarray(prob["matches_px"][:, :2])
    calib = epipolar.normalize_keypoints(px, jnp.asarray(prob["K"]))
    np.testing.assert_allclose(np.asarray(calib), prob["matches"][:, :2], atol=1e-5)


def test_essential_from_pose(prob):
    E = epipolar.essential_from_pose(jnp.asarray(prob["R"]), jnp.asarray(prob["t"]))
    np.testing.assert_allclose(np.asarray(E), prob["E"], atol=1e-6)


def test_fundamental_essential_roundtrip(prob):
    K = jnp.asarray(prob["K"])
    F = epipolar.fundamental_from_essential(jnp.asarray(prob["E"]), K, K)
    E_back = epipolar.essential_from_fundamental(F, K, K)
    E_back = E_back / jnp.linalg.norm(E_back)
    E_ref = prob["E"] / np.linalg.norm(prob["E"])
    np.testing.assert_allclose(np.abs(np.asarray(E_back)), np.abs(E_ref), atol=1e-5)
