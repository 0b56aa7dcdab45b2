"""Extended metric + Sturm-chain tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.data.synthetic import rigid_problem, two_view_problem
from differentiable_ransac_tpu.ops import metrics
from differentiable_ransac_tpu.ops.polynomial import sturm_count_real_roots


def test_sturm_count_known_roots():
    roots = np.array([-2.0, -0.5, 0.3, 1.7])
    c = jnp.asarray(np.poly(roots)[::-1].copy())
    assert int(sturm_count_real_roots(c, -3.0, 3.0)) == 4
    assert int(sturm_count_real_roots(c, 0.0, 3.0)) == 2
    assert int(sturm_count_real_roots(c, -1.0, 0.0)) == 1


def test_sturm_count_complex_pairs():
    roots = np.array([1.0, 2.0, 0.5 + 1j, 0.5 - 1j])
    c = jnp.asarray(np.poly(roots)[::-1].real.copy())
    assert int(sturm_count_real_roots(c, -10.0, 10.0)) == 2


def test_sturm_degree10():
    roots = np.arange(10) - 4.5
    c = jnp.asarray(np.poly(roots)[::-1].copy())
    assert int(sturm_count_real_roots(c, -10.0, 10.0)) == 10
    assert int(sturm_count_real_roots(c, 0.0, 10.0)) == 5


def test_registration_extras():
    p = rigid_problem(n_points=200, noise=0.0, outlier_ratio=0.0, seed=0)
    src = p["points"][:, :3]
    ref = p["points"][:, 3:]
    T = p["transform"]
    assert metrics.overlap_ratio(ref, src, T, 0.05) > 0.99
    assert metrics.inlier_ratio_3d(src, ref, T, 0.05) > 0.99
    ridx, sidx = metrics.ground_truth_correspondences(ref, src, T, 0.05)
    assert len(ridx) == 200
    prec, rec = metrics.correspondence_precision_recall(ridx, sidx, ridx, sidx)
    assert prec == 1.0 and rec == 1.0
    # chamfer of a perfect estimate is ~0 (raw cloud = the ref-side cloud)
    d = metrics.modified_chamfer_distance(ref, ref, src, T, T)
    assert d < 1e-5
    d_bad = metrics.modified_chamfer_distance(ref, ref, src, T, np.eye(4))
    assert d_bad > d


def test_orientation_scale_error_shapes():
    p = two_view_problem(n_points=50, seed=1)
    ang = np.zeros(50)
    e = metrics.orientation_error(p["matches"][:, :2], p["matches"][:, 2:],
                                  p["E"].astype(np.float64), ang)
    assert e.shape == (50,)
    assert np.isfinite(e).all()
    s = metrics.scale_error(p["matches"][:, :2], p["matches"][:, 2:],
                            p["E"].astype(np.float64), np.ones(50))
    assert np.isfinite(s)
