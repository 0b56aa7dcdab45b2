"""Cross-metric audit (VERDICT r2 missing #4): our metric stack must equal
the REFERENCE's own implementations on random inputs.

The parity headline (F1 0.638 vs 0.492, PARITY.md) rests on each side
scoring with its own metric code; these tests close that hole by asserting
``ops.metrics.f_error``/``auc``/``pose_error`` are numerically identical to
``/root/reference/cv_utils.py:528-677`` — so a model scored by our stack
gets the same number from the reference's.
"""

import sys

import numpy as np
import pytest

from differentiable_ransac_tpu.ops import metrics

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_cv_utils():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    cv_utils = pytest.importorskip("cv_utils")
    return cv_utils


def _random_f_problem(seed):
    rng = np.random.default_rng(seed)
    n = 300
    pts1 = rng.uniform(0, 1000, (2, n))
    pts2 = rng.uniform(0, 1000, (2, n))
    F = rng.normal(size=(3, 3))
    F /= np.linalg.norm(F)
    # gt_F near F so a nontrivial fraction of points agree on both
    gt_F = F + 0.05 * rng.normal(size=(3, 3))
    gt_F /= np.linalg.norm(gt_F)
    return pts1, pts2, F, gt_F


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_f_error_matches_reference(ref_cv_utils, seed):
    pts1, pts2, F, gt_F = _random_f_problem(seed)
    for threshold in (0.75, 3.0, 25.0):
        ours = metrics.f_error(pts1, pts2, F, gt_F, threshold)
        # reference signature wants (2, N, 1) arrays (cv_utils.py:594-650)
        theirs = ref_cv_utils.f_error(
            pts1[:, :, None], pts2[:, :, None], F, gt_F, threshold
        )
        assert bool(ours[0]) == bool(theirs[0])
        np.testing.assert_allclose(ours[1:], theirs[1:], rtol=1e-9, atol=1e-12)


def test_f_error_invalid_case_matches_reference(ref_cv_utils):
    pts1, pts2, F, gt_F = _random_f_problem(9)
    # threshold so small no gt inliers exist -> both must report invalid
    ours = metrics.f_error(pts1, pts2, F, gt_F, 1e-12)
    theirs = ref_cv_utils.f_error(
        pts1[:, :, None], pts2[:, :, None], F, gt_F, 1e-12
    )
    assert bool(ours[0]) == bool(theirs[0]) == False  # noqa: E712


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auc_matches_reference(ref_cv_utils, seed):
    rng = np.random.default_rng(seed)
    losses = rng.uniform(0, 40, 257).tolist()
    ours = metrics.auc(losses, thresholds=(5, 10, 20))
    theirs = ref_cv_utils.AUC(losses, thresholds=[5, 10, 20])
    np.testing.assert_allclose(ours, [float(t) for t in theirs], rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_pose_error_matches_reference(ref_cv_utils, seed):
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    R = Rotation.random(random_state=int(seed)).as_matrix()
    gt_R = Rotation.random(random_state=int(seed) + 100).as_matrix()
    t = rng.normal(size=(3, 1))
    t /= np.linalg.norm(t)
    gt_t = rng.normal(size=(3, 1))
    gt_t /= np.linalg.norm(gt_t)
    ours = metrics.pose_error(R, gt_R, t, gt_t)
    theirs = ref_cv_utils.pose_error(R, gt_R, t, gt_t)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)
