"""Point-cloud utility tests."""

import numpy as np

from differentiable_ransac_tpu.ops import pointcloud as pc


def test_transform_compose_inverse():
    rng = np.random.default_rng(0)
    T1 = pc.random_rotation(rng=rng)
    T1[:3, 3] = rng.normal(size=3)
    T2 = pc.random_rotation(rng=rng)
    T2[:3, 3] = rng.normal(size=3)
    pts = rng.normal(size=(50, 3))
    a = pc.apply_transform(pc.apply_transform(pts, T1), T2)
    b = pc.apply_transform(pts, pc.compose_transforms(T1, T2))
    np.testing.assert_allclose(a, b, atol=1e-10)
    back = pc.apply_transform(a, pc.compose_transforms(
        pc.inverse_transform(T2), pc.inverse_transform(T1)))
    np.testing.assert_allclose(back, pts, atol=1e-10)


def test_random_rotation_is_rotation():
    T = pc.random_rotation(rng=np.random.default_rng(1))
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(R) - 1.0) < 1e-12


def test_sample_keypoints_topk_and_nms():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 10, size=(200, 3))
    scores = rng.uniform(0, 1, 200)
    top = pc.sample_keypoints(pts, scores, 10)
    assert (scores[top] >= np.sort(scores)[-10] - 1e-12).all()
    nms = pc.sample_keypoints(pts, scores, 10, nms_radius=2.0)
    # NMS keypoints are pairwise separated
    d = np.linalg.norm(pts[nms][:, None] - pts[nms][None], axis=-1)
    d[np.diag_indices(len(nms))] = np.inf
    assert d.min() > 2.0


def test_depth_to_points_roundtrip():
    K = np.array([[500.0, 0, 32], [0, 500.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 2.0)
    depth[0, 0] = 0.0      # invalid
    depth[1, 1] = 100.0    # beyond limit
    pts = pc.depth_to_points(depth, K)
    assert pts.shape[0] == 48 * 64 - 2
    np.testing.assert_allclose(pts[:, 2], 2.0)
    # center pixel back-projects to the optical axis
    uv = K @ pts[pts.shape[0] // 2] / 2.0
    assert 0 <= uv[0] <= 64 and 0 <= uv[1] <= 48
