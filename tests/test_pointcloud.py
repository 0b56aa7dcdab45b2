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


def test_nearest_neighbor_and_normals():
    rng = np.random.default_rng(3)
    s = rng.uniform(0, 1, (50, 3))
    q = s[:10] + 1e-6
    d, idx = pc.nearest_neighbor(q, s, return_index=True)
    assert (idx == np.arange(10)).all() and d.max() < 1e-5
    assert pc.nearest_neighbor(q, s).shape == (10,)
    # normals regularized toward the origin: dot(points, normals) <= 0
    pts = rng.uniform(1, 2, (20, 3))
    normals = rng.normal(size=(20, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    reg = pc.regularize_normals(pts, normals, positive=True)
    assert ((pts * reg).sum(-1) <= 1e-12).all()
    neg = pc.regularize_normals(pts, normals, positive=False)
    np.testing.assert_allclose(neg, -reg)


def test_transform_construction_and_rotation_v2():
    rng = np.random.default_rng(4)
    R = pc.random_rotation_v2(rng)
    # atol 1e-9: the axis-normalization epsilon perturbs orthogonality ~1e-11
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert abs(np.linalg.det(R) - 1.0) < 1e-9
    t = rng.normal(size=3)
    T = pc.transform_from_rotation_translation(R, t)
    R2, t2 = pc.rotation_translation_from_transform(T)
    np.testing.assert_allclose(R2, R)
    np.testing.assert_allclose(t2, t)
    # apply_transform with normals: positions move, normals only rotate
    pts = rng.normal(size=(5, 3))
    nrm = rng.normal(size=(5, 3))
    p2, n2 = pc.apply_transform(pts, T, normals=nrm)
    np.testing.assert_allclose(p2, pts @ R.T + t)
    np.testing.assert_allclose(n2, nrm @ R.T)
    Trt = pc.random_transform(30.0, 0.5, rng)
    Rr = Trt[:3, :3]
    np.testing.assert_allclose(Rr @ Rr.T, np.eye(3), atol=1e-12)
    assert np.abs(Trt[:3, 3]).max() <= 0.5


def test_keypoint_sampler_variants():
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 10, (100, 3))
    scores = rng.uniform(0, 1, 100)
    idx = pc.random_sample_keypoint_indices(100, 20, rng=rng)
    assert len(idx) == 20 and len(np.unique(idx)) == 20
    # score-weighted sampling without replacement
    idxw = pc.random_sample_keypoint_indices(100, 20, scores=scores, rng=rng)
    assert len(np.unique(idxw)) == 20
    # n <= num: identity
    assert (pc.random_sample_keypoint_indices(10, 20) == np.arange(10)).all()
    # NMS variants: separated, and weighted subset is drawn from survivors
    nms = pc.sample_keypoints_with_nms(pts, scores, 10, radius=2.0)
    d = np.linalg.norm(pts[nms][:, None] - pts[nms][None], axis=-1)
    d[np.diag_indices(len(nms))] = np.inf
    assert d.min() > 2.0
    wnms = pc.sample_keypoints_with_nms(pts, scores, 5, radius=2.0,
                                        weighted=True, rng=rng)
    survivors = set(pc.sample_keypoints(pts, scores, len(pts), nms_radius=2.0).tolist())
    assert set(wnms.tolist()) <= survivors and len(wnms) == 5
