"""Image-backed dataset round trip (reference DatasetPicture/Test,
``datasets.py:243-307,361-429``): synthetic scene dir → PictureDataset →
MatcherAdapter → pose estimation."""

import os

import numpy as np
import h5py
import jax
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
from differentiable_ransac_tpu.data.images import (
    PictureDataset,
    load_gray_image,
    scene_pair_keys,
)
from differentiable_ransac_tpu.data.synthetic import two_view_problem


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    """Build a reference-layout scene: images/, Egt/Fgt/K1_K2/R/T h5 files,
    evaluation_list key files. Two pairs from synthetic two-view geometry."""
    root = tmp_path_factory.mktemp("phototourism")
    scene_dir = root / "testscene"
    (scene_dir / "images").mkdir(parents=True)
    (root / "evaluation_list").mkdir()

    rng = np.random.default_rng(0)
    probs, keys = [], []
    Egt, Fgt, K1K2, Rs, Ts = {}, {}, {}, {}, {}
    for i in range(2):
        p = two_view_problem(n_points=200, noise=0.5, outlier_ratio=0.3, seed=i)
        ia, ib = f"{i:08d}_{2*i}", f"{i:08d}_{2*i+1}"
        for img_id in (ia, ib):
            np.save(scene_dir / "images" / f"{img_id}.npy",
                    (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8))
        match_id = f"{ia}-{ib}"
        Egt[match_id] = p["E"]
        Fgt[match_id] = p["F"]
        K1K2[match_id] = np.stack([p["K"], p["K"]])[None]
        # camera 1 canonical, camera 2 = [R|t]: gt_R = R2 R1ᵀ, gt_t = T2 - gt_R T1
        Rs[ia], Rs[ib] = np.eye(3), p["R"]
        Ts[ia], Ts[ib] = np.zeros(3), p["t"]
        keys.append(f"pair_{ia}_{ib}.npy")
        probs.append(p)

    for name, d in (("Egt", Egt), ("Fgt", Fgt), ("K1_K2", K1K2),
                    ("R", Rs), ("T", Ts)):
        with h5py.File(scene_dir / f"{name}.h5", "w") as f:
            for k, v in d.items():
                f[k] = v
    np.save(root / "evaluation_list" / "testscene_list.npy", np.array(keys))
    np.save(root / "evaluation_list" / "testscene_train.npy", np.array(keys[:1]))
    return str(scene_dir), probs


def test_scene_pair_keys_split(scene):
    scene_dir, _ = scene
    assert len(scene_pair_keys(scene_dir, valid=True)) == 2
    assert len(scene_pair_keys(scene_dir, valid=False)) == 1


def test_picture_dataset_roundtrip(scene):
    scene_dir, probs = scene
    ds = PictureDataset(scene_dir, valid=True)
    assert len(ds) == 2
    rec = ds[0]
    assert rec["image0"].shape == (48, 64)
    assert rec["image0"].dtype == np.float32
    assert 0.0 <= rec["image0"].min() and rec["image0"].max() <= 1.0
    np.testing.assert_allclose(rec["gt_E"], probs[0]["E"], atol=1e-6)
    np.testing.assert_allclose(rec["gt_R"], probs[0]["R"], atol=1e-6)
    np.testing.assert_allclose(rec["K1"], probs[0]["K"], atol=1e-6)


def test_gray_conversion_luma():
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 0] = 255  # pure red
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "img.npy")
        np.save(p, img)
        g = load_gray_image(p)
    np.testing.assert_allclose(g, 0.299, atol=1e-3)


def test_picture_dataset_feeds_matcher_eval(scene):
    """End-to-end: images + GT → fake matcher (synthetic correspondences
    keyed by pair index) → RANSAC pose, matching eval_matcher.py shape."""
    from differentiable_ransac_tpu.matchers import (
        MatcherAdapter,
        MatchPrediction,
        matcher_ransac_pose,
    )
    from differentiable_ransac_tpu.ops import pose as pose_ops

    scene_dir, probs = scene
    ds = PictureDataset(scene_dir, valid=True)

    state = {"i": 0}

    def fake_matcher(img0, img1):
        p = probs[state["i"]]
        return MatchPrediction(
            mkpts0=p["matches_px"][:, :2],
            mkpts1=p["matches_px"][:, 2:],
            confidence=np.where(p["inlier_mask"], 0.9, 0.3).astype(np.float32),
        )

    adapter = MatcherAdapter(fake_matcher, nfeatures=256)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=256, threshold=2.0, solver_precision=1)
    errs = []
    for i, rec in enumerate(ds.pairs()):
        state["i"] = i
        out = matcher_ransac_pose(adapter, cfg, rec["image0"], rec["image1"],
                                  rec["K1"], rec["K2"], jax.random.PRNGKey(i))
        err_R = pose_ops.rotation_error(out["R"], jnp.asarray(rec["gt_R"]))
        errs.append(float(np.degrees(err_R)))
    assert np.max(errs) < 5.0, errs


# ---------------------------------------------------------------------------
# Real-JPEG pipeline (VERDICT r3 task 10): rendered two-plane scene written
# as actual JPEG files, matched by a real pixel-based matcher (ZNCC patch
# search on the DECODED images), then image -> matcher -> engine -> pose.
# ---------------------------------------------------------------------------

def _smooth_texture(rng, h, w, cell=8):
    """Smooth random texture with enough structure for patch matching."""
    t = rng.uniform(0, 1, (h // cell + 2, w // cell + 2))
    t = np.kron(t, np.ones((cell, cell)))[:h, :w]
    k = np.ones(5) / 5.0
    for ax in (0, 1):
        t = np.apply_along_axis(lambda v: np.convolve(v, k, mode="same"), ax, t)
    t = t + 0.15 * rng.uniform(0, 1, (h, w))  # high-freq detail
    t = (t - t.min()) / (t.max() - t.min() + 1e-9)
    return t.astype(np.float32)


def _bilinear(img, x, y):
    h, w = img.shape
    x0 = np.clip(np.floor(x).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, h - 2)
    fx = np.clip(x - x0, 0, 1)
    fy = np.clip(y - y0, 0, 1)
    v = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
         + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)
    return v


def _render_two_plane_pair(seed=0):
    """Two fronto-parallel textured planes (bg z=10, fg square z=5) seen by
    cam1 (identity) and cam2 (R, t): per-plane homography warps of real
    pixel textures. Non-planar scene => well-posed essential matrix."""
    H, W = 240, 320
    f = 300.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)

    def rot_axis(axis, deg):
        a = np.radians(deg)
        c, s = np.cos(a), np.sin(a)
        i, j = [(1, 2), (0, 2), (0, 1)][axis]
        R = np.eye(3)
        R[i, i] = R[j, j] = c
        R[i, j], R[j, i] = (-s, s) if axis != 1 else (s, -s)
        return R

    # baseline ~3% of fg depth: large enough that the translation
    # direction is observable from integer-pixel ZNCC matches
    R = rot_axis(1, 1.5) @ rot_axis(2, 1.0)
    t = np.array([0.30, 0.10, 0.04])
    d_bg, d_fg = 10.0, 5.0

    rng = np.random.default_rng(seed)
    tex_bg = _smooth_texture(rng, H, W)
    tex_fg = _smooth_texture(rng, H, W)
    fg_box = (70, 170, 110, 210)  # y0, y1, x0, x1 in cam1 pixels

    img0 = tex_bg.copy()
    y0b, y1b, x0b, x1b = fg_box
    img0[y0b:y1b, x0b:x1b] = tex_fg[y0b:y1b, x0b:x1b]

    def plane_H(d):
        n = np.array([0.0, 0.0, 1.0])
        return K @ (R + np.outer(t, n) / d) @ np.linalg.inv(K)

    HB_inv = np.linalg.inv(plane_H(d_bg))
    HF_inv = np.linalg.inv(plane_H(d_fg))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    ones = np.ones_like(xs)
    px2 = np.stack([xs, ys, ones], axis=-1)  # (H, W, 3)

    def backmap(Hi):
        q = px2 @ Hi.T
        return q[..., 0] / q[..., 2], q[..., 1] / q[..., 2]

    xb, yb = backmap(HB_inv)
    xf, yf = backmap(HF_inv)
    in_fg = (yf >= y0b) & (yf < y1b) & (xf >= x0b) & (xf < x1b)
    img1 = np.where(in_fg, _bilinear(tex_fg, xf, yf), _bilinear(tex_bg, xb, yb))
    img1 = img1.astype(np.float32)

    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    E = E / np.linalg.norm(E)
    return img0, img1, K, R, t, E


def _zncc_matcher(img0, img1, grid_step=20, patch=11, win=30):
    """Real pixel-based matching: ZNCC patch search on the decoded images."""
    from numpy.lib.stride_tricks import sliding_window_view

    h, w = img0.shape
    pr = patch // 2
    m = pr + win
    mk0, mk1, conf = [], [], []
    for y in range(m, h - m, grid_step):
        for x in range(m, w - m, grid_step):
            P = img0[y - pr:y + pr + 1, x - pr:x + pr + 1].astype(np.float64)
            P = P - P.mean()
            nP = np.linalg.norm(P) + 1e-9
            region = img1[y - m:y + m + 1, x - m:x + m + 1]
            Wv = sliding_window_view(region, (patch, patch))
            Wm = Wv - Wv.mean(axis=(-2, -1), keepdims=True)
            num = np.einsum("ijkl,kl->ij", Wm, P)
            den = np.sqrt(np.einsum("ijkl,ijkl->ij", Wm, Wm)) * nP + 1e-9
            score = num / den
            iy, ix = np.unravel_index(np.argmax(score), score.shape)
            mk0.append((x, y))
            mk1.append((x - win + ix, y - win + iy))
            conf.append(max(float(score[iy, ix]), 1e-3))
    from differentiable_ransac_tpu.matchers import MatchPrediction

    return MatchPrediction(
        mkpts0=np.asarray(mk0, np.float32),
        mkpts1=np.asarray(mk1, np.float32),
        confidence=np.asarray(conf, np.float32),
    )


@pytest.fixture(scope="module")
def jpeg_scene(tmp_path_factory):
    """Reference-layout scene whose images are REAL JPEG files."""
    from PIL import Image

    root = tmp_path_factory.mktemp("phototourism_jpeg")
    scene_dir = root / "jpegscene"
    (scene_dir / "images").mkdir(parents=True)
    (root / "evaluation_list").mkdir()

    img0, img1, K, R, t, E = _render_two_plane_pair(seed=3)
    ia, ib = "00000000_0", "00000000_1"
    for img_id, img in ((ia, img0), (ib, img1)):
        Image.fromarray((img * 255).astype(np.uint8)).save(
            scene_dir / "images" / f"{img_id}.jpg", quality=92)
    match_id = f"{ia}-{ib}"
    for name, d in (("Egt", {match_id: E}),
                    ("Fgt", {match_id: np.linalg.inv(K).T @ E @ np.linalg.inv(K)}),
                    ("K1_K2", {match_id: np.stack([K, K])[None]}),
                    ("R", {ia: np.eye(3), ib: R}),
                    ("T", {ia: np.zeros(3), ib: t})):
        with h5py.File(scene_dir / f"{name}.h5", "w") as f:
            for k, v in d.items():
                f[k] = v
    keys = [f"pair_{ia}_{ib}.npy"]
    np.save(root / "evaluation_list" / "jpegscene_list.npy", np.array(keys))
    np.save(root / "evaluation_list" / "jpegscene_train.npy", np.array(keys))
    return str(scene_dir), (R, t, E)


def test_jpeg_scene_end_to_end_pose(jpeg_scene):
    """images/*.jpg -> PIL decode -> ZNCC matching on real pixels ->
    MatcherAdapter -> adaptive engine -> recovered pose vs GT
    (the eval_matcher.py pipeline on a real image format,
    reference datasets.py:243-307)."""
    from differentiable_ransac_tpu.matchers import MatcherAdapter, matcher_ransac_pose
    from differentiable_ransac_tpu.ops import pose as pose_ops
    from differentiable_ransac_tpu.ops.epipolar import sampson_squared

    scene_dir, (R_gt, t_gt, E_gt) = jpeg_scene
    ds = PictureDataset(scene_dir, valid=True)
    rec = ds[0]
    assert rec["image0"].shape == (240, 320) and rec["image0"].dtype == np.float32
    # the file on disk really is a JPEG
    with open(os.path.join(scene_dir, "images", rec["image_id1"] + ".jpg"), "rb") as f:
        assert f.read(2) == b"\xff\xd8"

    adapter = MatcherAdapter(_zncc_matcher, nfeatures=256)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=256, threshold=2.0, solver_precision=1)
    out = matcher_ransac_pose(adapter, cfg, rec["image0"], rec["image1"],
                              rec["K1"], rec["K2"], jax.random.PRNGKey(0))

    err_R = float(np.degrees(pose_ops.rotation_error(out["R"], jnp.asarray(R_gt))))
    err_t = float(np.degrees(pose_ops.translation_error(out["t"], jnp.asarray(t_gt))))
    assert err_R < 3.0, (err_R, err_t)
    assert err_t < 30.0, (err_R, err_t)  # short baseline: direction is noisy
    # the estimated E explains the GT-consistent matches
    inl = np.asarray(out["inlier_mask"])
    assert inl.sum() >= 30
