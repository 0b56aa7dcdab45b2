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
