"""Sampler and MSAC-scoring unit tests."""

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.samplers import (
    gather_minimal_samples,
    gumbel_topk_sample,
    uniform_sample,
)
from differentiable_ransac_tpu.scoring import msac_score, msac_threshold


def test_gumbel_topk_shapes_and_onehot():
    key = jax.random.PRNGKey(0)
    logits = jnp.zeros((100,))
    idx, st, soft = gumbel_topk_sample(key, logits, 32, 5)
    assert idx.shape == (32, 5)
    assert st.shape == (32, 100)
    assert soft.shape == (32, 100)
    st = np.asarray(st)
    # forward value is exactly the hard one-hot sum
    np.testing.assert_allclose(st.sum(-1), 5.0, rtol=1e-5)
    assert ((st > 0.99).sum(-1) == 5).all()
    # indices ascend (reference mask-select ordering)
    idx = np.asarray(idx)
    assert (np.diff(idx, axis=-1) > 0).all()


def test_gumbel_prefers_high_logits():
    key = jax.random.PRNGKey(1)
    logits = jnp.concatenate([jnp.full((10,), 10.0), jnp.full((90,), -10.0)])
    idx, _, _ = gumbel_topk_sample(key, logits, 64, 5)
    assert (np.asarray(idx) < 10).mean() > 0.95


def test_gumbel_gradient_flows_to_logits():
    key = jax.random.PRNGKey(2)
    matches = jnp.asarray(np.random.default_rng(0).normal(size=(50, 4)).astype(np.float32))

    def loss(logits):
        idx, st, _ = gumbel_topk_sample(key, logits, 8, 5)
        samples = gather_minimal_samples(matches, idx, st)
        return jnp.sum(samples**2)

    g = jax.grad(loss)(jnp.zeros((50,)))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_gather_matches_direct_indexing():
    key = jax.random.PRNGKey(3)
    matches = jnp.asarray(np.random.default_rng(1).normal(size=(40, 4)).astype(np.float32))
    idx, st, _ = gumbel_topk_sample(key, jnp.zeros((40,)), 16, 7)
    samples = gather_minimal_samples(matches, idx, st)
    want = np.asarray(matches)[np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(samples), want, rtol=1e-5)


def test_uniform_sample_no_replacement():
    key = jax.random.PRNGKey(4)
    idx = np.asarray(uniform_sample(key, 30, 64, 7))
    assert idx.shape == (64, 7)
    for row in idx:
        assert len(set(row.tolist())) == 7
    assert idx.min() >= 0 and idx.max() < 30


def test_msac_score_perfect_model():
    p = two_view_problem(n_points=200, outlier_ratio=0.4, seed=3)
    scores, masks = msac_score(jnp.asarray(p["matches"]), jnp.asarray(p["E"])[None], 0.001)
    masks = np.asarray(masks)[0]
    # all true inliers are recovered; outliers rejected
    assert masks[p["inlier_mask"]].all()
    assert (~masks[~p["inlier_mask"]]).mean() > 0.95
    # score between inlier count and n
    assert 0 < float(scores[0]) <= 200


def test_msac_score_ranks_models():
    p = two_view_problem(n_points=200, outlier_ratio=0.3, seed=4)
    rng = np.random.default_rng(0)
    bad = p["E"] + rng.normal(scale=0.3, size=(3, 3)).astype(np.float32)
    models = jnp.stack([jnp.asarray(p["E"]), jnp.asarray(bad)])
    scores, _ = msac_score(jnp.asarray(p["matches"]), models, 0.001)
    assert float(scores[0]) > float(scores[1])


def test_msac_point_mask_excludes_padding():
    p = two_view_problem(n_points=100, seed=5)
    m = jnp.asarray(p["matches"])
    mask = jnp.concatenate([jnp.ones(50), jnp.zeros(50)])
    s_full, _ = msac_score(m, jnp.asarray(p["E"])[None], 0.001)
    s_half, masks = msac_score(m, jnp.asarray(p["E"])[None], 0.001, point_mask=mask)
    assert float(s_half[0]) < float(s_full[0])
    assert not np.asarray(masks)[0, 50:].any()


def test_msac_threshold_formula():
    assert abs(msac_threshold(2.0) - 9.0) < 1e-9


def test_ransac_score_is_hard_inlier_count():
    from differentiable_ransac_tpu.scoring import ransac_score

    p = two_view_problem(n_points=200, outlier_ratio=0.4, seed=6)
    m = jnp.asarray(p["matches"])
    E = jnp.asarray(p["E"])[None]
    scores, masks = ransac_score(m, E, 0.001)
    # the hard score IS the inlier count, and the support is the MSAC mask
    assert float(scores[0]) == float(np.asarray(masks)[0].sum())
    _, msac_masks = msac_score(m, E, 0.001)
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(msac_masks))


def test_scoring_flag_zero_maps_to_ransac_kind():
    from differentiable_ransac_tpu.config import ScoringKind
    from differentiable_ransac_tpu.utils import build_parser, configs_from_args

    for flag, kind in ((0, ScoringKind.RANSAC), (1, ScoringKind.MSAC),
                       (2, ScoringKind.MAGSAC)):
        args = build_parser("t").parse_args(["-s", str(flag)])
        _, rcfg = configs_from_args(args)
        assert rcfg.scoring == kind


def test_engine_runs_with_ransac_scoring():
    from differentiable_ransac_tpu.config import (
        ModelKind, RansacConfig, SamplerKind, ScoringKind,
    )
    from differentiable_ransac_tpu.engine import ransac_fixed

    p = two_view_problem(n_points=100, noise=0.5, outlier_ratio=0.3, seed=7)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.UNIFORM,
                       scoring=ScoringKind.RANSAC)
    out = ransac_fixed(cfg, jnp.asarray(p["matches"]),
                       jnp.zeros(100, jnp.float32), jax.random.PRNGKey(0),
                       threshold=0.002, num_hypotheses=128)
    assert np.isfinite(float(out["best_score"]))
    # best model recovers a majority of true inliers
    assert np.asarray(out["best_mask"])[p["inlier_mask"]].mean() > 0.5
