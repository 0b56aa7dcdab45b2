"""Pallas kernel correctness vs the jnp reference scorer (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu import pallas_kernels
from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.scoring import msac_score

pytestmark = pytest.mark.skipif(not pallas_kernels._PALLAS_OK, reason="pallas unavailable")


def test_msac_pallas_matches_jnp():
    p = two_view_problem(n_points=700, noise=0.5, outlier_ratio=0.3, seed=0)
    rng = np.random.default_rng(0)
    models = jnp.asarray(
        np.stack([p["E"]] + [p["E"] + rng.normal(scale=s, size=(3, 3)).astype(np.float32)
                             for s in (0.01, 0.1, 0.5, 1.0) for _ in range(5)])
    )
    thr = 2.0 / 1000.0
    want, _ = msac_score(jnp.asarray(p["matches"]), models, thr)
    got = pallas_kernels.msac_scores_pallas(
        jnp.asarray(p["matches"]), models, thr, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-3)


def test_msac_pallas_point_mask():
    p = two_view_problem(n_points=300, seed=1)
    models = jnp.asarray(p["E"])[None]
    mask = jnp.concatenate([jnp.ones(100), jnp.zeros(200)])
    thr = 2.0 / 1000.0
    want, _ = msac_score(jnp.asarray(p["matches"]), models, thr, point_mask=mask)
    got = pallas_kernels.msac_scores_pallas(
        jnp.asarray(p["matches"]), models, thr, point_mask=mask, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-3)


def test_msac_pallas_awkward_sizes():
    # non-multiple-of-tile H and N exercise the padding path
    p = two_view_problem(n_points=133, seed=2)
    rng = np.random.default_rng(2)
    models = jnp.asarray(
        np.stack([p["E"] + rng.normal(scale=0.1, size=(3, 3)).astype(np.float32)
                  for _ in range(13)])
    )
    thr = 1.5 / 1000.0
    want, _ = msac_score(jnp.asarray(p["matches"]), models, thr)
    got = pallas_kernels.msac_scores_pallas(
        jnp.asarray(p["matches"]), models, thr, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-3)
