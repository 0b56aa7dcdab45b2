"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.config import ModelKind, RansacConfig, SamplerKind
from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.engine import ransac_fixed
from differentiable_ransac_tpu.parallel import (
    make_mesh,
    sharded_match_loss_hypotheses,
    sharded_ransac,
)


def _model_distance(A, B):
    A = A / np.linalg.norm(A)
    B = B / np.linalg.norm(B)
    return min(np.linalg.norm(A - B), np.linalg.norm(A + B))


def _batch(n_pairs, n_points=256, seed0=0):
    probs = [two_view_problem(n_points=n_points, noise=0.5, outlier_ratio=0.3, seed=seed0 + i)
             for i in range(n_pairs)]
    return probs, jnp.asarray(np.stack([p["matches"] for p in probs]))


def test_make_mesh_shapes():
    mesh = make_mesh(pairs=4, hyp=2)
    assert mesh.shape == {"pairs": 4, "hyp": 2}
    mesh = make_mesh(pairs=1)
    assert mesh.shape == {"pairs": 1, "hyp": 8}


def test_sharded_ransac_finds_models():
    mesh = make_mesh(pairs=4, hyp=2)
    probs, pts = _batch(4)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=256, threshold=2.0)
    B, N = pts.shape[:2]
    logits = jnp.zeros((B, N), jnp.float32)
    keys = jnp.arange(B, dtype=jnp.uint32)
    thr = jnp.full((B,), 2.0 / 1000.0, jnp.float32)
    models, masks, scores = jax.jit(
        lambda a, b, c, d: sharded_ransac(cfg, mesh, a, b, c, d)
    )(pts, logits, keys, thr)
    assert models.shape == (B, 3, 3)
    for i, p in enumerate(probs):
        assert _model_distance(np.asarray(models[i]), p["E"]) < 0.1, i


@pytest.mark.slow
def test_sharded_ransac_matches_single_device_semantics():
    """Hyp-sharded argmax must equal the single-device argmax over the same
    lanes (same per-shard keys -> same hypothesis set).

    slow: the engine graph (unrolled elimination + root finder) takes
    ~10 min to compile on the virtual CPU mesh regardless of precision;
    the driver's dryrun_multichip covers the sharded path every round.
    """
    mesh = make_mesh(pairs=1, hyp=8)
    probs, pts = _batch(1, n_points=128, seed0=42)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=128, threshold=2.0, solver_precision=1)
    logits = jnp.zeros((1, pts.shape[1]), jnp.float32)
    keys = jnp.asarray([7], jnp.uint32)
    thr = jnp.full((1,), 2.0 / 1000.0, jnp.float32)
    models, masks, scores = sharded_ransac(cfg, mesh, pts, logits, keys, thr,
                                           rescued=False)

    # replicate on one device: same shard keys, concatenated lanes
    local_h = -(-cfg.num_hypotheses // 8)
    fixed = jax.jit(lambda k: ransac_fixed(cfg, pts[0], logits[0], k,
                                           threshold=thr[0], num_hypotheses=local_h))
    best_score, best_model = -np.inf, None
    for shard in range(8):
        key = jax.random.fold_in(jax.random.PRNGKey(7), shard)
        out = fixed(key)
        if float(out["best_score"]) > best_score:
            best_score = float(out["best_score"])
            best_model = np.asarray(out["best_model"])
    # the sharded result then applies the final refit; compare pre-refit
    # scores: sharded score must be >= the replicated best (refit only
    # improves it). f32 solver cores admit ~1% cross-compilation jitter in
    # the models (different XLA fusions), so the margin is relative.
    assert float(scores[0]) >= best_score * 0.98 - 1e-4


@pytest.mark.slow
def test_sharded_match_loss_gradients():
    """slow: the backward graph through the sharded engine takes ~12 min to
    compile on the CPU mesh; dryrun_multichip exercises the same
    differentiable collective path every round."""
    mesh = make_mesh(pairs=2, hyp=4)
    probs, pts = _batch(2, n_points=128, seed0=10)
    cfg = RansacConfig(model=ModelKind.ESSENTIAL, sampler=SamplerKind.GUMBEL,
                       max_iterations=64, train=True, solver_precision=1)
    B, N = pts.shape[:2]
    gt = jnp.asarray(np.stack([p["E"] for p in probs]))
    gtm = jnp.asarray(np.stack([p["inlier_mask"] for p in probs]).astype(np.float32))
    keys = jnp.arange(B, dtype=jnp.uint32)

    def loss(logits):
        return sharded_match_loss_hypotheses(cfg, mesh, pts, logits, gt, gtm, keys)

    val, g = jax.value_and_grad(loss)(jnp.zeros((B, N), jnp.float32))
    assert np.isfinite(float(val)) and 0 < float(val) <= 1.0
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
