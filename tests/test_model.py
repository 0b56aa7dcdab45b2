"""CLNet network tests."""

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.models.clnet import CLNet, knn_indices, select_prob_type


def _points(B=2, N=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(B, N, 7)).astype(np.float32))


def test_knn_indices_exact():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 32, 8)).astype(np.float32)
    idx = np.asarray(knn_indices(jnp.asarray(x), 5, exact=True))
    d = ((x[0][:, None, :] - x[0][None, :, :]) ** 2).sum(-1)
    want = np.argsort(d, axis=-1)[:, :5]
    # self is always the nearest neighbor
    assert (idx[0, :, 0] == np.arange(32)).all()
    # the neighbor SET matches numpy's
    for i in range(32):
        assert set(idx[0, i].tolist()) == set(want[i].tolist())


def test_knn_indices_approx_recall():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 128, 16)).astype(np.float32)
    idx_a = np.asarray(knn_indices(jnp.asarray(x), 9))
    idx_e = np.asarray(knn_indices(jnp.asarray(x), 9, exact=True))
    recall = np.mean([
        len(set(idx_a[b, i]) & set(idx_e[b, i])) / 9.0
        for b in range(2) for i in range(128)
    ])
    assert recall > 0.9, recall


def test_gcn_factorization_matches_dense():
    """The rank-1+I factored aggregation equals the reference's dense
    normalized-Laplacian formula."""
    import jax

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(2, 40)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 40, 8)).astype(np.float32))

    a = jax.nn.relu(jnp.tanh(w))
    A = a[:, :, None] * a[:, None, :] + jnp.eye(40)[None]
    d = 1.0 / jnp.sqrt(jnp.sum(A, axis=-1))
    L = A * d[:, :, None] * d[:, None, :]
    want = jnp.einsum("bnm,bmc->bnc", L, x)

    deg = a * jnp.sum(a, axis=-1, keepdims=True) + 1.0
    dd = 1.0 / jnp.sqrt(deg)
    dx = x * dd[..., None]
    proj = jnp.einsum("bn,bnc->bc", a, dx)
    got = dd[..., None] * (a[..., None] * proj[:, None, :]) + dd[..., None] * dx
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_clnet_forward_shapes():
    model = CLNet()
    pts = _points()
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    out = model.apply(variables, pts, train=False)
    assert out["logits"].shape == (2, 64)
    assert out["weights"].shape == (2, 64)
    w = np.asarray(out["weights"])
    assert ((0 < w) & (w < 1)).all()
    ns = np.asarray(out["normalized_weights"]).sum(-1)
    np.testing.assert_allclose(ns, 1.0, rtol=1e-5)


def test_clnet_train_mode_updates_batch_stats():
    model = CLNet()
    pts = _points()
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    out, mutated = model.apply(variables, pts, train=True, mutable=["batch_stats"])
    stats0 = jax.tree.leaves(variables["batch_stats"])
    stats1 = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(stats0, stats1)
    )


def test_clnet_gradients():
    model = CLNet()
    pts = _points()
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)

    def loss(params):
        out = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                          pts, train=False)
        return jnp.sum(out["logits"] ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
    assert total > 0


def test_select_prob_type():
    out = {
        "normalized_weights": jnp.asarray([0.0]),
        "weights": jnp.asarray([1.0]),
        "log_probs": jnp.asarray([2.0]),
    }
    assert float(select_prob_type(out, 0)[0]) == 0.0
    assert float(select_prob_type(out, 1)[0]) == 1.0
    assert float(select_prob_type(out, 2)[0]) == 2.0
