"""CLNet down-sampling / pruning path (reference ``model_cl.py:407-425``)."""

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.models.clnet import CLNet


def _points(n=64):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(scale=0.3, size=(2, n, 7)).astype(np.float32))


def test_pruned_clnet_forward_shapes_and_fill():
    model = CLNet(sampling_rate=0.5)
    pts = _points()
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    out = model.apply(variables, pts, train=False)
    # full-length outputs, fixed shapes
    assert out["logits"].shape == (2, 64)
    raw = np.asarray(out["raw"])
    # exactly N·sr kept per pair; pruned entries carry the -30 fill
    kept = (raw > -30.0).sum(axis=-1)
    assert (kept == 32).all(), kept
    w = np.asarray(out["weights"])
    assert (w[raw <= -30.0] < 1e-8).all()


def test_pruned_clnet_keeps_top_w0():
    """Kept-index semantics: the surviving points are exactly the top
    N·sr by the intermediate weight w0 (the reference gathers by sorted
    weight indices, ``model_cl.py:407-425``)."""
    model = CLNet(sampling_rate=0.25)
    pts = _points()
    variables = model.init(jax.random.PRNGKey(1), pts, train=False)
    out = model.apply(variables, pts, train=False)
    w0 = np.asarray(out["w0"])
    raw = np.asarray(out["raw"])
    for b in range(w0.shape[0]):
        kept = set(np.where(raw[b] > -30.0)[0])
        want = set(np.argsort(-w0[b])[:16])
        assert kept == want


def test_pruned_clnet_trains():
    """sampling_rate<1 is differentiable (grads reach all params that are
    in the pruned compute path) and runs in train mode."""
    model = CLNet(sampling_rate=0.5)
    pts = _points()
    variables = model.init(jax.random.PRNGKey(2), pts, train=False)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, train=True, mutable=["batch_stats"])
        return jnp.mean(out["weights"])

    val, g = jax.value_and_grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
    assert total > 0

    # pretrained (dense) checkpoints load into the pruned variant unchanged:
    # the module tree is identical
    dense = CLNet().init(jax.random.PRNGKey(2), pts, train=False)
    t1 = jax.tree.structure(dense["params"])
    t2 = jax.tree.structure(variables["params"])
    assert t1 == t2
