"""Reference-checkpoint import: torch DS_Block → Flax CLNet parity.

These tests require the read-only reference checkout (with its shipped
pretrained models) and CPU torch; they are skipped when either is absent.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REF_CKPT = "/root/reference/pretrained_models/saved_model_5PC_l_epi/model.net"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CKPT), reason="reference pretrained model not available"
)


@pytest.fixture(scope="module")
def imported():
    from differentiable_ransac_tpu.data.torch_import import load_reference_clnet

    return load_reference_clnet(REF_CKPT)


def test_import_covers_every_used_tensor(imported):
    """Every torch tensor except the unused pre=False `right` convs and
    num_batches_tracked counters must land in the flax tree."""
    import flax

    from differentiable_ransac_tpu.data.torch_import import load_torch_state_dict

    sd = load_torch_state_dict(REF_CKPT)
    used = [k for k in sd
            if ".right." not in k and "num_batches_tracked" not in k]
    params, bstats = imported
    n_imported = len(flax.traverse_util.flatten_dict(params)) + len(
        flax.traverse_util.flatten_dict(bstats)
    )
    assert n_imported == len(used), (n_imported, len(used))


def test_import_tree_matches_model_init(imported):
    """The converted tree must be structurally identical to CLNet.init's."""
    import flax

    from differentiable_ransac_tpu.models.clnet import CLNet

    params, bstats = imported
    variables = CLNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 7)),
                             train=False)
    want_p = set(flax.traverse_util.flatten_dict(variables["params"]))
    got_p = set(flax.traverse_util.flatten_dict(params))
    assert want_p == got_p
    want_s = set(flax.traverse_util.flatten_dict(variables["batch_stats"]))
    got_s = set(flax.traverse_util.flatten_dict(bstats))
    assert want_s == got_s


def test_forward_parity_with_torch_reference(imported):
    """Imported weights reproduce the torch reference's predicted logits on
    the same input to f32 round-off (reference forward:
    ``model_cl.py:600-642``, prob_type=2 logits path)."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from model_cl import CLNet as TorchCLNet
    finally:
        sys.path.remove("/root/reference")

    from differentiable_ransac_tpu.models.clnet import CLNet

    tm = TorchCLNet()
    tm.load_state_dict(torch.load(REF_CKPT, map_location="cpu"))
    tm.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(scale=0.3, size=(2, 200, 7)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 2, 1).unsqueeze(-1),
                  prob_type=2).numpy()

    params, bstats = imported
    out = CLNet(exact_knn=True).apply(
        {"params": params, "batch_stats": bstats}, jnp.asarray(x), train=False
    )
    got = np.asarray(out["log_probs"])
    assert np.abs(want - got).max() < 1e-3
    assert np.corrcoef(want.ravel(), got.ravel())[0, 1] > 0.999999


def test_gcn_reference_semantics_matches_torch():
    """The default GCN aggregation reproduces the reference's shipped
    behavior — whose `attention` collapses to a (B,1,1) scalar
    (``model_cl.py:131-134``), NOT the paper's rank-1 adjacency."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from model_cl import GCN_Block
    finally:
        sys.path.remove("/root/reference")

    g = GCN_Block(8)
    torch.manual_seed(1)
    x = torch.randn(2, 8, 24, 1)
    w = torch.randn(2, 24)
    with torch.no_grad():
        want = g.graph_aggregation(x, w).squeeze(-1).transpose(1, 2).numpy()

    a = jax.nn.relu(jnp.tanh(jnp.asarray(w.numpy())))
    xs = jnp.asarray(x.squeeze(-1).transpose(1, 2).numpy())
    n = xs.shape[1]
    s = jnp.sum(a * a, axis=-1, keepdims=True)[..., None]
    got = (s * jnp.sum(xs, axis=1, keepdims=True) + xs) / (n * s + 1.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
