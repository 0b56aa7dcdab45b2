"""Orbax checkpoint round-trip: full state + RNG + data position."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.checkpoint import CheckpointManager, DataPosition
from differentiable_ransac_tpu.config import TrainConfig
from differentiable_ransac_tpu.models.clnet import CLNet
from differentiable_ransac_tpu.train import TrainState, create_optimizer


def _make_state(seed=0):
    model = CLNet(channels=8)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 7)),
                           train=False)
    tx = create_optimizer(TrainConfig(), steps_per_epoch=10)
    return model, TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.asarray(7, jnp.int32),
    )


def test_roundtrip(tmp_path):
    model, state = _make_state(0)
    rng = jax.random.PRNGKey(123)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.save(7, state, rng=rng, data=DataPosition(3, 11, 42), wait=True)
    mgr.close()

    _, template = _make_state(1)  # different init values, same structure
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    restored, rng2, data = mgr2.restore(template)
    mgr2.close()

    assert int(restored.step) == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.opt_state, restored.opt_state)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(rng)),
        np.asarray(jax.random.key_data(rng2)))
    assert (data.epoch, data.batch, data.shuffle_seed) == (3, 11, 42)


def test_retention_and_latest(tmp_path):
    _, state = _make_state(0)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, state._replace(step=jnp.asarray(s, jnp.int32)), wait=True)
    assert mgr.latest_step() == 3
    _, template = _make_state(1)
    restored, rng, data = mgr.restore(template)
    assert int(restored.step) == 3 and rng is None and data is None
    # max_to_keep pruned step 1
    with pytest.raises(Exception):
        mgr.restore(template, step=1)
    mgr.close()
