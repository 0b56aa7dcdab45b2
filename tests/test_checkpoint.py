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


def test_resave_after_restore_both_key_flavors(tmp_path):
    """The resume cycle: save -> restore -> SAVE AGAIN must work for both
    old-style uint32 keys and typed PRNG keys, and restore must preserve
    the key flavor. Round-4 regression: the first save-after-restore
    crashed orbax (str `rng_impl` leaf) and restore silently upgraded
    old-style keys to typed ones."""
    model, state = _make_state(0)

    # old-style uint32 key (what jax.random.PRNGKey returns)
    rng = jax.random.PRNGKey(5)
    mgr = CheckpointManager(str(tmp_path / "a"), max_to_keep=2)
    mgr.save(1, state, rng=rng, data=DataPosition(0, 0, 0), wait=True)
    restored, rng2, _ = mgr.restore(state)
    assert rng2.dtype == rng.dtype, (rng2.dtype, rng.dtype)  # same flavor
    np.testing.assert_array_equal(np.asarray(rng2), np.asarray(rng))
    # the failing step: save the restored state + key again
    assert mgr.save(2, restored, rng=rng2, data=DataPosition(1, 0, 0), wait=True)
    mgr.close()

    # typed key (jax.random.key)
    rng_t = jax.random.key(5)
    mgr = CheckpointManager(str(tmp_path / "b"), max_to_keep=2)
    mgr.save(1, state, rng=rng_t, data=DataPosition(0, 0, 0), wait=True)
    restored, rng3, _ = mgr.restore(state)
    assert jax.dtypes.issubdtype(rng3.dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(rng3)),
                                  np.asarray(jax.random.key_data(rng_t)))
    assert mgr.save(2, restored, rng=rng3, data=DataPosition(1, 0, 0), wait=True)
    mgr.close()
