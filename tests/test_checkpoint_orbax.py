"""Orbax checkpoint backend: sharded save/restore + async flush.

The msgpack backend host-gathers everything; the orbax backends write
FSDP-sharded arrays per-shard and restore through the same
``restore_checkpoint`` auto-detection (orbax checkpoints are
directories).  Runs on the virtual 8-device CPU mesh from conftest.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from slice3d_tpu.parallel import create_mesh
from slice3d_tpu.train.checkpoint import (
    TopKCheckpointer,
    restore_checkpoint,
    save_checkpoint,
    wait_pending,
)


def _sharded_state(mesh):
    w = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    w = jax.device_put(w, NamedSharding(mesh, P("data", None)))
    b = jax.device_put(jnp.full((4,), 2.5), NamedSharding(mesh, P()))
    return {"variables": {"params": {"w": w, "b": b}}, "n_iter": 7}


@pytest.mark.parametrize("backend", ["orbax", "orbax_async"])
def test_orbax_roundtrip_sharded(tmp_path, backend):
    mesh = create_mesh()
    state = _sharded_state(mesh)
    path = str(tmp_path / "step_7.ckpt")
    save_checkpoint(path, state, backend=backend)
    wait_pending()
    assert os.path.isdir(path)  # orbax format, auto-detected on restore

    target = {
        "variables": {"params": {"w": np.zeros((8, 8), np.float32),
                                 "b": np.zeros((4,), np.float32)}},
        "n_iter": 0,
    }
    back = restore_checkpoint(path, target)
    np.testing.assert_array_equal(
        np.asarray(back["variables"]["params"]["w"]),
        np.arange(64, dtype=np.float32).reshape(8, 8))
    np.testing.assert_array_equal(np.asarray(back["variables"]["params"]["b"]),
                                  np.full((4,), 2.5, np.float32))
    assert int(np.asarray(back["n_iter"])) == 7

    # restore without a target also works (raw tree)
    raw = restore_checkpoint(path)
    assert np.asarray(raw["variables"]["params"]["w"]).shape == (8, 8)

    # restoring THROUGH a sharded template keeps the sharding — each
    # device reads its own shards, no host gather (the FSDP resume path)
    template = _sharded_state(mesh)
    back_sh = restore_checkpoint(path, template)
    w_sh = back_sh["variables"]["params"]["w"]
    assert isinstance(w_sh, jax.Array)
    assert w_sh.sharding.is_equivalent_to(
        template["variables"]["params"]["w"].sharding, 2)
    np.testing.assert_array_equal(
        np.asarray(w_sh), np.arange(64, dtype=np.float32).reshape(8, 8))


def test_topk_prunes_orbax_dirs(tmp_path):
    """TopK pruning must rmtree orbax DIRECTORY checkpoints (os.remove
    silently fails on directories, which would accumulate past k)."""
    mesh = create_mesh()
    state = _sharded_state(mesh)
    topk = TopKCheckpointer(str(tmp_path), monitor="val/m", k=2,
                            backend="orbax")
    for step, val in enumerate([3.0, 2.0, 1.0]):
        topk.update(val, step, state)
    kept = sorted(os.listdir(tmp_path))
    assert len(kept) == 2
    assert all(os.path.isdir(os.path.join(tmp_path, c)) for c in kept)
    assert not any("val_m=3.00000" in c for c in kept)  # worst pruned


def test_trainer_orbax_backend(tmp_path):
    """RegTrainer.save honors opts.ckpt_backend and restore() round-trips
    through the directory format."""
    from slice3d_tpu.config import Options
    from slice3d_tpu.train.train_reg import RegressionTrainer

    opts = Options(name_model="gtslice", img_size=32, n_qry=8, n_bs=2,
                   random_init=True, ckpt_backend="orbax")
    trainer = RegressionTrainer(opts, steps_per_epoch=1)
    state = trainer.init_state(0)
    path = trainer.save(state, str(tmp_path), epoch=1,
                        metrics={"loss_pred": 0.5, "acc": 0.9,
                                 "loss_img": 0.1})
    assert os.path.isdir(path)
    state2, next_epoch = trainer.restore(state, path)
    assert next_epoch == 2  # resume continues AFTER the saved epoch
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
