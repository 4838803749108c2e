"""One-step training smoke tests for the regression trainers."""

import numpy as np
import pytest

import jax

from slice3d_tpu.config import Options
from slice3d_tpu.train.train_reg import RegressionTrainer, make_lr_schedule


def tiny_batch(rng, with_input=True):
    b, s, q = 2, 12, 16
    batch = {
        "img_slices": rng.normal(size=(b, s, 32, 32, 3)).astype(np.float32),
        "qry_norot": rng.uniform(-0.5, 0.5, (b, q, 3)).astype(np.float32),
        "sdf": rng.normal(size=(b, q)).astype(np.float32) * 0.1,
        "occ": (rng.random((b, q)) > 0.5).astype(np.float32),
        "obj_rot_mat": np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy(),
        "trans_mat_wo_rot_tp": np.broadcast_to(
            np.eye(4, 3, dtype=np.float32), (b, 4, 3)
        ).copy(),
    }
    if with_input:
        batch["img_input"] = rng.normal(size=(b, 32, 32, 3)).astype(np.float32)
    return batch


def test_lr_schedule_halves():
    sched = make_lr_schedule(3e-4, steps_per_epoch=10, freq_decay=100, decay=0.5)
    assert sched(0) == pytest.approx(3e-4)
    assert sched(999) == pytest.approx(3e-4)  # epoch 99
    assert sched(1000) == pytest.approx(1.5e-4)  # epoch 100
    assert sched(2000) == pytest.approx(0.75e-4)


@pytest.mark.slow
def test_gtslice_train_step_decreases_nothing_weird():
    opts = Options(name_model="gtslice", img_size=32, n_qry=16, n_bs=2)
    trainer = RegressionTrainer(opts, steps_per_epoch=10)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    batch = tiny_batch(rng, with_input=False)

    state, logs = trainer.train_step(state, batch)
    assert np.isfinite(float(logs["loss"]))
    assert 0.0 <= float(logs["acc"]) <= 1.0
    assert int(state.step) == 1
    # BN running stats must have moved (train_bn=True path)
    stats0 = trainer.init_state().batch_stats
    moved = np.abs(
        np.asarray(state.batch_stats["img_encoder"]["bn0"]["mean"])
        - np.asarray(stats0["img_encoder"]["bn0"]["mean"])
    ).max()
    assert moved > 0


@pytest.mark.nightly
def test_gtslice_checkpoint_roundtrip(tmp_path):
    opts = Options(name_model="gtslice", img_size=32, n_qry=16, n_bs=2)
    trainer = RegressionTrainer(opts, steps_per_epoch=10)
    state = trainer.init_state()
    batch = tiny_batch(np.random.default_rng(1), with_input=False)
    state, logs = trainer.train_step(state, batch)

    path = trainer.save(state, str(tmp_path), 0, {k: float(v) for k, v in logs.items()})
    restored, epoch = trainer.restore(trainer.init_state(), path)
    assert epoch == 1
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["fc_out"]["kernel"]),
        np.asarray(state.params["head"]["fc_out"]["kernel"]),
    )


def test_train_e2e_device_preprocess(tmp_path):
    """Two train() steps through the device-preprocess loader (raw uint8
    upload + on-device composite/resize/normalize)."""
    from slice3d_tpu.data.builders import create_synthetic_dataset
    from slice3d_tpu.train.train_reg import train

    root = create_synthetic_dataset(
        str(tmp_path / "data" / "objaverse"), n_shapes=2, n_views=6,
        img_size=32, n_sdf=64)
    opts = Options(
        name_model="gtslice", img_size=32, n_qry=16, n_bs=2, n_views=6,
        n_epochs=1, freq_log=1, freq_ckpt=1,
        dir_data=str(tmp_path / "data"), name_dataset="objaverse",
        dir_experiments=str(tmp_path / "exp"), name_exp="devpre",
        device_preprocess=True,
    )
    train(opts, max_steps=2)
    assert (tmp_path / "exp" / "devpre" / "opts.txt").exists()
    # reproducibility code snapshot (reference reg_slices/train.py:95-103)
    assert (tmp_path / "exp" / "devpre" / "code" / "slice3d_tpu"
            / "train" / "train_reg.py").exists()


def test_bf16_mixed_precision_step():
    """train_dtype=bfloat16 runs layer compute in bf16 but keeps fp32
    master params and an fp32 loss.  Trace-only (jax.eval_shape) so the
    wiring is covered without a second full train-step compile; real bf16
    execution is exercised by bench_all config 6."""
    opts = Options(name_model="gtslice", img_size=32, n_qry=16, n_bs=2,
                   train_dtype="bfloat16")
    trainer = RegressionTrainer(opts, steps_per_epoch=10)
    assert trainer.model.dtype == jax.numpy.bfloat16
    state = trainer.init_state()
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == np.float32  # fp32 master weights
    batch = tiny_batch(np.random.default_rng(2), with_input=False)
    new_state, logs = jax.eval_shape(trainer._step_impl, state, batch)
    assert logs["loss"].dtype == np.float32
    assert jax.tree_util.tree_leaves(new_state.params)[0].dtype == np.float32
