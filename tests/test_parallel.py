"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from slice3d_tpu.parallel import (
    batch_sharding,
    create_mesh,
    shard_params_fsdp,
    put_batch,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = create_mesh((2, 4))
    assert mesh2.shape == {"data": 2, "model": 4}


def test_fsdp_sharding_rules():
    mesh = create_mesh((2, 4))
    params = {
        "big": np.zeros((128, 512), np.float32),
        "small": np.zeros((4,), np.float32),
        "odd": np.zeros((333, 7), np.float32),
    }
    sharded, specs = shard_params_fsdp(params, mesh, min_size=1024)
    assert specs["big"].spec == P(None, "model")
    assert specs["small"].spec == P()
    # 333 and 7 are both indivisible by 4 -> replicated
    assert specs["odd"].spec == P()
    np.testing.assert_array_equal(np.asarray(sharded["big"]), params["big"])


def test_sharded_batch_matmul_matches_single_device():
    mesh = create_mesh((8, 1))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 32)).astype(np.float32)
    w = rng.normal(size=(32, 8)).astype(np.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(lambda a, b: a @ b)(xs, w)
    np.testing.assert_allclose(np.asarray(out), x @ w, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    # The driver calls this with virtual CPU devices; run it in-process.
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def _tiny_reg_batch(n_bs, rng):
    return {
        "img_input": rng.normal(size=(n_bs, 32, 32, 3)).astype(np.float32),
        "img_slices": rng.normal(size=(n_bs, 12, 32, 32, 3)).astype(np.float32),
        "qry_norot": rng.uniform(-0.5, 0.5, (n_bs, 16, 3)).astype(np.float32),
        "sdf": rng.normal(size=(n_bs, 16)).astype(np.float32),
        "occ": (rng.random((n_bs, 16)) > 0.5).astype(np.float32),
        "obj_rot_mat": np.broadcast_to(
            np.eye(3, dtype=np.float32), (n_bs, 3, 3)).copy(),
        "trans_mat_wo_rot_tp": np.broadcast_to(
            np.eye(4, 3, dtype=np.float32), (n_bs, 4, 3)).copy(),
    }


@pytest.mark.slow
def test_sharded_loss_equals_single_device():
    """FSDP+dp sharded train step == single-device step to fp32 tolerance."""
    from slice3d_tpu.config import Options
    from slice3d_tpu.train.train_reg import RegressionTrainer

    opts = Options(name_model="slicenet", img_size=32, n_qry=16, n_bs=4,
                   dtype="float32")
    trainer = RegressionTrainer(opts, steps_per_epoch=10)
    state = trainer.init_state(seed=3)
    batch = _tiny_reg_batch(4, np.random.default_rng(7))

    # single device: everything on device 0
    d0 = jax.devices()[0]
    state_1 = jax.device_put(state, d0)
    batch_1 = jax.device_put(batch, d0)
    state_1, logs_1 = trainer._train_step(state_1, batch_1)

    # sharded: batch over 'data', params + opt moments over 'model'
    mesh = create_mesh((2, 4))
    state_n = trainer.init_state(seed=3)
    params, _ = shard_params_fsdp(state_n.params, mesh, min_size=2 ** 10)
    opt_state, _ = shard_params_fsdp(state_n.opt_state, mesh, min_size=2 ** 10)
    stats = jax.device_put(state_n.batch_stats, NamedSharding(mesh, P()))
    state_n = state_n.replace(params=params, batch_stats=stats,
                              opt_state=opt_state)
    batch_n = put_batch(batch, mesh)
    with mesh:
        state_n, logs_n = trainer._train_step(state_n, batch_n)

    for k in logs_1:
        np.testing.assert_allclose(
            float(logs_n[k]), float(logs_1[k]), rtol=2e-5, atol=2e-6,
            err_msg=f"metric {k} diverges between shardings")
    # updated params agree too (check one representative kernel).  Adam's
    # m/(sqrt(v)+eps) normalization amplifies reduction-order noise for
    # near-zero grads, so the tolerance is looser than for the losses.
    p1 = np.asarray(state_1.params["head"]["fc_s"]["kernel"])
    pn = np.asarray(state_n.params["head"]["fc_s"]["kernel"])
    np.testing.assert_allclose(pn, p1, atol=2e-3)


@pytest.mark.slow
def test_ldm_sharded_loss_equals_single_device():
    """LDM train step: sharded vs single-device loss equality."""
    from slice3d_tpu.diffusion.latent import LatentDiffusion
    from slice3d_tpu.train.train_ldm import LDMTrainer

    def make(mesh=None):
        module = LatentDiffusion(
            timesteps=20, vae_ch=32, vae_mult=(1, 2), vae_nres=1,
            unet_channels=32, unet_mult=(1, 2), unet_nres=1,
            unet_attention_ds=(2,), unet_inject_blocks=(0, 3),
            cond_widths=(32, 64), latent_size=8,
        )
        return LDMTrainer(img_size=16, batch_size=2, timesteps=20,
                          module=module, scale_by_std=False, mesh=mesh)

    rng = np.random.default_rng(5)
    batch = {
        "image": rng.normal(size=(2, 13, 16, 16, 3)).astype(np.float32),
        "img_ipt_view": rng.normal(size=(2, 16, 16, 3)).astype(np.float32),
    }
    key = jax.random.PRNGKey(1)

    d0 = jax.devices()[0]
    tr1 = make(mesh=create_mesh((1, 1), devices=[d0]))
    s1 = jax.device_put(tr1.init_state(seed=2), d0)
    _, logs_1 = tr1.train_step(s1, batch, key)

    mesh = create_mesh((2, 4))
    trn = make(mesh=mesh)
    sn = trn.init_state(seed=2)
    params, _ = shard_params_fsdp(sn.params, mesh, min_size=2 ** 10)
    opt_state, _ = shard_params_fsdp(sn.opt_state, mesh, min_size=2 ** 10)
    sn = sn.replace(params=params, opt_state=opt_state)
    with mesh:
        _, logs_n = trn.train_step(sn, batch, key)

    for k in ("loss", "loss_simple"):
        np.testing.assert_allclose(
            float(logs_n[k]), float(logs_1[k]), rtol=2e-5, atol=2e-6,
            err_msg=f"metric {k} diverges between shardings")


def test_reconstruction_mesh_policy(capsys):
    """Mesh-selection policy shared by reconstruct.py and serve.py."""
    from slice3d_tpu.parallel import reconstruction_mesh

    # single device: never a mesh
    assert reconstruction_mesh("points", 1, 32768, 1) is None
    # points mode: chunk divisibility decides; warns when ignored
    m = reconstruction_mesh("points", 1, 32768, 8)
    assert m is not None and m.shape["data"] == 8
    assert reconstruction_mesh("points", 1, 32769, 8) is None
    assert "points ignored" in capsys.readouterr().out
    # batch mode: batch>1 and divisible
    assert reconstruction_mesh("batch", 8, 32768, 8).shape["data"] == 8
    assert reconstruction_mesh("batch", 1, 32768, 8) is None
    assert reconstruction_mesh("batch", 6, 32768, 8) is None
