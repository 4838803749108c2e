"""LDM stack smoke tests on a tiny configuration (fast on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slice3d_tpu.diffusion.latent import LatentDiffusion
from slice3d_tpu.train.train_ldm import LDMTrainer


IMG = 16


def tiny_module():
    return LatentDiffusion(
        timesteps=20,
        vae_ch=32, vae_mult=(1, 2), vae_nres=1,
        unet_channels=32, unet_mult=(1, 2), unet_nres=1,
        unet_attention_ds=(2,),
        unet_inject_blocks=(0, 3),
        cond_widths=(32, 64),
        latent_size=IMG // 2,
    )


@pytest.fixture(scope="module")
def trainer():
    return LDMTrainer(img_size=IMG, batch_size=2, timesteps=20, module=tiny_module())


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return {
        "image": rng.normal(size=(2, 13, IMG, IMG, 3)).astype(np.float32).clip(-1, 1),
        "img_ipt_view": rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32).clip(-1, 1),
    }


@pytest.mark.slow
def test_train_step_updates_only_trainable(trainer, batch):
    state = trainer.init_state()
    state = trainer.maybe_set_scale(state, batch)
    assert float(state.scale_factor) != 1.0

    # copy everything we compare BEFORE the step: the train step donates
    # its input state, so those buffers are gone afterwards
    before_vae = np.asarray(jax.tree_util.tree_leaves(state.params["first_stage"])[0]).copy()
    before_unet = np.asarray(state.params["model"]["input_0_0"]["kernel"]).copy()
    ema0 = np.asarray(state.ema_params["model"]["input_0_0"]["kernel"]).copy()

    state2, logs = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))
    assert int(state2.step) == 1

    after_vae = jax.tree_util.tree_leaves(state2.params["first_stage"])[0]
    np.testing.assert_array_equal(np.asarray(after_vae), np.asarray(before_vae))
    after_unet = np.asarray(state2.params["model"]["input_0_0"]["kernel"])
    assert np.abs(after_unet - before_unet).max() > 0

    # EMA drifted toward new params but isn't equal to old
    ema1 = np.asarray(state2.ema_params["model"]["input_0_0"]["kernel"])
    assert np.abs(ema1 - ema0).max() > 0


@pytest.mark.slow
def test_sample_and_reconstruct_shapes(trainer, batch):
    state = trainer.init_state()
    gen = trainer.sample_slices(state, batch, ddim_steps=4, eta=1.0)
    assert gen.shape == (2, 12, IMG, IMG, 3)
    assert np.isfinite(gen).all()

    rec = trainer.reconstruct_slices(state, batch)
    assert rec.shape == (2, 12, IMG, IMG, 3)
    assert np.isfinite(rec).all()


@pytest.mark.slow
def test_ancestral_progressive_and_cfg(trainer, batch):
    """Ancestral p_sample_loop, progressive denoise rows, forward-diffusion
    rows, and CFG sampling all run end-to-end on the tiny module."""
    state = trainer.init_state()
    gen = trainer.sample_slices(state, batch, sampler="ancestral")
    assert gen.shape == (2, 12, IMG, IMG, 3)
    assert np.isfinite(gen).all()

    final, prog = trainer.sample_progressive(state, batch, log_every_t=8)
    assert final.shape == (2, 12, IMG, IMG, 3)
    # timesteps=20, log at t%8==0 or t==19 -> t in {19, 16, 8, 0} = 4 rows
    assert prog.shape == (4, 2, 12, IMG, IMG, 3)
    assert np.isfinite(prog).all()

    diff = trainer.diffusion_row(state, batch, log_every_t=8)
    assert diff.shape == (4, 2, 12, IMG, IMG, 3)

    # CFG needs non-zero eps to matter: the UNet's out conv is zero-init
    # (reference zero_module), so perturb with one train step first
    state = trainer.maybe_set_scale(state, batch)
    state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    cfg = trainer.sample_slices(state, batch, ddim_steps=4, eta=0.0,
                                guidance_scale=3.0, use_ema=False)
    base = trainer.sample_slices(state, batch, ddim_steps=4, eta=0.0,
                                 use_ema=False)
    assert cfg.shape == base.shape
    assert np.isfinite(cfg).all()
    assert np.abs(cfg - base).max() > 1e-6  # guidance changed the output


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, trainer, batch):
    state = trainer.init_state()
    state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    path = str(tmp_path / "ldm.ckpt")
    trainer.save(state, path)
    restored = trainer.restore(trainer.init_state(), path)
    np.testing.assert_array_equal(
        np.asarray(restored.params["model"]["input_0_0"]["kernel"]),
        np.asarray(state.params["model"]["input_0_0"]["kernel"]),
    )
    assert int(restored.step) == int(state.step)


@pytest.mark.slow
def test_learn_logvar_and_scheduler_and_bn():
    """learn_logvar trains logvar, scheduler drives the lr, cond-stage BN
    batch stats update during training (reference ddpm.py:562-565,604-623,
    1420-1442)."""
    sched = {
        "target": "ldm.lr_scheduler.LambdaLinearScheduler",
        "params": {"warm_up_steps": [2], "f_min": [1.0], "f_max": [1.0],
                   "f_start": [1e-6], "cycle_lengths": [1000]},
    }
    tr = LDMTrainer(
        img_size=IMG, batch_size=2, timesteps=20, module=tiny_module(),
        scheduler_config=sched, learn_logvar=True, scale_by_std=False,
    )
    rng = np.random.default_rng(1)
    b = {
        "image": rng.normal(size=(2, 13, IMG, IMG, 3)).astype(np.float32).clip(-1, 1),
        "img_ipt_view": rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32).clip(-1, 1),
    }
    state = tr.init_state()
    lv0 = np.asarray(state.logvar).copy()
    bn0 = np.asarray(
        jax.tree_util.tree_leaves(state.batch_stats)[0]).copy()
    state, _ = tr.train_step(state, b, jax.random.PRNGKey(0))
    state, _ = tr.train_step(state, b, jax.random.PRNGKey(1))
    assert np.abs(np.asarray(state.logvar) - lv0).max() > 0
    bn1 = np.asarray(jax.tree_util.tree_leaves(state.batch_stats)[0])
    assert np.abs(bn1 - bn0).max() > 0
    # warmup: effective lr at step 0 is ~0, grows by step 2
    assert tr.current_lr(0) < tr.current_lr(2) * 1e-3
    assert abs(tr.current_lr(2) - tr.lr) < 1e-9


@pytest.mark.slow
def test_gradient_accumulation(batch):
    """accumulate=2: micro-step 1 only accumulates (params and EMA hold),
    micro-step 2 applies the averaged update (Lightning
    accumulate_grad_batches semantics, reference main.py:692-696)."""
    tr = LDMTrainer(img_size=IMG, batch_size=2, timesteps=20,
                    module=tiny_module(), scale_by_std=False, accumulate=2)
    state = tr.init_state()
    p0 = np.asarray(state.params["model"]["input_0_0"]["kernel"]).copy()
    ema0 = np.asarray(state.ema_params["model"]["input_0_0"]["kernel"]).copy()

    state, _ = tr.train_step(state, batch, jax.random.PRNGKey(0))
    p1 = np.asarray(state.params["model"]["input_0_0"]["kernel"])
    ema1 = np.asarray(state.ema_params["model"]["input_0_0"]["kernel"])
    np.testing.assert_array_equal(p1, p0)   # accumulated, not applied
    np.testing.assert_array_equal(ema1, ema0)

    state, _ = tr.train_step(state, batch, jax.random.PRNGKey(1))
    p2 = np.asarray(state.params["model"]["input_0_0"]["kernel"])
    ema2 = np.asarray(state.ema_params["model"]["input_0_0"]["kernel"])
    assert np.abs(p2 - p0).max() > 0        # applied on the k-th micro-step
    assert np.abs(ema2 - ema0).max() > 0
    assert int(state.step) == 2


def test_topk_checkpointer(tmp_path):
    from slice3d_tpu.train.checkpoint import TopKCheckpointer

    ck = TopKCheckpointer(str(tmp_path), monitor="val/loss_simple_ema", k=2)
    assert ck.update(1.0, 1, {"step": 1}) is not None
    assert ck.update(2.0, 2, {"step": 2}) is not None
    assert ck.update(3.0, 3, {"step": 3}) is None  # worse than the k kept
    p = ck.update(0.5, 4, {"step": 4})
    assert p is not None and "0.50000" in p
    import os

    kept = sorted(os.listdir(tmp_path))
    assert len(kept) == 2
    assert any("step=000004" in k for k in kept)
    assert any("step=000001" in k for k in kept)


def test_topk_checkpointer_seeds_from_disk(tmp_path):
    """A fresh process seeds its best-list from existing checkpoint files,
    so resumed runs keep pruning past save_top_k (ADVICE r2)."""
    from slice3d_tpu.train.checkpoint import TopKCheckpointer

    ck = TopKCheckpointer(str(tmp_path), monitor="val/loss_simple_ema", k=2)
    ck.update(1.0, 1, {"step": 1})
    ck.update(2.0, 2, {"step": 2})

    # simulate restart
    ck2 = TopKCheckpointer(str(tmp_path), monitor="val/loss_simple_ema", k=2)
    assert len(ck2.best) == 2
    assert ck2.update(3.0, 3, {"step": 3}) is None  # still pruned vs disk
    assert ck2.update(0.5, 4, {"step": 4}) is not None
    import os

    kept = sorted(os.listdir(tmp_path))
    assert len(kept) == 2
