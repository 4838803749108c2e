"""VAE finetune trainer smoke test (tiny config)."""

import pytest

import numpy as np

import jax

from slice3d_tpu.train.train_vae import VAEFinetuneTrainer


@pytest.mark.slow
def test_vae_finetune_step():
    trainer = VAEFinetuneTrainer(
        img_size=32, vae_ch=32, vae_mult=(1, 2), vae_nres=1,
        disc_start=0, lr=1e-4,
    )
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    batch = {"image": rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)}

    k0 = np.asarray(state.params["decoder"]["conv_out"]["kernel"]).copy()
    d0 = np.asarray(state.disc_params["conv0"]["kernel"]).copy()

    state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    for key in ("ae_loss", "rec_loss", "kl", "disc_loss", "d_weight"):
        assert np.isfinite(float(logs[key])), key
    assert float(logs["d_weight"]) >= 0

    k1 = np.asarray(state.params["decoder"]["conv_out"]["kernel"])
    d1 = np.asarray(state.disc_params["conv0"]["kernel"])
    assert np.abs(k1 - k0).max() > 0  # autoencoder updated
    assert np.abs(d1 - d0).max() > 0  # discriminator updated


@pytest.mark.slow
def test_vae_finetune_step_with_lpips():
    """LPIPS perceptual path: reference sum/B NLL scaling + LPIPS term."""
    from slice3d_tpu.models.lpips import LPIPS

    lp = LPIPS().init(jax.random.PRNGKey(0),
                      np.zeros((1, 32, 32, 3), np.float32),
                      np.zeros((1, 32, 32, 3), np.float32))["params"]
    trainer = VAEFinetuneTrainer(
        img_size=32, vae_ch=32, vae_mult=(1, 2), vae_nres=1,
        disc_start=0, lr=1e-4, lpips_params=lp,
    )
    state = trainer.init_state()
    rng = np.random.default_rng(1)
    batch = {"image": rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)}
    state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    for key in ("ae_loss", "rec_loss", "kl", "disc_loss", "d_weight"):
        assert np.isfinite(float(logs[key])), key
    # sum/B scaling: rec term is pixel-summed, so much larger than a mean
    assert float(logs["rec_loss"]) > 10.0
