"""VAE finetune trainer smoke test (tiny config)."""

import pytest

import numpy as np

import jax

from slice3d_tpu.train.train_vae import VAEFinetuneTrainer


def test_patchgan_logits_size():
    """PatchGAN output-size math + the auto-shrink that prevents the
    empty-logits NaN (mean of a zero-size array) on small test images."""
    from slice3d_tpu.models.discriminator import (
        NLayerDiscriminator, patchgan_logits_size)

    # torch PatchGAN at the reference 128^2 point emits 14^2 logits
    assert patchgan_logits_size(128, 3) == 14
    # 16^2 collapses to an EMPTY tensor at the standard depth
    assert patchgan_logits_size(16, 3) == 0
    assert patchgan_logits_size(16, 2) == 2

    # the formula matches the actual module output shape
    for size, n in [(128, 3), (32, 3), (16, 2)]:
        disc = NLayerDiscriminator(n_layers=n)
        v = disc.init(jax.random.PRNGKey(0),
                      np.zeros((1, size, size, 3), np.float32))
        out = disc.apply(v, np.zeros((1, size, size, 3), np.float32))
        expect = patchgan_logits_size(size, n)
        assert out.shape[1:3] == (expect, expect)

    # trainer auto-derivation keeps logits non-empty at any image size
    assert VAEFinetuneTrainer(img_size=16, vae_ch=32, vae_mult=(1, 2),
                              vae_nres=1).disc.n_layers == 2
    assert VAEFinetuneTrainer(img_size=128, vae_ch=32, vae_mult=(1, 2),
                              vae_nres=1).disc.n_layers == 3
    with pytest.raises(ValueError):
        VAEFinetuneTrainer(img_size=4, vae_ch=32, vae_mult=(1, 2),
                           vae_nres=1)


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


@pytest.mark.nightly
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
