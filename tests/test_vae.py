"""kl-f8 VAE parity vs a torch twin (small config) + API smoke tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_refs import TVAE  # noqa: E402
from slice3d_tpu.models.vae import AutoencoderKL, DiagonalGaussian  # noqa: E402
from slice3d_tpu.convert import torch_import  # noqa: E402


CH, MULT, NRES, Z = 32, (1, 2), 1, 4


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(5)
    tvae = TVAE(CH, MULT, NRES, Z).eval()
    variables = torch_import.autoencoder_kl(
        tvae.state_dict(), "", ch=CH, ch_mult=MULT, num_res_blocks=NRES
    )
    ours = AutoencoderKL(embed_dim=Z, ch=CH, ch_mult=MULT, num_res_blocks=NRES)
    return tvae, ours, variables


def test_encoder_parity(pair):
    tvae, ours, variables = pair
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        t_moments = tvae.quant_conv(tvae.encoder(torch.from_numpy(x).permute(0, 3, 1, 2)))
    moments = ours.apply(variables, jnp.asarray(x), method=AutoencoderKL.encode_moments)
    np.testing.assert_allclose(
        np.asarray(moments), t_moments.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )


def test_decoder_parity(pair):
    tvae, ours, variables = pair
    rng = np.random.default_rng(2)
    z = rng.normal(size=(2, 8, 8, Z)).astype(np.float32)
    with torch.no_grad():
        t_img = tvae.decoder(tvae.post_quant_conv(torch.from_numpy(z).permute(0, 3, 1, 2)))
    img = ours.apply(variables, jnp.asarray(z), method=AutoencoderKL.decode)
    np.testing.assert_allclose(
        np.asarray(img), t_img.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )


def test_gaussian_sample_and_kl():
    rng = np.random.default_rng(3)
    moments = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    g = DiagonalGaussian(moments)
    s = g.sample(jax.random.PRNGKey(0))
    assert s.shape == (2, 4, 4, 4)
    assert np.asarray(g.kl()).shape == (2,)
    np.testing.assert_array_equal(np.asarray(g.mode()), np.asarray(moments[..., :4]))
