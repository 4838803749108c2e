"""LDM UNet numeric parity vs a torch ADM twin via checkpoint conversion."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_refs import TADMUNet  # noqa: E402
from slice3d_tpu.models.ldm_unet import LDMUNet, timestep_embedding  # noqa: E402
from slice3d_tpu.convert import torch_import  # noqa: E402


def test_timestep_embedding_matches_torch():
    from torch_refs import t_timestep_embedding

    t = np.array([0, 1, 57, 999], np.int32)
    ours = np.asarray(timestep_embedding(jnp.asarray(t), 32))
    theirs = t_timestep_embedding(torch.from_numpy(t), 32).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_ldm_unet_parity_tiny():
    torch.manual_seed(7)
    cfg = dict(in_ch=8, out_ch=4, mc=32, mult=(1, 2), nres=1, attn_ds=(1, 2), n_heads=4)
    tw = TADMUNet(**cfg).eval()

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    t = np.array([3, 512], np.int32)

    with torch.no_grad():
        t_out = tw(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(t)).permute(0, 2, 3, 1).numpy()

    variables = torch_import.ldm_unet(
        tw.state_dict(), "", model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, attention_ds=(1, 2),
    )
    model = LDMUNet(
        in_channels=8, out_channels=4, model_channels=32,
        channel_mult=(1, 2), num_res_blocks=1, attention_ds=(1, 2),
        n_heads=4, fmap_inject_blocks=(),
    )
    ours = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(t), None))
    np.testing.assert_allclose(ours, t_out, atol=5e-4, rtol=1e-3)
