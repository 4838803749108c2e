"""Parity of the post-LN transformer encoder vs torch defaults."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from slice3d_tpu.models.layers import TransformerEncoder  # noqa: E402
from slice3d_tpu.convert import torch_import  # noqa: E402


def test_transformer_encoder_parity():
    torch.manual_seed(3)
    d, heads, layers = 128, 4, 3
    enc_layer = tnn.TransformerEncoderLayer(d_model=d, nhead=heads, batch_first=True)
    t_enc = tnn.TransformerEncoder(enc_layer, num_layers=layers).eval()

    rng = np.random.default_rng(5)
    x = rng.normal(size=(6, 13, d)).astype(np.float32)
    with torch.no_grad():
        t_out = t_enc(torch.from_numpy(x)).numpy()

    params = torch_import.transformer_encoder(t_enc.state_dict(), "", num_layers=layers)
    ours = TransformerEncoder(num_layers=layers, d_model=d, n_heads=heads).apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=2e-5, rtol=1e-4)


def test_transformer_encoder_batch_dims():
    # Head must accept leading (B, M) batch dims around the token axis.
    params_model = TransformerEncoder(num_layers=1, d_model=32, n_heads=4)
    import jax

    x = jnp.ones((2, 5, 13, 32))
    variables = params_model.init(jax.random.PRNGKey(0), x)
    out = params_model.apply(variables, x)
    assert out.shape == x.shape
