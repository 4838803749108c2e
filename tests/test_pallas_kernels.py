"""Pallas kernel correctness in interpret mode (CPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_fused_encoder_layer_matches_reference(monkeypatch):
    monkeypatch.setenv("SLICE3D_PALLAS_INTERPRET", "1")

    from slice3d_tpu.models.layers import TransformerEncoder
    from slice3d_tpu.ops.pallas_encoder import fused_encoder_layer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 256, 13, 128)).astype(np.float32))

    ref_mod = TransformerEncoder(num_layers=1, final_head_tokens=1, fused_ffn=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), x)
    ref = ref_mod.apply(variables, x)

    params = variables["params"]["layer0"]
    fast = fused_encoder_layer(x, params, n_heads=4, head_tokens=1)

    assert fast.shape == (1, 256, 1, 128)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_encoder_layer_full_tokens(monkeypatch):
    monkeypatch.setenv("SLICE3D_PALLAS_INTERPRET", "1")

    from slice3d_tpu.models.layers import TransformerEncoder
    from slice3d_tpu.ops.pallas_encoder import fused_encoder_layer

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 300, 13, 64)).astype(np.float32))  # pads to BLK

    ref_mod = TransformerEncoder(num_layers=1, d_model=64, n_heads=4, fused_ffn=False)
    variables = ref_mod.init(jax.random.PRNGKey(1), x)
    ref = ref_mod.apply(variables, x)

    fast = fused_encoder_layer(x, variables["params"]["layer0"], n_heads=4)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_ffn_matches_jnp():
    from slice3d_tpu.ops.pallas_ffn import fused_ffn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(100, 32)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    out = fused_ffn(x, w1, b1, w2, b2)  # CPU -> jnp fallback
    expect = np.maximum(np.asarray(x) @ np.asarray(w1) + np.asarray(b1), 0) @ np.asarray(w2) + np.asarray(b2)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4, rtol=1e-4)
