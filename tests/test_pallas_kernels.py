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


@pytest.mark.parametrize("head_tokens", [0, 1])
def test_grouped_encoder_layer_matches_reference(monkeypatch, head_tokens):
    """The grouped block-diagonal attention kernel is numerically the same
    layer as the default per-head kernel (vs the unfused reference)."""
    monkeypatch.setenv("SLICE3D_PALLAS_INTERPRET", "1")

    from slice3d_tpu.models.layers import TransformerEncoder
    from slice3d_tpu.ops.pallas_encoder import fused_encoder_layer

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 300, 13, 128)).astype(np.float32))

    ref_mod = TransformerEncoder(num_layers=1, final_head_tokens=head_tokens,
                                 fused_ffn=False)
    variables = ref_mod.init(jax.random.PRNGKey(3), x)
    ref = ref_mod.apply(variables, x)

    params = variables["params"]["layer0"]
    fast = fused_encoder_layer(x, params, n_heads=4, head_tokens=head_tokens,
                               grouped=True)
    assert fast.shape == np.asarray(ref).shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_grouped_encoder_layer_bf16(monkeypatch):
    monkeypatch.setenv("SLICE3D_PALLAS_INTERPRET", "1")

    from slice3d_tpu.ops.pallas_encoder import fused_encoder_layer

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 256, 13, 128)) * 0.5).astype(jnp.bfloat16)

    def g(k, shape, s):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)

    d, f = 128, 2048
    params = {
        "qkv": {"kernel": g(0, (d, 3 * d), 0.05), "bias": g(0, (3 * d,), 0.02)},
        "out_proj": {"kernel": g(0, (d, d), 0.05), "bias": g(0, (d,), 0.02)},
        "ff1": {"kernel": g(0, (d, f), 0.05), "bias": g(0, (f,), 0.02)},
        "ff2": {"kernel": g(0, (f, d), 0.05), "bias": g(0, (d,), 0.02)},
        "norm1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "norm2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    base = fused_encoder_layer(x, params, n_heads=4, head_tokens=1)
    grp = fused_encoder_layer(x, params, n_heads=4, head_tokens=1, grouped=True)
    err = np.max(np.abs(np.asarray(base, np.float32) - np.asarray(grp, np.float32)))
    assert err < 2e-2, err  # bf16 rounding with different matmul grouping


@pytest.mark.parametrize("variant", ["perhead", "v2", "bdq"])
@pytest.mark.parametrize("head_tokens", [0, 1])
def test_encoder_kernel_variants_match_reference(monkeypatch, variant,
                                                 head_tokens):
    """Every selectable production kernel variant is the same layer."""
    monkeypatch.setenv("SLICE3D_PALLAS_INTERPRET", "1")

    from slice3d_tpu.models.layers import TransformerEncoder
    from slice3d_tpu.ops.pallas_encoder import fused_encoder_layer

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 300, 13, 128)).astype(np.float32))

    ref_mod = TransformerEncoder(num_layers=1, final_head_tokens=head_tokens,
                                 fused_ffn=False)
    variables = ref_mod.init(jax.random.PRNGKey(5), x)
    ref = ref_mod.apply(variables, x)

    params = variables["params"]["layer0"]
    fast = fused_encoder_layer(x, params, n_heads=4, head_tokens=head_tokens,
                               kernel_variant=variant)
    assert fast.shape == np.asarray(ref).shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


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


@pytest.mark.parametrize("head_tokens", [0, 1])
def test_bdq_ffn_trim_matches_reference(monkeypatch, head_tokens):
    """SLICE3D_FFN_TRIM=1: layer-1/2 FFN on real tokens only — the READ
    tokens (all callers consume token 0 / the first t_real rows) are
    bit-identical to the untrimmed kernel; pad-token rows are dead."""
    monkeypatch.setenv("SLICE3D_PALLAS_INTERPRET", "1")

    from slice3d_tpu.models.layers import TransformerEncoder
    from slice3d_tpu.ops.pallas_encoder import fused_encoder_layer

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 300, 13, 128)).astype(np.float32))

    ref_mod = TransformerEncoder(num_layers=1, final_head_tokens=head_tokens,
                                 fused_ffn=False)
    variables = ref_mod.init(jax.random.PRNGKey(7), x)
    ref = np.asarray(ref_mod.apply(variables, x))

    params = variables["params"]["layer0"]
    monkeypatch.setenv("SLICE3D_FFN_TRIM", "1")
    fast = np.asarray(fused_encoder_layer(x, params, n_heads=4,
                                          head_tokens=head_tokens,
                                          kernel_variant="bdq"))
    t_real = 13
    np.testing.assert_allclose(fast[:, :, :min(t_real, fast.shape[2])],
                               ref[:, :, :min(t_real, ref.shape[2])],
                               atol=5e-5, rtol=1e-4)
