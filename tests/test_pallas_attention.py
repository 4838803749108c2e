"""Interpret-mode parity for the fused spatial-attention kernel."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from slice3d_tpu.ops.pallas_attention import (
    attention_kernel_eligible,
    spatial_attention,
)


def _reference(q, k, v, scale):
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v)


def test_spatial_attention_matches_einsum():
    b, h, t, dh = 2, 3, 1024, 24
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, dh)).astype(np.float32))
               for _ in range(3))
    scale = 1.0 / math.sqrt(dh)
    out = spatial_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_reference(q, k, v, scale)), atol=2e-6
    )


def test_spatial_attention_uneven_head_dim_and_block():
    b, h, t, dh = 1, 2, 1536, 48
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, dh)).astype(np.float32))
               for _ in range(3))
    out = spatial_attention(q, k, v, 0.25, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_reference(q, k, v, 0.25)), atol=2e-6
    )


def test_spatial_attention_grad_matches_einsum():
    # reverse-mode AD through the kernel (custom_vjp): LDM training
    # differentiates through AttentionBlock at t=4096 (ADVICE r2 high)
    b, h, t, dh = 1, 2, 1024, 24
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, dh)).astype(np.float32))
               for _ in range(3))
    scale = 1.0 / math.sqrt(dh)
    tgt = jnp.asarray(rng.normal(size=(b, h, t, dh)).astype(np.float32))

    def loss_kernel(q, k, v):
        return jnp.sum((spatial_attention(q, k, v, scale, interpret=True)
                        - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((_reference(q, k, v, scale) - tgt) ** 2)

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gk, gr in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=3e-4, rtol=1e-4)


def test_eligibility_gate():
    # short sequences stay on the XLA path; eligibility is shape-only
    assert not attention_kernel_eligible(256)
    assert not attention_kernel_eligible(1000)


def test_spatial_attention_grad_bf16_blockwise():
    # bf16 inputs + multi-block dk/dv accumulation (the LDM train dtype):
    # the blockwise Pallas VJP accumulates dk/dv in f32 across query
    # blocks and must track the f32 einsum VJP within bf16 tolerance
    b, h, t, dh = 1, 2, 1024, 48
    rng = np.random.default_rng(3)
    qf, kf, vf = (rng.normal(size=(b, h, t, dh)).astype(np.float32)
                  for _ in range(3))
    scale = 1.0 / math.sqrt(dh)
    tgt = jnp.asarray(rng.normal(size=(b, h, t, dh)).astype(np.float32))

    def loss_kernel(q, k, v):
        out = spatial_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                                v.astype(jnp.bfloat16), scale, interpret=True)
        return jnp.sum((out.astype(jnp.float32) - tgt) ** 2)

    def loss_ref(q, k, v):
        out = _reference(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                         v.astype(jnp.bfloat16), scale)
        return jnp.sum((out.astype(jnp.float32) - tgt) ** 2)

    args = tuple(jnp.asarray(a) for a in (qf, kf, vf))
    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for gk, gr in zip(g_kernel, g_ref):
        denom = np.max(np.abs(np.asarray(gr))) + 1e-9
        rel = np.max(np.abs(np.asarray(gk) - np.asarray(gr))) / denom
        assert rel < 0.05, rel
