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


def test_eligibility_gate():
    # short sequences stay on the XLA path; eligibility is shape-only
    assert not attention_kernel_eligible(256)
    assert not attention_kernel_eligible(1000)
