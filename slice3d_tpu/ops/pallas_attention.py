"""Fused softmax-attention for the LDM UNet's spatial attention blocks.

The UNet attends over flattened feature maps (4096 tokens at ds=1 for the
4x64x64 atlas, reference gen_slices/ldm/modules/diffusionmodules/
openaimodel.py AttentionBlock).  Under XLA the (B*H, T, T) fp32 logits and
probs round-trip HBM (~13 GB per ds=1 block at bs=8) — the sampler is
bandwidth-bound there.  head_dim is tiny (24/48), so the stock TPU flash
kernel (which pads head_dim to 128) loses more than it gains.

This kernel needs no online softmax: one query block's full logits row
(BQ x T) fits VMEM comfortably (512 x 4096 fp32 = 8 MB), so each grid step
reads its query block plus the (revolving, per-batch-head) full K/V and
writes only the output block.  fp32 softmax, matching the XLA path's
numerics (models/ldm_unet.py AttentionBlock).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ffn import pallas_available

__all__ = ["spatial_attention", "attention_kernel_eligible"]


def _attn_kernel(scale: float, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (BQ, DH)
    k = k_ref[0]  # (T, DH)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, T) fp32
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def attention_kernel_eligible(t: int) -> bool:
    """Long sequences only — short ones are cheap under XLA anyway."""
    return pallas_available() and t >= 1024 and t % 512 == 0


def _attention_forward(q, k, v, scale: float, block_q: int, interpret: bool):
    b, h, t, dh = q.shape
    bh = b * h
    bq = min(block_q, t)
    qf = q.reshape(bh, t, dh)
    kf = k.reshape(bh, t, dh)
    vf = v.reshape(bh, t, dh)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale),
        grid=(bh, t // bq),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * dh,
            bytes_accessed=bh * t * dh * 2 * 4,
            transcendentals=bh * t * t,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, t, dh)


@functools.lru_cache(maxsize=None)
def _make_attention(scale: float, block_q: int, interpret: bool):
    """custom_vjp wrapper: Pallas forward, XLA-einsum backward.

    pallas_call has no reverse-mode rule, so without this LDM training
    (which differentiates through the UNet AttentionBlocks) would fail.
    The backward recomputes probs in fp32 — the same HBM traffic that
    differentiating the plain einsum path would have produced.
    """

    @jax.custom_vjp
    def attn(q, k, v):
        return _attention_forward(q, k, v, scale, block_q, interpret)

    def fwd(q, k, v):
        return attn(q, k, v), (q, k, v)

    def bwd(res, do):
        q, k, v = res
        # fp32 ACCUMULATION (not just an fp32 cast of bf16 products):
        # the forward kernel computes logits with
        # preferred_element_type=f32, so the recomputed probs here must
        # match or the VJP is inconsistent with the primal.
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits * scale, axis=-1)
        dv = jnp.einsum("bhts,bhtd->bhsd", p.astype(do.dtype), do)
        dp = jnp.einsum("bhtd,bhsd->bhts", do, v,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        ds = ds.astype(q.dtype)
        dq = jnp.einsum("bhts,bhsd->bhtd", ds, k)
        dk = jnp.einsum("bhts,bhtd->bhsd", ds, q)
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    attn.defvjp(fwd, bwd)
    return attn


def spatial_attention(q, k, v, scale: float, *, block_q: int = 512,
                      interpret: bool = False):
    """Softmax attention over (B, H, T, DH) tensors -> (B, H, T, DH).

    Equivalent to softmax(q k^T * scale) v with fp32 softmax.
    Differentiable: forward runs the fused Pallas kernel, reverse-mode AD
    uses a custom XLA einsum VJP.
    """
    return _make_attention(float(scale), int(block_q), bool(interpret))(q, k, v)
