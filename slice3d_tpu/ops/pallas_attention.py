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


def _attn_bwd_kernel(scale: float, q_ref, k_ref, v_ref, do_ref,
                     dq_ref, dk_ref, dv_ref):
    """Blockwise attention VJP: one query block per step, dk/dv accumulate
    in the revolving per-batch-head output block across query steps.

    Nothing (T, T)-shaped ever reaches HBM — the recomputed probs block
    (BQ, T) lives only in VMEM.  This is what makes LDM training fit: the
    XLA einsum VJP materializes f32 (B, H, 4096, 4096) logits AND probs
    (4 GB each at bs=8), which blew the v5e's 16 GB HBM (round-4 config-7
    OOM record: 21.5 G requested).
    """
    j = pl.program_id(1)
    q = q_ref[0]    # (BQ, DH)
    k = k_ref[0]    # (T, DH)
    v = v_ref[0]
    do = do_ref[0]  # (BQ, DH)

    # recompute this block's probs in fp32 (matches the forward kernel's
    # preferred_element_type=f32 logits — the VJP must be consistent)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                   # (BQ, T) f32
    p = jax.nn.softmax(logits, axis=-1)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (BQ, T) f32
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    ds = ds.astype(q.dtype)

    dq_ref[0] = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    # dk/dv: contract over the query-block axis, accumulate across blocks
    dk_blk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (T, DH) f32
    dv_blk = jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = dk_blk
        dv_ref[0] = dv_blk

    @pl.when(j > 0)
    def _accum():
        dk_ref[0] += dk_blk
        dv_ref[0] += dv_blk


def _attention_backward(q, k, v, do, scale: float, block_q: int,
                        interpret: bool):
    b, h, t, dh = q.shape
    bh = b * h
    bq = min(block_q, t)
    qf = q.reshape(bh, t, dh)
    kf = k.reshape(bh, t, dh)
    vf = v.reshape(bh, t, dh)
    dof = do.reshape(bh, t, dh).astype(q.dtype)
    blk = lambda s, ix: pl.BlockSpec(s, ix, memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale),
        grid=(bh, t // bq),
        interpret=interpret,
        in_specs=[
            blk((1, bq, dh), lambda i, j: (i, j, 0)),   # q block
            blk((1, t, dh), lambda i, j: (i, 0, 0)),    # full K
            blk((1, t, dh), lambda i, j: (i, 0, 0)),    # full V
            blk((1, bq, dh), lambda i, j: (i, j, 0)),   # do block
        ],
        out_specs=(
            blk((1, bq, dh), lambda i, j: (i, j, 0)),   # dq
            blk((1, t, dh), lambda i, j: (i, 0, 0)),    # dk (accumulated)
            blk((1, t, dh), lambda i, j: (i, 0, 0)),    # dv (accumulated)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, t, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, t, dh), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * t * t * dh,
            bytes_accessed=bh * t * dh * 4 * 4,
            transcendentals=bh * t * t,
        ),
    )(qf, kf, vf, dof)
    return (dq.reshape(b, h, t, dh),
            dk.reshape(b, h, t, dh).astype(k.dtype),
            dv.reshape(b, h, t, dh).astype(v.dtype))


@functools.lru_cache(maxsize=None)
def _make_attention(scale: float, block_q: int, interpret: bool):
    """custom_vjp wrapper: Pallas forward AND blockwise Pallas backward.

    pallas_call has no reverse-mode rule, so without this LDM training
    (which differentiates through the UNet AttentionBlocks) would fail.
    The backward recomputes each query block's probs in VMEM — never
    materializing the (B, H, T, T) logits/probs that the plain einsum VJP
    would round-trip through HBM (4 GB apiece at bs=8/T=4096).
    """

    @jax.custom_vjp
    def attn(q, k, v):
        return _attention_forward(q, k, v, scale, block_q, interpret)

    def fwd(q, k, v):
        return attn(q, k, v), (q, k, v)

    def bwd(res, do):
        q, k, v = res
        # backward keeps p + dp + ds (BQ, T) f32 blocks live at once plus
        # the resident K/V and the f32 dk/dv accumulators, so it runs at a
        # quarter of the forward's query block: at T=4096 that is ~13 MB
        # scoped VMEM (BQ=256 measured 18.4 MB > the 16 MB/core limit)
        return _attention_backward(q, k, v, do, scale,
                                   max(block_q // 4, 128), interpret)

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
