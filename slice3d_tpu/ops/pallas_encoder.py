"""Fully-fused post-LN transformer encoder layer (Pallas, TPU, inference).

The SDF head runs 3 post-LN layers over (M, 13, 128) tokens with M up to
65k points per chunk.  Under XLA each layer materializes ~10 HBM-sized
intermediates (qkv, attention probs, out_proj, two LayerNorms, the 2048-wide
FFN) — the head is bandwidth/overhead bound at ~43 ms/layer/chunk.  This
kernel keeps EVERYTHING for a block of points resident in VMEM: one read of
(BLK, T, 128) in, one write out; attention over the tiny 13-token axis and
the FFN expansion never touch HBM.

Mosaic-friendly construction: all tensors stay 3-D (block, token, feature),
biases are rank-matched 3-D, per-head projections use weight slabs indexed
on the LEADING axis, the token axis is padded to the sublane tile (16) with
padded keys masked out of the softmax, and every dot_general has at most
one batch dimension.

Semantics match models.layers.TransformerEncoderLayer (fp32 softmax and
fp32 matmul accumulation, LayerNorm eps 1e-5), including the
``head_tokens`` trim for the final layer.  Inference-only.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_encoder_layer"]


def _block_points(dtype) -> int:
    """Points per block, sized so the in-VMEM FFN expansion (+ fp32
    attention intermediates and double-buffered IO) stays under ~16 MB."""
    return 128 if dtype == jnp.bfloat16 else 32


def _layer_kernel(n_heads: int, head_tokens: int, t_real: int,
                  x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                  wo_ref, bo_ref, g1_ref, beta1_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, beta2_ref,
                  o_ref):
    blk, t, d = x_ref.shape
    dh = wq_ref.shape[-1]
    t_out = head_tokens if head_tokens else t
    x = x_ref[:]  # (BLK, T, D)

    scale = 1.0 / math.sqrt(dh)
    bd_last = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if t != t_real:
        key_pad = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2) >= t_real
        ).astype(jnp.float32) * (-1e9)

    attn = None
    for h in range(n_heads):
        q_h = (bd_last(x, wq_ref[h]) + bq_ref[h]).astype(x.dtype)  # (BLK,T,Dh)
        k_h = (bd_last(x, wk_ref[h]) + bk_ref[h]).astype(x.dtype)
        v_h = (bd_last(x, wv_ref[h]) + bv_ref[h]).astype(x.dtype)
        if head_tokens:
            q_h = q_h[:, :head_tokens]
        logits = jax.lax.dot_general(
            q_h, k_h, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLK, T_out, T)
        if t != t_real:
            logits = logits + key_pad
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o_h = jax.lax.dot_general(
            probs, v_h, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (BLK, T_out, Dh)
        # fold out_proj per head: sum_h o_h @ Wo[h]
        contrib = bd_last(o_h, wo_ref[h])  # (BLK, T_out, D) fp32
        attn = contrib if attn is None else attn + contrib
    attn = attn + bo_ref[:]

    x_res = x[:, :head_tokens] if head_tokens else x

    def layer_norm(v, g_ref, b_ref):
        v = v.astype(jnp.float32)
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return ((v - mu) * jax.lax.rsqrt(var + 1e-5)) * g_ref[:] + b_ref[:]

    h1 = layer_norm(x_res.astype(jnp.float32) + attn, g1_ref, beta1_ref).astype(x.dtype)

    ff = bd_last(h1, w1_ref[:])
    ff = jnp.maximum(ff + b1_ref[:], 0.0).astype(x.dtype)
    ff = bd_last(ff, w2_ref[:]) + b2_ref[:]

    out = layer_norm(h1.astype(jnp.float32) + ff, g2_ref, beta2_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def _layer_kernel_grouped(n_heads: int, head_tokens: int, t_real: int,
                          group: int,
                          x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                          g1_ref, beta1_ref,
                          w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, beta2_ref,
                          o_ref):
    """Grouped block-diagonal attention variant of `_layer_kernel`.

    The default kernel issues, per head, a `blk`-way batched
    (T,Dh)@(Dh,T) dot_general — Mosaic lowers that to `blk` serialized
    tiny MXU matmuls, which dominates the layer at T=16/Dh=32.  Here
    `group` points share ONE (group*T, Dh)@(Dh, group*T) logits matmul;
    an additive mask sends cross-point and padded-key logits to -1e9, so
    softmax zeroes them and the probs@values matmul is block-diagonal for
    free.  qkv and out-proj run as single full-lane matmuls.
    """
    blk, t, d = x_ref.shape
    dh = d // n_heads
    t_out = head_tokens if head_tokens else t
    n_g = blk // group
    x = x_ref[:]

    scale = 1.0 / math.sqrt(dh)
    bd_last = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bdot = lambda a, b, tr: jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (2 if tr else 1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    qkv = (bd_last(x, wqkv_ref[:]) + bqkv_ref[:]).astype(x.dtype)  # (BLK,T,3D)

    # additive mask over the packed group: row r belongs to point
    # r // t, col c to point c // t with key token c % t.  Queries run
    # over ALL t tokens even when head_tokens trims the output — the
    # (n_g, g*t, Dh) -> (blk, t, Dh) reshape is a supported sublane
    # regroup, while the trimmed (n_g, g*t_out, Dh) -> (blk, t_out, Dh)
    # form with t_out=1 is a shape cast Mosaic rejects; token trimming
    # happens after the reshape as a plain slice
    row_pt = jax.lax.broadcasted_iota(
        jnp.int32, (1, group * t, group * t), 1) // t
    col = jax.lax.broadcasted_iota(
        jnp.int32, (1, group * t, group * t), 2)
    mask = jnp.where((row_pt == col // t) & (col % t < t_real),
                     0.0, -1e9).astype(jnp.float32)

    o_cat = None
    for h in range(n_heads):
        q_h = qkv[:, :, h * dh:(h + 1) * dh]
        k_h = qkv[:, :, d + h * dh:d + (h + 1) * dh]
        v_h = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        qg = q_h.reshape(n_g, group * t, dh)
        kg = k_h.reshape(n_g, group * t, dh)
        vg = v_h.reshape(n_g, group * t, dh)
        logits = bdot(qg, kg, True) * scale + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o_h = bdot(probs, vg, False).astype(x.dtype)
        o_h = o_h.reshape(blk, t, dh)
        if head_tokens:
            o_h = o_h[:, :head_tokens]
        o_cat = o_h if o_cat is None else jnp.concatenate([o_cat, o_h], -1)
    attn = bd_last(o_cat, wo_ref[:]) + bo_ref[:]

    x_res = x[:, :head_tokens] if head_tokens else x

    def layer_norm(v, g_ref, b_ref):
        v = v.astype(jnp.float32)
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return ((v - mu) * jax.lax.rsqrt(var + 1e-5)) * g_ref[:] + b_ref[:]

    h1 = layer_norm(x_res.astype(jnp.float32) + attn,
                    g1_ref, beta1_ref).astype(x.dtype)

    ff = bd_last(h1, w1_ref[:])
    ff = jnp.maximum(ff + b1_ref[:], 0.0).astype(x.dtype)
    ff = bd_last(ff, w2_ref[:]) + b2_ref[:]

    out = layer_norm(h1.astype(jnp.float32) + ff, g2_ref, beta2_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def _layer_kernel_v2(n_heads: int, head_tokens: int, t_real: int,
                     x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                     g1_ref, beta1_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, beta2_ref,
                     o_ref):
    """Wide-projection + flat-FFN variant of `_layer_kernel`.

    Same per-head batched attention, but (a) qkv is ONE full-lane
    (BLK,T,128)@(128,384) matmul on a PRE-CONCATENATED weight (the
    per-head (128,32) slabs of `_layer_kernel` use a quarter of the MXU's
    lanes; the harness's in-kernel re-concat variant measured slower, so
    the concat happens once at pack time), (b) out-proj is one (D,D)
    matmul on the head-concat, and (c) the FFN runs 2-D — (BLK*T, D) @
    (D, F) — so Mosaic sees one tall matmul instead of BLK batched
    (T, D) ones (chip-measured equal-to-marginally ahead of the per-head
    kernel; see encoder_kernel_default for the numbers).
    """
    blk, t, d = x_ref.shape
    dh = d // n_heads
    x = x_ref[:]

    scale = 1.0 / math.sqrt(dh)
    bd_last = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if t != t_real:
        key_pad = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2) >= t_real
        ).astype(jnp.float32) * (-1e9)

    qkv = (bd_last(x, wqkv_ref[:]) + bqkv_ref[:]).astype(x.dtype)  # (BLK,T,3D)

    o_cat = None
    for h in range(n_heads):
        q_h = qkv[:, :, h * dh:(h + 1) * dh]
        k_h = qkv[:, :, d + h * dh:d + (h + 1) * dh]
        v_h = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        if head_tokens:
            q_h = q_h[:, :head_tokens]
        logits = jax.lax.dot_general(
            q_h, k_h, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLK, T_out, T)
        if t != t_real:
            logits = logits + key_pad
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o_h = jax.lax.dot_general(
            probs, v_h, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (BLK, T_out, Dh)
        o_cat = o_h if o_cat is None else jnp.concatenate([o_cat, o_h], -1)
    attn = bd_last(o_cat, wo_ref[:]) + bo_ref[:]

    x_res = x[:, :head_tokens] if head_tokens else x

    def layer_norm(v, g_ref, b_ref):
        v = v.astype(jnp.float32)
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return ((v - mu) * jax.lax.rsqrt(var + 1e-5)) * g_ref[:] + b_ref[:]

    h1 = layer_norm(x_res.astype(jnp.float32) + attn,
                    g1_ref, beta1_ref).astype(x.dtype)

    # flat 2-D FFN
    t_o = h1.shape[1]
    f = w1_ref.shape[-1]
    mm2 = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1f = h1.reshape(blk * t_o, d)
    ff = jnp.maximum(mm2(h1f, w1_ref[:]) + b1_ref[:].reshape(1, f),
                     0.0).astype(x.dtype)
    ff = (mm2(ff, w2_ref[:]) + b2_ref[:].reshape(1, d)).reshape(blk, t_o, d)

    out = layer_norm(h1.astype(jnp.float32) + ff, g2_ref, beta2_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def _layer_kernel_bdq(n_heads: int, head_tokens: int, t_real: int,
                      x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                      g1_ref, beta1_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, beta2_ref,
                      o_ref):
    """Block-diagonal-query attention variant of `_layer_kernel_v2`.

    The per-head kernels issue, per point, 8 tiny MXU matmuls (4 heads x
    logits (T,Dh)@(Dh,T) + apply (T,T)@(T,Dh)) that each use <=32 of the
    MXU's 128 lanes.  Here the H per-head logits fold into ONE batched
    matmul: rows h*T..(h+1)*T of a (H*T, D) query matrix hold q_cat
    lane-masked to head h's channel block, so Q_bd @ K_cat^T contracts the
    full 128-lane axis yet yields exactly q_h . k_h in the head-h row
    block (cross-head channels multiply by zero).  Softmax stays 16-wide
    (same total rows as 4 separate heads), the apply runs as one
    (H*T, T)@(T, D) matmul against the full V concat, and the per-head
    outputs are the (token-block h, lane-block h) diagonal blocks of the
    result.  2 batched matmuls instead of 8, at 4x redundant MACs on
    zeros/unused lanes — the MXU was idling on lanes anyway.
    """
    blk, t, d = x_ref.shape
    dh = d // n_heads
    x = x_ref[:]

    scale = 1.0 / math.sqrt(dh)
    bd_last = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    qkv = (bd_last(x, wqkv_ref[:]) + bqkv_ref[:]).astype(x.dtype)  # (BLK,T,3D)
    q_cat = qkv[:, :, :d]
    k_cat = qkv[:, :, d:2 * d]
    v_cat = qkv[:, :, 2 * d:]

    # (BLK, H*T, D): row block h = q_cat masked to head-h lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
    q_bd = jnp.concatenate(
        [q_cat * (lane // dh == h).astype(x.dtype) for h in range(n_heads)],
        axis=1)

    logits = jax.lax.dot_general(
        q_bd, k_cat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (BLK, H*T, T)
    if t != t_real:
        key_pad = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2) >= t_real
        ).astype(jnp.float32) * (-1e9)
        logits = logits + key_pad
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o_full = jax.lax.dot_general(
        probs, v_cat, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (BLK, H*T, D)

    t_o = head_tokens if head_tokens else t
    o_cat = jnp.concatenate(
        [o_full[:, h * t:h * t + t_o, h * dh:(h + 1) * dh]
         for h in range(n_heads)], axis=-1)  # (BLK, T_out, D)
    attn = bd_last(o_cat, wo_ref[:]) + bo_ref[:]

    x_res = x[:, :head_tokens] if head_tokens else x

    def layer_norm(v, g_ref, b_ref):
        v = v.astype(jnp.float32)
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return ((v - mu) * jax.lax.rsqrt(var + 1e-5)) * g_ref[:] + b_ref[:]

    h1 = layer_norm(x_res.astype(jnp.float32) + attn,
                    g1_ref, beta1_ref).astype(x.dtype)

    f = w1_ref.shape[-1]
    mm2 = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t_ff = t_o
    h1_ff = h1
    if _ffn_trim_enabled() and head_tokens == 0 and t_real < t_o:
        # padded tokens (13 -> 16 sublane pad) are DEAD downstream — every
        # layer's attention masks pad keys — so the FFN need not compute
        # them (~19% of layer-1/2 FFN FLOPs); their output rows are zero-
        # filled and the final LN runs over all rows (VPU, free)
        t_ff = t_real
        h1_ff = h1[:, :t_real]
    h1f = h1_ff.reshape(blk * t_ff, d)
    ff = jnp.maximum(mm2(h1f, w1_ref[:]) + b1_ref[:].reshape(1, f),
                     0.0).astype(x.dtype)
    ff = (mm2(ff, w2_ref[:]) + b2_ref[:].reshape(1, d)).reshape(blk, t_ff, d)
    if t_ff != t_o:
        ff = jnp.concatenate(
            [ff, jnp.zeros((blk, t_o - t_ff, d), ff.dtype)], axis=1)

    out = layer_norm(h1.astype(jnp.float32) + ff, g2_ref, beta2_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def _ffn_trim_enabled() -> bool:
    """bdq-kernel FFN token trim (SLICE3D_FFN_TRIM=1, experimental):
    compute the layer-1/2 FFN on the 13 real tokens instead of the
    16-sublane-padded block.  Exact — pad-token values are dead (masked
    keys in every layer); they are zero-filled on output."""
    import os

    return os.environ.get("SLICE3D_FFN_TRIM", "") == "1"


def encoder_kernel_default() -> str:
    """Production fused-encoder kernel variant: 'bdq', 'v2', 'perhead',
    'grouped'.

    Chip-measured (v5e, slope timing — (t(10 chained stacks)-t(2))/8,
    scalar pull; M=32k, bf16, one process so drift cancels, 2026-08-19):
    bdq 13.88 ms/stack (2.36 M pts/s, ~68% analytic MFU) vs perhead 17.45
    (1.88) vs v2 19.41 (1.69) — the block-diagonal-query attention is
    ~26% faster than the per-head kernel and is the default.  perhead/v2
    are within session noise of each other (v2 measured 18.6 vs perhead
    18.7 in an earlier run).  Env knob SLICE3D_ENCODER_KERNEL overrides;
    SLICE3D_ENCODER_GROUPED=1 is the legacy grouped switch.
    """
    env = os.environ.get("SLICE3D_ENCODER_KERNEL")
    if env:
        return env
    if os.environ.get("SLICE3D_ENCODER_GROUPED"):
        return "grouped"
    return "bdq"


def grouped_attention_default() -> bool:
    """Whether fused_encoder_layer uses the grouped-attention kernel.

    Chip-measured (v5e, device-side chained timing, M=32k, 3-layer
    stack): per-head kernel 21.1 ms/stack vs grouped 25.0 ms vs plain
    XLA 32.4 ms — the blk-batched tiny attention matmuls were NOT the
    bottleneck, so grouping loses to the extra mask/pack work.  The
    per-head kernel stays the default; grouped remains a tested opt-in
    (SLICE3D_ENCODER_GROUPED=1) in case the tradeoff flips on other
    topologies.  Numerics are pinned equal either way
    (tests/test_pallas_kernels.py).
    """
    return bool(os.environ.get("SLICE3D_ENCODER_GROUPED"))


def fused_encoder_layer(x, params, *, n_heads: int = 4, head_tokens: int = 0,
                        grouped: bool | None = None,
                        kernel_variant: str | None = None):
    """x: (B, M, T, D) tokens -> (B, M, T_out, D).

    params: the TransformerEncoderLayer param tree (qkv/out_proj/ff1/ff2
    {kernel, bias}, norm1/norm2 {scale, bias}).

    kernel_variant: 'perhead' | 'v2' | 'grouped' (default: env policy via
    encoder_kernel_default()).  `grouped=True` is the legacy switch.
    """
    b, m, t, d = x.shape
    f = params["ff1"]["kernel"].shape[1]
    dh = d // n_heads
    n = b * m
    dt = x.dtype
    blk = _block_points(dt)
    if kernel_variant is None:
        if grouped is None:
            kernel_variant = encoder_kernel_default()
        else:
            kernel_variant = "grouped" if grouped else "perhead"
    grouped = kernel_variant == "grouped"

    # pad the token axis to the sublane tile so bf16 layouts stay native;
    # padded keys are masked inside the kernel
    sub = 16 if dt == jnp.bfloat16 else 8
    t_pad = -(-t // sub) * sub
    t_out = head_tokens if head_tokens else t
    t_out_pad = head_tokens if head_tokens else t_pad

    flat = x.reshape(n, t, d)
    pad_n = (-n) % blk
    if pad_n or t_pad != t:
        flat = jnp.pad(flat, ((0, pad_n), (0, t_pad - t), (0, 0)))
    np_ = n + pad_n

    if kernel_variant in ("grouped", "v2", "bdq"):
        if grouped:
            group = max(1, 128 // t_pad)
            while blk % group:
                group //= 2
            kernel_g = functools.partial(_layer_kernel_grouped, n_heads,
                                         head_tokens, t, group)
        else:
            kfn = _layer_kernel_bdq if kernel_variant == "bdq" else _layer_kernel_v2
            kernel_g = functools.partial(kfn, n_heads, head_tokens, t)
        full_g = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
        row3_g = lambda v: v.reshape(1, 1, -1).astype(jnp.float32)
        out = pl.pallas_call(
            kernel_g,
            grid=(np_ // blk,),
            interpret=bool(os.environ.get("SLICE3D_PALLAS_INTERPRET")),
            in_specs=[
                pl.BlockSpec((blk, t_pad, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                full_g((d, 3 * d)), full_g((1, 1, 3 * d)),
                full_g((d, d)), full_g((1, 1, d)),
                full_g((1, 1, d)), full_g((1, 1, d)),
                full_g((d, f)), full_g((1, 1, f)),
                full_g((f, d)), full_g((1, 1, d)),
                full_g((1, 1, d)), full_g((1, 1, d)),
            ],
            out_specs=pl.BlockSpec((blk, t_out_pad, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_, t_out_pad, d), dt),
            cost_estimate=pl.CostEstimate(
                flops=2 * np_ * t_pad * d * (3 * d + d + 2 * f),
                bytes_accessed=np_ * t_pad * d * 2 * 2,
                transcendentals=np_ * t_pad * t_pad,
            ),
        )(
            flat,
            params["qkv"]["kernel"].astype(dt),
            row3_g(params["qkv"]["bias"]),
            # out_proj rows are head-major (H*Dh, D) = concat order
            params["out_proj"]["kernel"].astype(dt),
            row3_g(params["out_proj"]["bias"]),
            row3_g(params["norm1"]["scale"]), row3_g(params["norm1"]["bias"]),
            params["ff1"]["kernel"].astype(dt), row3_g(params["ff1"]["bias"]),
            params["ff2"]["kernel"].astype(dt), row3_g(params["ff2"]["bias"]),
            row3_g(params["norm2"]["scale"]), row3_g(params["norm2"]["bias"]),
        )
        return out[:n, :t_out].reshape(b, m, t_out, d)

    kq = params["qkv"]["kernel"].astype(dt)  # (D, 3D) cols = [q | k | v]
    bq = params["qkv"]["bias"].astype(jnp.float32)

    def head_slabs(mat):  # (D, D) -> (H, D, Dh)
        return jnp.transpose(mat.reshape(d, n_heads, dh), (1, 0, 2))

    wq = head_slabs(kq[:, :d])
    wk = head_slabs(kq[:, d:2 * d])
    wv = head_slabs(kq[:, 2 * d:])

    def bias_slabs(vec):  # (D,) -> (H, 1, 1, Dh): [h] -> (1, 1, Dh)
        return vec.reshape(n_heads, 1, 1, dh)

    bqh = bias_slabs(bq[:d])
    bkh = bias_slabs(bq[d:2 * d])
    bvh = bias_slabs(bq[2 * d:])

    wo = params["out_proj"]["kernel"].astype(dt).reshape(n_heads, dh, d)
    row3 = lambda v: v.reshape(1, 1, -1).astype(jnp.float32)

    kernel = functools.partial(_layer_kernel, n_heads, head_tokens, t)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(np_ // blk,),
        interpret=bool(os.environ.get("SLICE3D_PALLAS_INTERPRET")),
        in_specs=[
            pl.BlockSpec((blk, t_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((n_heads, d, dh)), full((n_heads, d, dh)), full((n_heads, d, dh)),
            full((n_heads, 1, 1, dh)), full((n_heads, 1, 1, dh)),
            full((n_heads, 1, 1, dh)),
            full((n_heads, dh, d)), full((1, 1, d)),
            full((1, 1, d)), full((1, 1, d)),
            full((d, f)), full((1, 1, f)),
            full((f, d)), full((1, 1, d)),
            full((1, 1, d)), full((1, 1, d)),
        ],
        out_specs=pl.BlockSpec((blk, t_out_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, t_out_pad, d), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * t_pad * d * (3 * d + d + 2 * f),
            bytes_accessed=np_ * t_pad * d * 2 * 2,
            transcendentals=np_ * t_pad * t_pad,
        ),
    )(
        flat, wq, wk, wv, bqh, bkh, bvh, wo,
        row3(params["out_proj"]["bias"]),
        row3(params["norm1"]["scale"]), row3(params["norm1"]["bias"]),
        params["ff1"]["kernel"].astype(dt), row3(params["ff1"]["bias"]),
        params["ff2"]["kernel"].astype(dt), row3(params["ff2"]["bias"]),
        row3(params["norm2"]["scale"]), row3(params["norm2"]["bias"]),
    )
    return out[:n, :t_out].reshape(b, m, t_out, d)
