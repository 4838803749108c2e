#!/usr/bin/env python
"""Ablate the fused Pallas encoder layer to locate its cost on the chip.

The dense 129^3 eval runs at ~17% analytic MFU (BASELINE.md round 3) even
though the FFN — 85% of per-point FLOPs — maps to well-shaped MXU matmuls.
This harness times the production kernel against surgical variants to find
the slow stage:

  full      production `_layer_kernel` (per-head qkv slabs + batched
            (BLK,16,32)@(BLK,32,16) attention matmuls)
  noattn    logits/softmax/apply removed (o_h := v_h trimmed) — isolates
            the batched tiny-matmul attention cost
  noffn     FFN matmuls removed — isolates the FFN cost
  wideqkv   qkv as ONE (BLK*T,128)@(128,384) full-lane matmul + per-head
            lane slices; attention unchanged — isolates the 12 narrow
            N=32 projection matmuls
  grouped   wideqkv + block-diagonal grouped attention: g=8 points share
            one (g*T, dh)@(dh, g*T) logits matmul; an additive mask kills
            cross-point logits, so softmax zeroes them and the apply
            matmul is block-diagonal for free.  Turns 128 serialized
            (16,32)@(32,16) MXU calls into 16 batched (128,32)@(32,128)
            calls per head; out_proj is one full-width matmul.
  flatffn   FFN matmuls run 2-D: h1 (BLK,T,128) reshaped to (BLK*T,128)
            so Mosaic sees one tall MXU matmul instead of BLK batched
            (T,128)@(128,2048) calls; attention unchanged
  flat2d    flatffn + qkv as ONE 2-D (BLK*T,128)@(128,384) matmul with
            per-head lane slices
  xla       plain jnp/einsum implementation under jit (no Pallas)

All variants run the same (M, 13, 128) -> (M, 13, 128) layer shape and the
same 3-layer stack the SDF head uses (last layer head_tokens=1).  Numerics
of `wideqkv` are asserted against `full` before timing.  Timing forces a
device->host pull per rep (block_until_ready lies through the axon tunnel).

Usage: python tools/bench_encoder_ablate.py [M] [reps] [variants,...]
  Timing is slope-based: cost = (t(10 chained stacks) - t(2)) / 8 with a
  scalar pull per call, so tunnel RTT/dispatch overhead cancel exactly.
  ABLATE_CHECK=1 adds the numerics assertions (needs `full` in the list).
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from slice3d_tpu.ops import pallas_encoder as pe  # noqa: E402


def _variant_kernel(mode: str, n_heads: int, head_tokens: int, t_real: int,
                    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                    wo_ref, bo_ref, g1_ref, beta1_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, beta2_ref,
                    o_ref):
    blk, t, d = x_ref.shape
    dh = wq_ref.shape[-1]
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

    # widen per-head (D, Dh) slabs to full-lane matrices by lane-axis
    # concatenation — Mosaic rejects the transpose+reshape shape cast
    # ((H, D, Dh) -> (D, H*Dh) mixes a middle dim into the lane dim)
    def widen_w(ref):  # (H, D, Dh) -> (D, H*Dh)
        return jnp.concatenate([ref[h] for h in range(n_heads)], axis=-1)

    def widen_b(ref):  # (H, 1, 1, Dh) -> (1, 1, H*Dh)
        return jnp.concatenate([ref[h] for h in range(n_heads)], axis=-1)

    if mode == "grouped":
        t_out = head_tokens if head_tokens else t
        g = 8
        n_g = blk // g
        wqkv = jnp.concatenate(
            [widen_w(wq_ref), widen_w(wk_ref), widen_w(wv_ref)], axis=-1)
        bqkv = jnp.concatenate(
            [widen_b(bq_ref), widen_b(bk_ref), widen_b(bv_ref)], axis=-1)
        qkv = (bd_last(x, wqkv) + bqkv).astype(x.dtype)  # (BLK, T, 3D)

        # additive mask over the packed group: row r is point r//t,
        # col c is point c//t, token c%t — cross-point or padded-key
        # entries get -1e9.  Queries cover ALL t tokens (trim after the
        # reshape): the t_out=1 grouped reshape is a Mosaic-rejected
        # shape cast.
        row_pt = jax.lax.broadcasted_iota(
            jnp.int32, (1, g * t, g * t), 1) // t
        col = jax.lax.broadcasted_iota(jnp.int32, (1, g * t, g * t), 2)
        mask = jnp.where((row_pt == col // t) & (col % t < t_real),
                         0.0, -1e9).astype(jnp.float32)

        bdot = lambda a, b, tr: jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (2 if tr else 1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_cat = None
        for h in range(n_heads):
            q_h = qkv[:, :, h * dh:(h + 1) * dh]
            k_h = qkv[:, :, d + h * dh:d + (h + 1) * dh]
            v_h = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            qg = q_h.reshape(n_g, g * t, dh)
            kg = k_h.reshape(n_g, g * t, dh)
            vg = v_h.reshape(n_g, g * t, dh)
            logits = bdot(qg, kg, True) * scale + mask  # (n_g, gT, gT)
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o_h = bdot(probs, vg, False).astype(x.dtype)  # (n_g, gT, dh)
            o_h = o_h.reshape(blk, t, dh)
            if head_tokens:
                o_h = o_h[:, :head_tokens]
            o_cat = o_h if o_cat is None else jnp.concatenate(
                [o_cat, o_h], axis=-1)
        wo_full = wo_ref[:].reshape(d, d)  # head-major rows = concat order
        attn = bd_last(o_cat, wo_full) + bo_ref[:]

        x_res = x[:, :head_tokens] if head_tokens else x

        def layer_norm_g(v, g_ref_, b_ref_):
            v = v.astype(jnp.float32)
            mu = jnp.mean(v, axis=-1, keepdims=True)
            var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
            return ((v - mu) * jax.lax.rsqrt(var + 1e-5)) * g_ref_[:] + b_ref_[:]

        h1 = layer_norm_g(x_res.astype(jnp.float32) + attn,
                          g1_ref, beta1_ref).astype(x.dtype)
        ff = bd_last(h1, w1_ref[:])
        ff = jnp.maximum(ff + b1_ref[:], 0.0).astype(x.dtype)
        ff = bd_last(ff, w2_ref[:]) + b2_ref[:]
        out = layer_norm_g(h1.astype(jnp.float32) + ff, g2_ref, beta2_ref)
        o_ref[:] = out.astype(o_ref.dtype)
        return

    if mode in ("wideqkv", "flat2d"):
        # one full-lane projection, then per-head lane slices
        wqkv = jnp.concatenate(
            [widen_w(wq_ref), widen_w(wk_ref), widen_w(wv_ref)], axis=-1)
        bqkv = jnp.concatenate(
            [widen_b(bq_ref), widen_b(bk_ref), widen_b(bv_ref)], axis=-1)
        if mode == "flat2d":
            # 2-D form: one tall (BLK*T, D)@(D, 3D) MXU matmul
            qkv2 = jax.lax.dot_general(
                x.reshape(blk * t, d), wqkv,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qkv = (qkv2.reshape(blk, t, 3 * d) + bqkv).astype(x.dtype)
        else:
            qkv = (bd_last(x, wqkv) + bqkv).astype(x.dtype)  # (BLK, T, 3D)

    attn = None
    for h in range(n_heads):
        if mode in ("wideqkv", "flat2d"):
            q_h = qkv[:, :, h * dh:(h + 1) * dh]
            k_h = qkv[:, :, d + h * dh:d + (h + 1) * dh]
            v_h = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        else:
            q_h = (bd_last(x, wq_ref[h]) + bq_ref[h]).astype(x.dtype)
            k_h = (bd_last(x, wk_ref[h]) + bk_ref[h]).astype(x.dtype)
            v_h = (bd_last(x, wv_ref[h]) + bv_ref[h]).astype(x.dtype)
        if head_tokens:
            q_h = q_h[:, :head_tokens]
        if mode == "noattn":
            o_h = v_h[:, :head_tokens] if head_tokens else v_h
        else:
            logits = jax.lax.dot_general(
                q_h, k_h, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            if t != t_real:
                logits = logits + key_pad
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o_h = jax.lax.dot_general(
                probs, v_h, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        contrib = bd_last(o_h, wo_ref[h])
        attn = contrib if attn is None else attn + contrib
    attn = attn + bo_ref[:]

    x_res = x[:, :head_tokens] if head_tokens else x

    def layer_norm(v, g_ref, b_ref):
        v = v.astype(jnp.float32)
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return ((v - mu) * jax.lax.rsqrt(var + 1e-5)) * g_ref[:] + b_ref[:]

    h1 = layer_norm(x_res.astype(jnp.float32) + attn,
                    g1_ref, beta1_ref).astype(x.dtype)

    if mode == "noffn":
        o_ref[:] = h1.astype(o_ref.dtype)
        return
    if mode in ("flatffn", "flat2d"):
        # 2-D FFN: (BLK*T_out, D) @ (D, F) -> relu -> @ (F, D); Mosaic
        # sees two tall matmuls instead of BLK batched (T,128) ones
        t_o = h1.shape[1]
        f = w1_ref.shape[-1]
        h1f = h1.reshape(blk * t_o, d)
        mm = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ff = jnp.maximum(mm(h1f, w1_ref[:]) + b1_ref[:].reshape(1, f),
                         0.0).astype(x.dtype)
        ff = (mm(ff, w2_ref[:]) + b2_ref[:].reshape(1, d)).reshape(
            blk, t_o, d)
    else:
        ff = bd_last(h1, w1_ref[:])
        ff = jnp.maximum(ff + b1_ref[:], 0.0).astype(x.dtype)
        ff = bd_last(ff, w2_ref[:]) + b2_ref[:]
    out = layer_norm(h1.astype(jnp.float32) + ff, g2_ref, beta2_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def variant_layer(x, params, mode, *, n_heads=4, head_tokens=0):
    """fused_encoder_layer with `_layer_kernel` swapped for a variant."""
    orig = pe._layer_kernel
    pe._layer_kernel = functools.partial(_variant_kernel, mode)
    try:
        # pin the perhead code path: the production default is bdq now,
        # and the swapped kernel only runs on the perhead path
        return pe.fused_encoder_layer(x, params, n_heads=n_heads,
                                      head_tokens=head_tokens,
                                      kernel_variant="perhead")
    finally:
        pe._layer_kernel = orig


def _bdq_variant_kernel(mode, n_heads, head_tokens, t_real,
                        x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                        g1_ref, beta1_ref,
                        w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, beta2_ref,
                        o_ref):
    """pe._layer_kernel_bdq with stage ablations: 'noattn' replaces the
    logits/softmax/apply with a pass-through of v (per-head lane blocks),
    'noffn' stops after the first LayerNorm."""
    blk, t, d = x_ref.shape
    dh = d // n_heads
    x = x_ref[:]
    scale = 1.0 / math.sqrt(dh)
    bd_last = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    qkv = (bd_last(x, wqkv_ref[:]) + bqkv_ref[:]).astype(x.dtype)
    q_cat = qkv[:, :, :d]
    k_cat = qkv[:, :, d:2 * d]
    v_cat = qkv[:, :, 2 * d:]
    t_o = head_tokens if head_tokens else t

    if mode == "noattn":
        o_cat = v_cat[:, :t_o]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
        q_bd = jnp.concatenate(
            [q_cat * (lane // dh == h).astype(x.dtype)
             for h in range(n_heads)], axis=1)
        logits = jax.lax.dot_general(
            q_bd, k_cat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if t != t_real:
            key_pad = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
                       >= t_real).astype(jnp.float32) * (-1e9)
            logits = logits + key_pad
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o_full = jax.lax.dot_general(
            probs, v_cat, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype)
        o_cat = jnp.concatenate(
            [o_full[:, h * t:h * t + t_o, h * dh:(h + 1) * dh]
             for h in range(n_heads)], axis=-1)
    attn = bd_last(o_cat, wo_ref[:]) + bo_ref[:]
    x_res = x[:, :head_tokens] if head_tokens else x

    def layer_norm(v, g_ref, b_ref):
        v = v.astype(jnp.float32)
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return ((v - mu) * jax.lax.rsqrt(var + 1e-5)) * g_ref[:] + b_ref[:]

    h1 = layer_norm(x_res.astype(jnp.float32) + attn,
                    g1_ref, beta1_ref).astype(x.dtype)
    if mode == "noffn":
        o_ref[:] = h1.astype(o_ref.dtype)
        return
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


def bdq_variant_layer(x, params, mode, *, n_heads=4, head_tokens=0):
    """fused_encoder_layer(bdq) with `_layer_kernel_bdq` swapped."""
    orig = pe._layer_kernel_bdq
    pe._layer_kernel_bdq = functools.partial(_bdq_variant_kernel, mode)
    try:
        return pe.fused_encoder_layer(x, params, n_heads=n_heads,
                                      head_tokens=head_tokens,
                                      kernel_variant="bdq")
    finally:
        pe._layer_kernel_bdq = orig


def xla_layer(x, params, *, n_heads=4, head_tokens=0):
    b, m, t, d = x.shape
    dh = d // n_heads
    flat = x.reshape(b * m, t, d)
    qkv = flat @ params["qkv"]["kernel"].astype(x.dtype) + \
        params["qkv"]["bias"].astype(x.dtype)
    q, k, v = jnp.split(qkv.reshape(b * m, t, n_heads, 3 * dh)
                        .transpose(0, 2, 1, 3), 3, axis=-1)
    if head_tokens:
        q = q[:, :, :head_tokens]
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32)
    probs = jax.nn.softmax(logits / math.sqrt(dh), -1).astype(x.dtype)
    o = jnp.einsum("bhts,bhsd->bhts"[:4] + "d,bhsd->bthd"[1:], probs, v) \
        if False else jnp.einsum("bhts,bhsd->bthd", probs, v)
    t_out = head_tokens if head_tokens else t
    o = o.reshape(b * m, t_out, d) @ params["out_proj"]["kernel"].astype(x.dtype) \
        + params["out_proj"]["bias"].astype(x.dtype)

    def ln(vv, p):
        vv = vv.astype(jnp.float32)
        mu = vv.mean(-1, keepdims=True)
        var = ((vv - mu) ** 2).mean(-1, keepdims=True)
        return (vv - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]

    h1 = ln(flat[:, :t_out] + o, params["norm1"]).astype(x.dtype)
    ff = jnp.maximum(h1 @ params["ff1"]["kernel"].astype(x.dtype)
                     + params["ff1"]["bias"].astype(x.dtype), 0)
    ff = ff @ params["ff2"]["kernel"].astype(x.dtype) \
        + params["ff2"]["bias"].astype(x.dtype)
    return ln(h1 + ff, params["norm2"]).astype(x.dtype) \
        .reshape(b, m, t_out, d)


def make_params(key, d=128, f=2048):
    ks = jax.random.split(key, 8)
    g = lambda k, shape, s: (jax.random.normal(k, shape) * s).astype(jnp.float32)
    return {
        "qkv": {"kernel": g(ks[0], (d, 3 * d), 0.05), "bias": g(ks[1], (3 * d,), 0.02)},
        "out_proj": {"kernel": g(ks[2], (d, d), 0.05), "bias": g(ks[3], (d,), 0.02)},
        "ff1": {"kernel": g(ks[4], (d, f), 0.05), "bias": g(ks[5], (f,), 0.02)},
        "ff2": {"kernel": g(ks[6], (f, d), 0.05), "bias": g(ks[7], (d,), 0.02)},
        "norm1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "norm2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }


def stack3(layer_fn, x, plist):
    h = layer_fn(x, plist[0], head_tokens=0)
    h = layer_fn(h, plist[1], head_tokens=0)
    return layer_fn(h, plist[2], head_tokens=1)


def make_chain(fn, k):
    """One jit that runs ``fn`` k times back-to-back on device and returns
    a scalar — so one host pull times k serialized stacks.  Per-iteration
    input scaling (distinct compile-time constants) defeats CSE."""

    def chained(xx):
        s = jnp.float32(0)
        for i in range(k):
            out = fn((xx.astype(jnp.float32) * (1.0 + 1e-6 * i))
                     .astype(xx.dtype))
            s = s + jnp.sum(out.astype(jnp.float32))
        return s

    return jax.jit(chained)


def main():
    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    want = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    t, d = 13, 128
    key = jax.random.PRNGKey(0)
    plist = [make_params(k) for k in jax.random.split(key, 3)]
    x = (jax.random.normal(jax.random.PRNGKey(1), (1, m, t, d)) * 0.5
         ).astype(jnp.bfloat16)

    fns = {
        "full": lambda xx: stack3(
            lambda a, p, head_tokens: pe.fused_encoder_layer(
                a, p, n_heads=4, head_tokens=head_tokens,
                kernel_variant="perhead"), xx, plist),
        "v2": lambda xx: stack3(
            lambda a, p, head_tokens: pe.fused_encoder_layer(
                a, p, n_heads=4, head_tokens=head_tokens,
                kernel_variant="v2"), xx, plist),
        "bdq": lambda xx: stack3(
            lambda a, p, head_tokens: pe.fused_encoder_layer(
                a, p, n_heads=4, head_tokens=head_tokens,
                kernel_variant="bdq"), xx, plist),
        "bdq_noattn": lambda xx: stack3(
            lambda a, p, head_tokens: bdq_variant_layer(
                a, p, "noattn", head_tokens=head_tokens), xx, plist),
        "bdq_noffn": lambda xx: stack3(
            lambda a, p, head_tokens: bdq_variant_layer(
                a, p, "noffn", head_tokens=head_tokens), xx, plist),
        "wideqkv": lambda xx: stack3(
            lambda a, p, head_tokens: variant_layer(
                a, p, "wideqkv", head_tokens=head_tokens), xx, plist),
        "flatffn": lambda xx: stack3(
            lambda a, p, head_tokens: variant_layer(
                a, p, "flatffn", head_tokens=head_tokens), xx, plist),
        "flat2d": lambda xx: stack3(
            lambda a, p, head_tokens: variant_layer(
                a, p, "flat2d", head_tokens=head_tokens), xx, plist),
        "grouped": lambda xx: stack3(
            lambda a, p, head_tokens: variant_layer(
                a, p, "grouped", head_tokens=head_tokens), xx, plist),
        "noattn": lambda xx: stack3(
            lambda a, p, head_tokens: variant_layer(
                a, p, "noattn", head_tokens=head_tokens), xx, plist),
        "noffn": lambda xx: stack3(
            lambda a, p, head_tokens: variant_layer(
                a, p, "noffn", head_tokens=head_tokens), xx, plist),
        "xla": lambda xx: stack3(
            lambda a, p, head_tokens: xla_layer(
                a, p, head_tokens=head_tokens), xx, plist),
    }

    if want:
        fns = {k: v for k, v in fns.items() if k in want}

    # numerics (opt-in, ABLATE_CHECK=1): exact-math variants match full
    if os.environ.get("ABLATE_CHECK"):
        ref = np.asarray(jax.jit(fns["full"])(x), np.float32)
        # grouped's differently-shaped fp32 accumulations flip rare bf16
        # rounding ties (measured: ~2 ulp on <0.1% of elements per layer,
        # mean|diff| ~1e-7); 3 stacked layers amplify max|diff| to ~3e-2
        for name, tol in (("wideqkv", 2e-2), ("flatffn", 2e-2),
                          ("flat2d", 2e-2), ("grouped", 6e-2)):
            if name not in fns:
                continue
            alt = np.asarray(jax.jit(fns[name])(x), np.float32)
            err = float(np.max(np.abs(ref - alt)))
            print(f"{name} vs full max|diff| = {err:.2e}", flush=True)
            assert err < tol, f"{name} numerics diverge"

    # Slope timing: per-variant cost = (t(k2 chained stacks) - t(k1)) /
    # (k2 - k1) — one scalar pull per call, so the tunnel RTT and any
    # fixed dispatch overhead cancel exactly in the difference.
    k1, k2 = 2, 10
    flops_full = m * 3 * (2 * 16 * d * 3 * d + 2 * 2 * 16 * 16 * 32
                          + 2 * 16 * 32 * d * 4 + 2 * 2 * 16 * d * 2048)
    for name, fn in fns.items():
        p50 = {}
        for k in (k1, k2):
            jf = make_chain(fn, k)
            float(jf(x))  # compile
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(jf(x))
                ts.append(time.perf_counter() - t0)
            p50[k] = float(np.median(ts))
        per = (p50[k2] - p50[k1]) / (k2 - k1)
        print(f"{name:8s} {per * 1e3:8.2f} ms/stack   "
              f"{m / per / 1e6:6.2f} M pts/s   "
              f"(~{flops_full / per / 197e12 * 100:4.1f}% MFU if full-work)",
              flush=True)


if __name__ == "__main__":
    main()
