"""Shared neural building blocks (flax.linen, NHWC, torch-compatible math).

These blocks mirror the torch layer semantics the reference models rely on
(BatchNorm eps/momentum, post-LayerNorm transformer encoder with ReLU/2048-FF,
ConvTranspose k2s2) so that converted torch checkpoints evaluate identically,
while staying TPU-idiomatic: NHWC layout, fused QKV projections on the MXU,
bfloat16-friendly compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "Dense",
    "Conv",
    "ConvTranspose",
    "BatchNorm",
    "max_pool_2x2",
    "TransformerEncoderLayer",
    "TransformerEncoder",
    "MLP",
]

Dtype = Any


class Dense(nn.Dense):
    """nn.Dense with fp32 params; alias kept for uniform imports."""


def Conv(features: int, kernel: int = 3, stride: int = 1, padding: int = 0,
         use_bias: bool = True, dtype: Optional[Dtype] = None) -> nn.Conv:
    """2D convolution, NHWC, torch-style symmetric integer padding."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        use_bias=use_bias,
        dtype=dtype,
    )


def ConvTranspose(features: int, kernel: int = 2, stride: int = 2,
                  dtype: Optional[Dtype] = None) -> nn.ConvTranspose:
    """Transposed conv (k=2, s=2 default) matching torch ConvTranspose2d."""
    return nn.ConvTranspose(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding="VALID",
        dtype=dtype,
        transpose_kernel=True,  # torch-layout kernels convert directly
    )


def BatchNorm(use_running_average: bool = True, axis_name: Optional[str] = None,
              dtype: Optional[Dtype] = None, name: Optional[str] = None) -> nn.BatchNorm:
    """BatchNorm matching torch defaults (eps=1e-5, momentum=0.1).

    ``use_running_average=True`` for inference; during training batch stats
    are cross-replica averaged when ``axis_name`` is set (pmap/shard_map).
    Note flax's ``momentum`` keeps that fraction of the *old* stat, so torch
    momentum 0.1 maps to flax momentum 0.9.
    """
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,
        epsilon=1e-5,
        axis_name=axis_name,
        dtype=dtype,
        name=name,
    )


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pooling over NHWC, torch floor-mode window."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class DenseParams(nn.Module):
    """Raw (kernel, bias) parameters with nn.Dense's tree layout and inits —
    lets callers feed the weights to fused kernels while keeping checkpoint
    compatibility with a Dense of the same name."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class NormParams(nn.Module):
    """Raw LayerNorm (scale, bias) with nn.LayerNorm's tree layout."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return scale, bias


def _layer_norm(x, scale, bias, dtype):
    cd = dtype or x.dtype
    xc = x.astype(cd)
    mu = jnp.mean(xc, axis=-1, keepdims=True)
    var = jnp.mean((xc - mu) ** 2, axis=-1, keepdims=True)
    out = (xc - mu) * jax.lax.rsqrt(var + 1e-5) * scale.astype(cd) + bias.astype(cd)
    return out


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer with torch nn.TransformerEncoderLayer
    defaults: ReLU activation, dim_feedforward=2048, LayerNorm eps=1e-5.

    Input: (..., T, D).  QKV is one fused (D, 3D) matmul for the MXU.
    Dropout is omitted (the reference evaluates with dropout inactive and the
    SDF losses are computed full-batch; training remains well-posed without).
    ``fused_ffn`` routes the feed-forward through the Pallas VMEM-resident
    kernel (inference-only; exact same parameters).
    """

    d_model: int = 128
    n_heads: int = 4
    d_ff: int = 2048
    # Keep only the first `head_tokens` tokens after attention (the rest are
    # dropped BEFORE the expensive FFN).  Exact when later computation reads
    # only those tokens — the SDF head reads token 0 of the last layer, so
    # its final layer runs the 16x-expansion FFN on 1/13th of the tokens.
    head_tokens: int = 0  # 0 = keep all
    fused_ffn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d, h = self.d_model, self.n_heads
        dh = d // h
        in_dtype = x.dtype
        cd = self.dtype or x.dtype

        kq, bq = DenseParams(d, 3 * d, name="qkv")()
        ko, bo = DenseParams(d, d, name="out_proj")()
        g1, be1 = NormParams(d, name="norm1")()
        k1, b1 = DenseParams(d, self.d_ff, name="ff1")()
        k2, b2 = DenseParams(self.d_ff, d, name="ff2")()
        g2, be2 = NormParams(d, name="norm2")()

        import os

        # Fully-fused layer kernel (verified on TPU at fp32 and bf16 after
        # padding the token axis to the sublane tile); escape hatch via
        # SLICE3D_DISABLE_FUSED_ENCODER.
        if (self.fused_ffn and x.ndim == 4
                and not os.environ.get("SLICE3D_DISABLE_FUSED_ENCODER")):
            from ..ops.pallas_encoder import fused_encoder_layer
            from ..ops.pallas_ffn import pallas_available

            if pallas_available():
                params = {
                    "qkv": {"kernel": kq, "bias": bq},
                    "out_proj": {"kernel": ko, "bias": bo},
                    "norm1": {"scale": g1, "bias": be1},
                    "ff1": {"kernel": k1, "bias": b1},
                    "ff2": {"kernel": k2, "bias": b2},
                    "norm2": {"scale": g2, "bias": be2},
                }
                out = fused_encoder_layer(
                    x.astype(cd), params, n_heads=h, head_tokens=self.head_tokens
                )
                return out.astype(in_dtype)

        qkv = jnp.dot(x.astype(cd), kq.astype(cd)) + bq.astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (..., T, D) -> (..., H, T, Dh)
            t = t.reshape(t.shape[:-1] + (h, dh))
            return jnp.swapaxes(t, -2, -3)

        if self.head_tokens:
            q = q[..., : self.head_tokens, :]
            x = x[..., : self.head_tokens, :]
        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
        logits = jnp.einsum("...td,...sd->...ts", q, k).astype(jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("...ts,...sd->...td", probs, v)
        attn = jnp.swapaxes(attn, -2, -3)  # (..., T, H, Dh)
        attn = attn.reshape(attn.shape[:-2] + (d,))
        attn = jnp.dot(attn.astype(cd), ko.astype(cd)) + bo.astype(cd)

        x = _layer_norm(x + attn, g1, be1, self.dtype)
        if self.fused_ffn:
            from ..ops.pallas_ffn import fused_ffn

            ff = fused_ffn(x, k1, b1, k2, b2)
        else:
            ff = nn.relu(jnp.dot(x.astype(cd), k1.astype(cd)) + b1.astype(cd))
            ff = jnp.dot(ff, k2.astype(cd)) + b2.astype(cd)
        x = _layer_norm(x + ff, g2, be2, self.dtype)
        return x.astype(in_dtype)


class TransformerEncoder(nn.Module):
    """Stack of post-LN encoder layers (reference: 3 layers, d=128, 4 heads)."""

    num_layers: int = 3
    d_model: int = 128
    n_heads: int = 4
    d_ff: int = 2048
    final_head_tokens: int = 0  # trim tokens entering the last layer's FFN
    fused_ffn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i + 1 == self.num_layers
            x = TransformerEncoderLayer(
                d_model=self.d_model,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                head_tokens=self.final_head_tokens if last else 0,
                fused_ffn=self.fused_ffn,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x)
        return x


class MLP(nn.Module):
    """Dense stack with ReLU between layers.

    ``relu_last`` appends a trailing ReLU (the reference point/feature MLPs
    end in ReLU; the SDF output head does not).  ``first_layer`` /
    ``after_first_layer`` expose the split around the first (pre-activation)
    Dense so callers can fold it into upstream linear computations.
    """

    features: Sequence[int]
    relu_last: bool = True
    dtype: Optional[Dtype] = None

    def setup(self):
        self.layers = [
            nn.Dense(f, dtype=self.dtype, name=f"fc{i}")
            for i, f in enumerate(self.features)
        ]

    def first_layer(self, x):
        return self.layers[0](x)

    def after_first_layer(self, x):
        n = len(self.features)
        for i in range(1, n + 1):
            if i < n or self.relu_last:
                x = nn.relu(x)
            if i < n:
                x = self.layers[i](x)
        return x

    def __call__(self, x):
        return self.after_first_layer(self.first_layer(x))
