"""Image resizing with torch-compatible semantics, NHWC layout.

``resize_nearest`` reproduces ``torch.nn.functional.interpolate(mode='nearest')``
(source index = floor(dst * in/out)) — used by the LDM conditioning encoder's
multi-scale downsampling and the denoiser UNet's nearest upsampling.

``resize_bilinear`` reproduces bilinear interpolation with
``align_corners=False`` (torchvision ``Resize`` / ``F.interpolate`` default),
used for dataset image preprocessing.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["resize_nearest", "resize_bilinear"]


def _nearest_indices(out_size: int, in_size: int) -> jnp.ndarray:
    idx = jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size)
    return jnp.minimum(idx.astype(jnp.int32), in_size - 1)


def resize_nearest(x: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Nearest-neighbor resize of (..., H, W, C) to (..., h, w, C)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    rows = _nearest_indices(h_out, h_in)
    cols = _nearest_indices(w_out, w_in)
    x = jnp.take(x, rows, axis=-3)
    x = jnp.take(x, cols, axis=-2)
    return x


def _bilinear_weights(out_size: int, in_size: int, align_corners: bool):
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = src - lo.astype(jnp.float32)
    return lo, hi, frac


def resize_bilinear(
    x: jnp.ndarray, out_hw: tuple, *, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., h, w, C)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw

    rlo, rhi, rf = _bilinear_weights(h_out, h_in, align_corners)
    clo, chi, cf = _bilinear_weights(w_out, w_in, align_corners)

    top = jnp.take(x, rlo, axis=-3)
    bot = jnp.take(x, rhi, axis=-3)
    rf_ = rf.reshape((-1, 1, 1))
    rows = top * (1 - rf_) + bot * rf_

    left = jnp.take(rows, clo, axis=-2)
    right = jnp.take(rows, chi, axis=-2)
    cf_ = cf.reshape((-1, 1))
    return left * (1 - cf_) + right * cf_
