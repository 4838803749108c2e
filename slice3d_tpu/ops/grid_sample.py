"""Bilinear plane sampling (grid_sample) for NHWC feature maps.

Semantics match ``torch.nn.functional.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=True)`` as used by the reference SDF
decoders (reg_slices/src/models.py:38-46) — but laid out TPU-first:

* features are NHWC (TPU-native conv layout), queries are a flat point list;
* the 2D gather is expressed as a single flattened-index ``take`` so XLA
  lowers it to one vectorized gather per corner;
* all four corner contributions fuse into the surrounding computation.

The model's projected coordinates are pre-clamped to [-1, 1], so with
align_corners=True the samples are always in-bounds; the zero-padding mask
is still implemented for exact parity with torch on out-of-range inputs.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_sample_2d"]


def grid_sample_2d(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    *,
    align_corners: bool = True,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample ``features`` at normalized 2D locations.

    Args:
      features: (N, H, W, C) feature planes.
      coords: (N, M, 2) normalized coordinates in [-1, 1]; ``coords[..., 0]``
        indexes width (x) and ``coords[..., 1]`` height (y), matching torch.
      align_corners: if True, -1/+1 map to the centers of the corner pixels.
      padding_mode: 'zeros' or 'border'.

    Returns:
      (N, M, C) sampled features.
    """
    n, h, w, c = features.shape
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    if align_corners:
        px = (x + 1.0) * 0.5 * (w - 1)
        py = (y + 1.0) * 0.5 * (h - 1)
    else:
        px = ((x + 1.0) * w - 1.0) * 0.5
        py = ((y + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, weight):
        if padding_mode == "zeros":
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            weight = jnp.where(valid, weight, 0.0)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat_idx = yc * w + xc  # (N, M)
        flat_feat = features.reshape(n, h * w, c)
        gathered = jnp.take_along_axis(flat_feat, flat_idx[..., None], axis=1)
        return gathered * weight[..., None].astype(features.dtype)

    out = (
        corner(x0i, y0i, (1 - wx) * (1 - wy))
        + corner(x0i + 1, y0i, wx * (1 - wy))
        + corner(x0i, y0i + 1, (1 - wx) * wy)
        + corner(x0i + 1, y0i + 1, wx * wy)
    )
    return out
