"""12-slice latent <-> 4x4 spatial atlas tiling.

The Slice3D LDM diffuses a single (4h, 4w, c) latent "atlas" holding the 12
slice latents in a 4x4 tile grid: row 0 = slices 0-3, row 1 = slices 4-7,
row 2 = slices 8-11, row 3 = zero padding (reference ddpm.py:758-766).
Decoding un-tiles row-major and keeps the first 13 tiles — the 13th (first
pad slot) decodes to a throwaway image (reference autoencoder.py:333-341).

Pure reshapes/transposes — XLA fuses them into neighbors for free.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["tile_slices_to_atlas", "untile_atlas", "N_SLICES", "N_TILES"]

N_SLICES = 12
N_TILES = 16


def tile_slices_to_atlas(z: jnp.ndarray) -> jnp.ndarray:
    """(B, 12, h, w, C) slice latents -> (B, 4h, 4w, C) atlas (NHWC)."""
    b, s, h, w, c = z.shape
    if s != N_SLICES:
        raise ValueError(f"expected 12 slice latents, got {s}")
    pad = jnp.zeros((b, 4, h, w, c), z.dtype)
    z = jnp.concatenate([z, pad], axis=1)  # (B, 16, h, w, C)
    z = z.reshape(b, 4, 4, h, w, c)  # (B, row, col, h, w, C)
    z = jnp.transpose(z, (0, 1, 3, 2, 4, 5))  # (B, row, h, col, w, C)
    return z.reshape(b, 4 * h, 4 * w, c)


def untile_atlas(atlas: jnp.ndarray, keep: int = 13) -> jnp.ndarray:
    """(B, 4h, 4w, C) atlas -> (B, keep, h, w, C) tiles, row-major order."""
    b, hh, ww, c = atlas.shape
    h, w = hh // 4, ww // 4
    z = atlas.reshape(b, 4, h, 4, w, c)
    z = jnp.transpose(z, (0, 1, 3, 2, 4, 5))  # (B, row, col, h, w, C)
    z = z.reshape(b, 16, h, w, c)
    return z[:, :keep]
