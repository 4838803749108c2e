"""Device-side image preprocessing (north-star: "RGBA compositing,
resize/normalize fused into device-side transforms").

The host decodes PNGs to raw RGBA uint8; everything after that —
compositing, bilinear resize, [-1, 1] normalization — runs as ONE jitted
program on device.  Besides freeing host CPU, shipping uint8 instead of
float32 RGB cuts host->device traffic 3x, which matters when the chip sits
behind a slow link.

Numerics: compositing and normalization match the host path
(slice3d_tpu.data.dataset.preprocess_image) exactly; the resize uses
jax.image.resize(method="linear", antialias=True), which agrees with PIL's
adaptive-support BILINEAR to ~1e-2 on natural images (both are triangle
filters with half-pixel centers; PIL quantizes intermediate values).
When the source already has the target size the whole transform is exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["preprocess_rgba_device", "DeviceTransformLoader"]


@partial(jax.jit, static_argnames=("img_size", "white_bg"))
def preprocess_rgba_device(raw: jnp.ndarray, img_size: int,
                           white_bg: bool = False) -> jnp.ndarray:
    """(..., H, W, 4) uint8 RGBA -> (..., img_size, img_size, 3) float32
    in [-1, 1].  Mirrors dataset.composite_rgba + preprocess_image."""
    rgb = raw[..., :3].astype(jnp.float32)
    alpha = raw[..., 3:4].astype(jnp.float32)
    if white_bg:
        # reference png_2_whitebg: fully transparent pixels -> white
        mask = (alpha == 0).astype(jnp.float32)
        out = 255.0 * mask + rgb * (1.0 - mask)
    else:
        out = rgb * (alpha / 255.0)
    # the host path casts the composite to uint8 (truncation) before
    # resizing/normalizing — mirror it for bit parity
    out = jnp.floor(out)
    h, w = out.shape[-3], out.shape[-2]
    if (h, w) != (img_size, img_size):
        shape = out.shape[:-3] + (img_size, img_size, 3)
        out = jax.image.resize(out, shape, method="linear", antialias=True)
    return (out / 255.0 - 0.5) / 0.5


class DeviceTransformLoader:
    """Wrap a BatchLoader whose dataset emits RAW uint8 RGBA arrays;
    applies the jitted preprocess on device per batch.

    Keys ending in ``_raw`` are transformed to their float names
    (``img_input_raw`` -> ``img_input``); other keys pass through.
    """

    def __init__(self, loader, img_size: int, white_bg: bool = False):
        self.loader = loader
        self.img_size = img_size
        self.white_bg = white_bg

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for batch in self.loader:
            out = {}
            for k, v in batch.items():
                if k.endswith("_raw"):
                    out[k[:-4]] = preprocess_rgba_device(
                        jnp.asarray(v), self.img_size, self.white_bg)
                else:
                    out[k] = v
            yield out
