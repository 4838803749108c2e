"""LDM conditioning encoder: input view -> multi-scale UNet injection maps.

Functional equivalent of ``ImageEncoderVGG16BN``
(gen_slices/ldm/modules/encoders/modules.py:204-267): VGG16-BN taps of the
[-1,1] input view (ImageNet-renormalized), 1x1-projected to the UNet widths
(192/384/384/768/768), nearest-resized to 16/8/4/2/1 px and tiled 4x4 to
match the latent atlas layout.  Trainable (cond_stage_trainable=true).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops import resize_nearest
from .vgg import VGG16BNBackbone, imagenet_renorm

__all__ = ["CondImageEncoder"]

class CondImageEncoder(nn.Module):
    widths: tuple = (192, 384, 384, 768, 768)  # UNet level widths
    latent_size: int = 16  # latent tile resolution (img_size // 8)
    train_bn: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, img: jnp.ndarray,
                 train: Optional[bool] = None) -> Dict[str, jnp.ndarray]:
        """img: (B, H, W, 3) in [-1, 1] -> {'f1'..'f5'} atlas-tiled maps.

        ``train=True`` runs the VGG BatchNorms on batch statistics and
        updates ``batch_stats`` (the reference trains the cond stage in
        train mode, ddpm.py:604-623); default follows ``self.train_bn``.
        """
        x = imagenet_renorm(img)
        taps, _ = VGG16BNBackbone(
            with_final=False, train_bn=self.train_bn,
            axis_name=self.axis_name, dtype=self.dtype, name="backbone",
        )(x, train=train)
        out = {}
        for i, (tap, width) in enumerate(zip(taps, self.widths)):
            size = max(self.latent_size >> i, 1)
            f = nn.Conv(width, (1, 1), dtype=self.dtype, name=f"trans{i}")(tap)
            f = resize_nearest(f, (size, size))
            f = jnp.tile(f, (1, 4, 4, 1))
            out[f"f{i + 1}"] = f
        return out
