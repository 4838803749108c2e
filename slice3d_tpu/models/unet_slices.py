"""Slice-generating U-Net: one input view -> 12 slice images + pyramids.

Functional equivalent of the reference ``UNet`` (reg_slices/src/unet_custom.py
:4-69 with parts from unet_parts.py): a VGG16-BN encoder over the input view,
a learned 128-d embedding per slice concatenated at the bottleneck, and a
ConvTranspose decoder run with the batch axis expanded x12 (one decode per
slice).  Returns the 5 decoder feature maps (512/256/128/64/32 channels —
the 992-d sampling pyramid) and the tanh slice images.

TPU notes: the x12 batch expansion happens once at the bottleneck — encoder
cost is paid once per view; decoder convs run as a single (B*12) NHWC batch
on the MXU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm
from .vgg import VGG16BNBackbone

__all__ = ["SliceUNet"]


class DoubleConv(nn.Module):
    """(conv3x3 no-bias -> BN -> ReLU) x 2."""

    features: int
    train_bn: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Conv(
                self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = BatchNorm(
                use_running_average=not self.train_bn,
                axis_name=self.axis_name, dtype=self.dtype, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class Up(nn.Module):
    """ConvTranspose(k2,s2) upsample, concat skip, DoubleConv."""

    features: int
    train_bn: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID",
            transpose_kernel=True, dtype=self.dtype, name="up",
        )(x)
        x = jnp.concatenate([skip, x], axis=-1)  # skip first (torch cat order)
        return DoubleConv(
            self.features, train_bn=self.train_bn,
            axis_name=self.axis_name, dtype=self.dtype, name="conv",
        )(x)


class SliceUNet(nn.Module):
    n_slices: int = 12
    dim_embed: int = 128
    train_bn: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x) -> Tuple[Sequence[jnp.ndarray], jnp.ndarray]:
        """x: (B, H, W, 3) input view.

        Returns (feats, slices): feats is the 5-level pyramid, each
        (B * n_slices, h, w, c) with c in (512, 256, 128, 64, 32);
        slices is (B * n_slices, H, W, 3) in [-1, 1].
        """
        b = x.shape[0]
        s = self.n_slices

        # Encoder taps: 64@H, 128@H/2, 256@H/4, 512@H/8, 512@H/16 (pre-BN).
        (x1, x2, x3, x4, x5), _ = VGG16BNBackbone(
            with_final=False, train_bn=self.train_bn,
            axis_name=self.axis_name, dtype=self.dtype, name="encoder",
        )(x)

        def expand(t):  # (B, h, w, c) -> (B*S, h, w, c)
            return jnp.repeat(t, s, axis=0)

        h5, w5 = x5.shape[1:3]
        embed = nn.Embed(s, self.dim_embed, name="emds")(jnp.arange(s))
        embs_tile = jnp.broadcast_to(
            embed[None, :, None, None, :], (b, s, h5, w5, self.dim_embed)
        ).reshape(b * s, h5, w5, self.dim_embed).astype(x5.dtype)

        latent = jnp.concatenate([expand(x5), embs_tile], axis=-1)
        latent = nn.Conv(512, (1, 1), dtype=self.dtype, name="trans_c")(latent)

        feats = [latent]
        skips = [
            (256, x4, "trans_up1", "up1"),
            (128, x3, "trans_up2", "up2"),
            (64, x2, "trans_up3", "up3"),
            (32, x1, "trans_up4", "up4"),
        ]
        h = latent
        for ch, skip, tname, uname in skips:
            skip_t = nn.Conv(ch, (1, 1), dtype=self.dtype, name=tname)(expand(skip))
            h = Up(ch, train_bn=self.train_bn, axis_name=self.axis_name,
                   dtype=self.dtype, name=uname)(h, skip_t)
            feats.append(h)

        out = nn.Conv(3, (1, 1), dtype=self.dtype, name="outc")(h)
        slices = jnp.tanh(out)
        return feats, slices
