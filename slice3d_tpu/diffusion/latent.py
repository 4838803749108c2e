"""LatentDiffusion: the Slice3D slice-generation model, TPU-native.

Functional equivalent of the reference ``LatentDiffusion``
(gen_slices/ldm/models/diffusion/ddpm.py:518-1451) at the Slice3D operating
point: a frozen kl-f8 VAE encodes the 13 images (12 slices + input view) of
each sample, the 12 slice latents tile into a 4x64x64 atlas, and an
fmap-conditioned UNet denoises the atlas with the input-view latent tile
concatenated channel-wise.  All the reference's Python-side view gymnastics
(39-channel stacks, 13x batching, atlas reshapes) are pure tensor ops
inside jit here.

This module OWNS the three networks as flax submodules so one variables
tree carries everything; the VAE subtree is frozen by the optimizer mask in
the trainer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.cond_encoder import CondImageEncoder
from ..models.ldm_unet import LDMUNet
from ..models.vae import AutoencoderKL, DiagonalGaussian
from ..ops.atlas import tile_slices_to_atlas, untile_atlas
from .schedule import DiffusionSchedule

__all__ = ["LatentDiffusion"]


class LatentDiffusion(nn.Module):
    timesteps: int = 1000
    linear_start: float = 0.0015
    linear_end: float = 0.0155
    loss_type: str = "l1"
    n_slices: int = 12
    train_bn: bool = False  # cond-stage VGG BN mode during training
    # submodule configs (defaults = the Slice3D 128px operating point;
    # smaller values are used by tests/tiny runs)
    vae_ch: int = 128
    vae_mult: Tuple[int, ...] = (1, 2, 4, 4)
    vae_nres: int = 2
    unet_channels: int = 192
    unet_mult: Tuple[int, ...] = (1, 2, 2, 4, 4)
    unet_nres: int = 2
    unet_attention_ds: Tuple[int, ...] = (1, 2, 4, 8)
    # None => derived from the UNet config: injection lands after the input
    # conv, the first res block of levels 1..L-2, and the downsample into
    # the last level (matching the reference's 0/4/7/10/12 for nres=2,
    # 5 levels); widths follow model_channels * channel_mult per level.
    unet_inject_blocks: Optional[Tuple[int, ...]] = None
    cond_widths: Optional[Tuple[int, ...]] = None
    latent_size: int = 16  # img_size // 8
    dtype: Optional[Any] = None

    def _derived_inject(self) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        if self.unet_inject_blocks is not None and self.cond_widths is not None:
            return tuple(self.unet_inject_blocks), tuple(self.cond_widths)
        n_levels = len(self.unet_mult)
        per = self.unet_nres + 1
        blocks = [0]
        widths = [self.unet_channels * self.unet_mult[0]]
        for level in range(1, n_levels - 1):
            blocks.append(1 + level * per)
            widths.append(self.unet_channels * self.unet_mult[level])
        blocks.append((n_levels - 1) * per)  # downsample into the last level
        widths.append(self.unet_channels * self.unet_mult[n_levels - 2])
        inject = self.unet_inject_blocks or tuple(blocks)
        cw = self.cond_widths or tuple(widths)
        return tuple(inject), tuple(cw)

    def setup(self):
        self.first_stage = AutoencoderKL(
            ch=self.vae_ch, ch_mult=self.vae_mult, num_res_blocks=self.vae_nres,
            dtype=self.dtype, name="first_stage",
        )
        inject, widths = self._derived_inject()
        self.model = LDMUNet(
            model_channels=self.unet_channels, channel_mult=self.unet_mult,
            num_res_blocks=self.unet_nres, attention_ds=self.unet_attention_ds,
            fmap_inject_blocks=inject,
            dtype=self.dtype, name="model",
        )
        self.cond_stage = CondImageEncoder(
            widths=widths, latent_size=self.latent_size,
            train_bn=self.train_bn, dtype=self.dtype, name="cond_stage",
        )

    # -- first stage -------------------------------------------------------

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.vae_mult) - 1)

    def encode_images(self, images: jnp.ndarray, rng=None,
                      sample: bool = True) -> jnp.ndarray:
        """(B, K, H, W, 3) -> (B, K, H/f, W/f, 4) sampled latents (UNSCALED)."""
        b, k, h, w, c = images.shape
        f = self.downscale
        moments = self.first_stage.encode_moments(images.reshape(b * k, h, w, c))
        post = DiagonalGaussian(moments.astype(jnp.float32))
        z = post.sample(rng) if sample else post.mode()
        return z.reshape(b, k, h // f, w // f, -1)

    def decode_tiles(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, K, h, w, 4) UNSCALED latents -> (B, K, 8h, 8w, 3) images."""
        b, k = z.shape[:2]
        imgs = self.first_stage.decode(z.reshape((b * k,) + z.shape[2:]))
        return imgs.reshape((b, k) + imgs.shape[1:])

    def decode_atlas_images(self, atlas_scaled: jnp.ndarray,
                            scale_factor: jnp.ndarray) -> jnp.ndarray:
        z = untile_atlas(atlas_scaled / scale_factor, keep=13)
        return self.decode_tiles(z)

    # -- conditioning ------------------------------------------------------

    def build_cond(self, z13: jnp.ndarray, img_input: jnp.ndarray,
                   scale_factor: jnp.ndarray,
                   train: Optional[bool] = None) -> Dict[str, jnp.ndarray]:
        """z13: (B, 13, h, w, 4) UNSCALED latents; img_input: (B, H, W, 3).

        ``train=True`` runs the cond-stage VGG BatchNorms on batch stats
        (reference trains the conditioner in train mode, ddpm.py:604-623)."""
        fmaps = self.cond_stage(img_input, train=train)
        c_concat = jnp.tile(z13[:, 12] * scale_factor, (1, 4, 4, 1))
        return {"c_concat": c_concat, "c_fmaps": fmaps}

    def make_atlas(self, z13: jnp.ndarray, scale_factor: jnp.ndarray) -> jnp.ndarray:
        return tile_slices_to_atlas(z13[:, : self.n_slices] * scale_factor)

    # -- denoiser ----------------------------------------------------------

    def apply_model(self, x: jnp.ndarray, t: jnp.ndarray,
                    cond: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        xc = jnp.concatenate([x, cond["c_concat"].astype(x.dtype)], axis=-1)
        return self.model(xc, t, cond["c_fmaps"])

    def __call__(self, x, t, cond):
        return self.apply_model(x, t, cond)


def p_losses(
    module: LatentDiffusion,
    variables,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    x_start: jnp.ndarray,
    cond: Dict[str, jnp.ndarray],
    logvar: Optional[jnp.ndarray] = None,
    loss_type: str = "l1",
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Eps-prediction loss with optional learned-logvar weighting
    (reference ddpm.py:1116-1149)."""
    b = x_start.shape[0]
    rng_t, rng_n = jax.random.split(rng)
    t = jax.random.randint(rng_t, (b,), 0, schedule.num_timesteps)
    noise = jax.random.normal(rng_n, x_start.shape, x_start.dtype)
    sqrt_ac = jnp.asarray(schedule.sqrt_alphas_cumprod)[t][:, None, None, None]
    sqrt_1m = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)[t][:, None, None, None]
    x_noisy = sqrt_ac * x_start + sqrt_1m * noise

    model_out = module.apply(variables, x_noisy, t, cond,
                             method=LatentDiffusion.apply_model)

    if loss_type == "l1":
        err = jnp.abs(model_out - noise)
    else:
        err = (model_out - noise) ** 2
    loss_simple = err.mean(axis=(1, 2, 3))

    logs = {"loss_simple": loss_simple.mean()}
    if logvar is not None:
        lv = logvar[t]
        loss = loss_simple / jnp.exp(lv) + lv
    else:
        loss = loss_simple
    loss = l_simple_weight * loss.mean()

    lvlb = (jnp.asarray(schedule.lvlb_weights)[t] * loss_simple).mean()
    logs["loss_vlb"] = lvlb
    loss = loss + original_elbo_weight * lvlb
    logs["loss"] = loss
    return loss, logs
