"""kl-f8 AutoencoderKL (flax, NHWC) — the LDM first stage.

Architecture matches CompVis latent-diffusion's ``AutoencoderKL`` with the
kl-f8 ddconfig used by Slice3D (gen_slices config objaverse-ldm-kl-8.yaml:
ch=128, ch_mult=[1,2,4,4], num_res_blocks=2, z=4, double_z): ResNet
encoder/decoder with a single mid-attention block, GroupNorm(32, eps 1e-6),
swish activations, nearest-x2 upsampling, and asymmetric-padded strided
downsampling.  Slice3D's 13-image batching and atlas reshapes
(autoencoder.py:325-350) live in :mod:`slice3d_tpu.ops.atlas` and the
LatentDiffusion wrapper — the VAE itself is image-in/image-out.

Weight import from CompVis/reference checkpoints:
:func:`slice3d_tpu.convert.torch_import.autoencoder_kl`.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Encoder", "Decoder", "AutoencoderKL", "DiagonalGaussian"]


def _gn(name: str, dtype=None) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, name=name)


def swish(x):
    return x * jax.nn.sigmoid(x)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        h = _gn("norm1", self.dtype)(x)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv1")(h)
        h = _gn("norm2", self.dtype)(h)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = _gn("norm", self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, h * w, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32)
        probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Strided conv with torch's asymmetric (0,1,0,1) padding."""

    out_ch: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    out_ch: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest x2
        return nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            out_ch = self.ch * mult
            for j in range(self.num_res_blocks):
                h = ResnetBlock(out_ch, dtype=self.dtype, name=f"down{i}_block{j}")(h)
            if i + 1 < len(self.ch_mult):
                h = Downsample(out_ch, dtype=self.dtype, name=f"down{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block2")(h)
        h = _gn("norm_out", self.dtype)(h)
        h = swish(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_c, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block2")(h)
        for i in reversed(range(len(self.ch_mult))):
            out_c = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(out_c, dtype=self.dtype, name=f"up{i}_block{j}")(h)
            if i > 0:
                h = Upsample(out_c, dtype=self.dtype, name=f"up{i}_upsample")(h)
        h = _gn("norm_out", self.dtype)(h)
        h = swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       name="conv_out")(h)


class DiagonalGaussian:
    """Moments -> sample/mode/KL (reference distributions.py:24-92)."""

    def __init__(self, moments: jnp.ndarray):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            self.mean ** 2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=(1, 2, 3),
        )


class AutoencoderKL(nn.Module):
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dtype: Optional[Any] = None

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.embed_dim, dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, 3) -> (N, H/8, W/8, 8) gaussian moments."""
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(N, h, w, 4) latents -> (N, 8h, 8w, 3) images."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample_posterior: bool = True):
        moments = self.encode_moments(x)
        post = DiagonalGaussian(moments)
        z = post.sample(rng) if sample_posterior else post.mode()
        return self.decode(z), moments
