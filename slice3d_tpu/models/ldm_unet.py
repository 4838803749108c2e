"""ADM-style denoiser UNet with Slice3D's VGG feature-map injection.

Functional equivalent of the reference ``UNetModel``
(gen_slices/ldm/modules/diffusionmodules/openaimodel.py:413-757) at the
Slice3D operating point: in 8ch (noisy 4ch atlas + 4ch input-view latent
tile), out 4ch, model_channels 192, channel_mult (1,2,2,4,4),
num_res_blocks 2, attention at ds 1/2/4/8 with 8 heads, scale-shift norm,
resblock up/down.  The conditioning feature maps f1..f5 are ADDED to the
activations after input blocks 0/4/7/10/12 (reference :731-745).

Module names mirror the torch block indices (``input_{n}_{m}`` etc.) so
checkpoint conversion is a direct positional mapping.

TPU notes: NHWC convs, fused qkv attention over <=4096 tokens (64x64
atlas) in fp32 softmax, bf16 elsewhere when dtype=bfloat16.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LDMUNet", "timestep_embedding"]


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embeddings, cos-first (reference util.py:151-163)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _gn(name: str, dtype=None) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype, name=name)


def _avg_pool2(x):
    return nn.avg_pool(x, (2, 2), (2, 2))


def _nearest_up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class ResBlock(nn.Module):
    out_ch: int
    updown: int = 0  # +1 up, -1 down, 0 none
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, emb):
        h = _gn("in_norm", self.dtype)(x)
        h = jax.nn.silu(h)
        if self.updown == 1:
            h, x = _nearest_up2(h), _nearest_up2(x)
        elif self.updown == -1:
            h, x = _avg_pool2(h), _avg_pool2(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="in_conv")(h)

        e = nn.Dense(2 * self.out_ch, dtype=self.dtype, name="emb_proj")(jax.nn.silu(emb))
        scale, shift = jnp.split(e[:, None, None, :], 2, axis=-1)
        h = _gn("out_norm", self.dtype)(h) * (1 + scale) + shift
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)

        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    n_heads: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ch = c // self.n_heads
        t = h * w
        hn = _gn("norm", self.dtype)(x).reshape(b, t, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(hn)
        # torch QKVAttentionLegacy layout: heads-major, then (q, k, v) chunks
        qkv = qkv.reshape(b, t, self.n_heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        from ..ops.pallas_attention import (
            attention_kernel_eligible,
            spatial_attention,
        )

        if attention_kernel_eligible(t):
            # fused VMEM-resident softmax-attention: avoids the (B*H, T, T)
            # fp32 logits/probs HBM round trip that dominates at t = 4096
            out = spatial_attention(
                jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)), 1.0 / math.sqrt(ch),
            )
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, c)
        else:
            logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
            probs = jax.nn.softmax(logits / math.sqrt(ch), axis=-1).astype(v.dtype)
            out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                       name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


class LDMUNet(nn.Module):
    in_channels: int = 8
    out_channels: int = 4
    model_channels: int = 192
    channel_mult: Sequence[int] = (1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attention_ds: Sequence[int] = (1, 2, 4, 8)
    n_heads: int = 8
    fmap_inject_blocks: Sequence[int] = (0, 4, 7, 10, 12)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, t, c_fmaps: Optional[Dict[str, jnp.ndarray]] = None):
        """x: (B, H, W, in_ch); t: (B,) timesteps; c_fmaps: {'f1'..'f5'} NHWC."""
        mc = self.model_channels
        emb = timestep_embedding(t, mc)
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_2")(jax.nn.silu(emb))

        inject = {m: f"f{i + 1}" for i, m in enumerate(self.fmap_inject_blocks)}

        hs = []
        block_id = 0

        def post(h, bid):
            if c_fmaps is not None and bid in inject:
                h = h + c_fmaps[inject[bid]].astype(h.dtype)
            return h

        h = nn.Conv(mc, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="input_0_0")(x)
        h = post(h, block_id)
        hs.append(h)
        block_id += 1

        ds = 1
        for level, mult in enumerate(self.channel_mult):
            out_ch = mc * mult
            for _ in range(self.num_res_blocks):
                h = ResBlock(out_ch, dtype=self.dtype,
                             name=f"input_{block_id}_0")(h, emb)
                if ds in self.attention_ds:
                    h = AttentionBlock(self.n_heads, dtype=self.dtype,
                                       name=f"input_{block_id}_1")(h)
                h = post(h, block_id)
                hs.append(h)
                block_id += 1
            if level + 1 < len(self.channel_mult):
                h = ResBlock(out_ch, updown=-1, dtype=self.dtype,
                             name=f"input_{block_id}_0")(h, emb)
                h = post(h, block_id)
                hs.append(h)
                block_id += 1
                ds *= 2

        h = ResBlock(h.shape[-1], dtype=self.dtype, name="middle_0")(h, emb)
        h = AttentionBlock(self.n_heads, dtype=self.dtype, name="middle_1")(h)
        h = ResBlock(h.shape[-1], dtype=self.dtype, name="middle_2")(h, emb)

        block_id = 0
        for level in reversed(range(len(self.channel_mult))):
            out_ch = mc * self.channel_mult[level]
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                li = 0
                h = ResBlock(out_ch, dtype=self.dtype,
                             name=f"output_{block_id}_{li}")(h, emb)
                li += 1
                if ds in self.attention_ds:
                    h = AttentionBlock(self.n_heads, dtype=self.dtype,
                                       name=f"output_{block_id}_{li}")(h)
                    li += 1
                if level > 0 and i == self.num_res_blocks:
                    h = ResBlock(out_ch, updown=1, dtype=self.dtype,
                                 name=f"output_{block_id}_{li}")(h, emb)
                    ds //= 2
                block_id += 1

        h = _gn("out_norm", self.dtype)(h)
        h = jax.nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       name="out_conv")(h).astype(jnp.float32)
