"""PatchGAN discriminator + adversarial losses for VAE finetuning.

Role of the reference's ``LPIPSWithDiscriminator``
(gen_slices/ldm/modules/losses/contperceptual.py:7-111): an N-layer
PatchGAN discriminator with hinge losses, a KL term, and a perceptual
term.  The reference's LPIPS depends on pretrained AlexNet weights pulled
from the taming package; here the perceptual term uses the same VGG19
feature distance as the regression pipeline (weights importable via
slice3d_tpu.convert.torch_import.vgg19_features).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm

__all__ = [
    "NLayerDiscriminator",
    "patchgan_logits_size",
    "hinge_d_loss",
    "generator_loss",
    "adaptive_disc_weight",
]


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN: 4x4 convs, stride 2 (last stride 1), LeakyReLU 0.2."""

    ndf: int = 64
    n_layers: int = 3
    train_bn: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        ch = self.ndf
        for i in range(1, self.n_layers + 1):
            ch = self.ndf * min(2 ** i, 8)
            stride = 2 if i < self.n_layers else 1
            h = nn.Conv(ch, (4, 4), strides=(stride, stride),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(h)
            h = BatchNorm(use_running_average=not self.train_bn,
                          dtype=self.dtype, name=f"bn{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       name="conv_out")(h)


def patchgan_logits_size(img_size: int, n_layers: int = 3) -> int:
    """Spatial size of ``NLayerDiscriminator`` logits for a square input.

    Every conv is k=4 p=1; strides are 2 except the last body conv and
    conv_out.  A non-positive return means the patch hierarchy collapsed
    (input too small for ``n_layers``) and the logits tensor would be
    EMPTY — mean-reducing it yields NaN, so callers must shrink
    ``n_layers`` first.
    """
    s = (img_size - 2) // 2 + 1  # conv0, stride 2
    for i in range(1, n_layers + 1):
        stride = 2 if i < n_layers else 1
        s = (s - 2) // stride + 1
    return s - 1  # conv_out, stride 1


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def generator_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(logits_fake)


def adaptive_disc_weight(nll_grad_norm: jnp.ndarray, g_grad_norm: jnp.ndarray,
                         disc_factor: float = 1.0) -> jnp.ndarray:
    """||grad nll|| / ||grad g|| wrt the decoder's last layer, clipped to
    [0, 1e4] (reference contperceptual.py calculate_adaptive_weight)."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jnp.clip(w, 0.0, 1e4) * disc_factor
