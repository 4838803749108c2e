"""VGG19 perceptual loss (reference: reg_slices/src/vgg_perceptual_loss.py).

L1 distance between 5 VGG19 feature taps of prediction and target, weighted
[1/2.6, 1/4.8, 1/3.7, 1/5.6, 10/1.5], on ImageNet-renormalized images that
arrive in [-1, 1].  The VGG19 parameters are frozen (treated as constants —
pass them with ``jax.lax.stop_gradient`` semantics by simply not including
them in the optimizer).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from .vgg import VGG19Features, imagenet_renorm

__all__ = ["PERCEPTUAL_WEIGHTS", "perceptual_loss"]

PERCEPTUAL_WEIGHTS = (1.0 / 2.6, 1.0 / 4.8, 1.0 / 3.7, 1.0 / 5.6, 10.0 / 1.5)


def perceptual_loss(
    vgg19_params,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    *,
    dtype: Optional[Any] = None,
) -> jnp.ndarray:
    """pred/target: (N, H, W, 3) in [-1, 1]. Returns scalar loss."""
    model = VGG19Features(dtype=dtype)
    xs = model.apply(vgg19_params, imagenet_renorm(pred))
    ys = model.apply(vgg19_params, imagenet_renorm(target))
    loss = 0.0
    for w, x, y in zip(PERCEPTUAL_WEIGHTS, xs, ys):
        loss = loss + w * jnp.mean(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
    return loss
