"""LPIPS perceptual distance (taming/richzhang `lpips.LPIPS`, vgg variant).

Functional rebuild of the LPIPS net the reference VAE finetune loss uses
(``gen_slices/ldm/modules/losses/contperceptual.py:7-18`` via
``taming.modules.losses.lpips.LPIPS``):

1. Scaling layer: map [-1, 1] inputs with the published shift/scale
   constants (NOT plain ImageNet renorm).
2. Plain VGG16 features, taps at relu1_2 / relu2_2 / relu3_3 / relu4_3 /
   relu5_3 (post-ReLU; channels 64/128/256/512/512).
3. Per tap: channel-unit-normalize both images' features, squared diff,
   learned 1x1 "lin" conv to 1 channel, spatial average.
4. Sum the five tap scores -> per-sample distance.

Pretrained weights (torchvision vgg16 + the LPIPS lin heads) are converted
with :func:`slice3d_tpu.convert.torch_import.lpips_model`.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import max_pool_2x2
from .vgg import _VGG16_STAGES

__all__ = ["LPIPS", "lpips_distance"]

# ScalingLayer constants (richzhang lpips.py ScalingLayer)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """Plain (no-BN) VGG16 trunk returning the 5 post-ReLU LPIPS taps."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        taps = []
        idx = 0
        for stage, widths in enumerate(_VGG16_STAGES):
            if stage > 0:
                x = max_pool_2x2(x)
            for w in widths:
                x = nn.Conv(
                    w, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name=f"conv{idx}",
                )(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)  # relu{stage+1}_{last}
        return taps


def _unit_normalize(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(feat * feat, axis=-1, keepdims=True))
    return feat / (norm + eps)


class LPIPS(nn.Module):
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y: (B, H, W, 3) in [-1, 1] -> per-sample distance (B,)."""
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        net = VGG16Features(dtype=self.dtype, name="net")
        tx = net((x - shift) / scale)
        ty = net((y - shift) / scale)
        val = jnp.zeros((x.shape[0],), x.dtype)
        for i, (fx, fy) in enumerate(zip(tx, ty)):
            d = (_unit_normalize(fx) - _unit_normalize(fy)) ** 2
            score = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{i}",
            )(d)
            val = val + score.mean(axis=(1, 2))[:, 0]
        return val


def lpips_distance(lpips_params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-sample LPIPS distance with frozen converted weights."""
    return LPIPS().apply({"params": lpips_params}, x, y)
