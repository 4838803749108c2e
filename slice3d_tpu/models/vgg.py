"""VGG backbones (flax, NHWC) used across the framework.

``VGG16BNBackbone`` reproduces the multi-scale tap structure the reference
models cut out of torchvision's vgg16_bn feature stack: the taps are the
*pre-BatchNorm* outputs of the last conv in each of the five stages
(reference: reg_slices/src/vgg16bn_feats.py:31-36 slices features at
[:4], [4:11], [11:21], [21:31], [31:41]), plus the fully processed /32 block
([41:44]) feeding a 128-d global head.

``VGG19Features`` provides the five perceptual-loss taps used by
VGGPerceptualLoss (reference: reg_slices/src/vgg_perceptual_loss.py:18-27 —
post-ReLU conv1_2/2_2/3_2/4_2/5_2 activations of plain vgg19).

Weights are converted from torch checkpoints with
:mod:`slice3d_tpu.convert.torch_import`; random init is supported for
training from scratch and for tests.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import BatchNorm, max_pool_2x2

__all__ = ["VGG16BNBackbone", "VGG19Features", "IMAGENET_MEAN", "IMAGENET_STD"]

# Stage widths of VGG config "D" (vgg16) / "E" (vgg19).
_VGG16_STAGES: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512)
)
_VGG19_STAGES: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256, 256), (512, 512, 512, 512), (512, 512, 512, 512)
)

# numpy on purpose: module-level jnp.array would initialize the XLA
# backend at import time (breaking jax.distributed.initialize, which
# must run first in multi-host setups)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_renorm(x: jnp.ndarray) -> jnp.ndarray:
    """Map images from [-1, 1] to ImageNet-normalized, NHWC."""
    x = (x + 1.0) * 0.5
    return (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)


class VGG16BNBackbone(nn.Module):
    """VGG16-BN trunk returning 5 pre-BN taps (+ optional /32 final block).

    Taps (for 128x128 input): 64@128, 128@64, 256@32, 512@16, 512@8.
    ``final`` (if requested): 512@4 = BN+ReLU+pool of the last tap.

    Param names follow the conv index within the trunk (conv0..conv12 /
    bn0..bn12) so checkpoint conversion is a flat positional mapping.
    """

    with_final: bool = True
    train_bn: bool = False  # True => use batch stats (training mode)
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: Optional[bool] = None
                 ) -> Tuple[Sequence[jnp.ndarray], Optional[jnp.ndarray]]:
        train_bn = self.train_bn if train is None else train
        taps = []
        idx = 0
        for stage, widths in enumerate(_VGG16_STAGES):
            for j, w in enumerate(widths):
                x = nn.Conv(
                    w, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"conv{idx}"
                )(x)
                if j + 1 == len(widths):
                    taps.append(x)  # pre-BN tap, matching the reference cut
                x = BatchNorm(
                    use_running_average=not train_bn,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"bn{idx}",
                )(x)
                x = nn.relu(x)
                idx += 1
            if stage + 1 < len(_VGG16_STAGES):
                x = max_pool_2x2(x)
        final = max_pool_2x2(x) if self.with_final else None
        return taps, final


class VGG19Features(nn.Module):
    """Plain VGG19 trunk returning the 5 perceptual taps.

    The reference slices vgg19 at pre-ReLU conv outputs, but because
    torchvision uses ``ReLU(inplace=True)``, the tensors it keeps for taps
    conv1_2..conv4_2 are mutated to their *post-ReLU* values by the time the
    loss reads them; only the final tap (conv5_2, never fed further) stays
    pre-ReLU.  We reproduce that as-executed semantics.  Computation stops
    at conv5_2; later convs never influence the loss.
    """

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        taps = []
        idx = 0
        for stage, widths in enumerate(_VGG19_STAGES):
            for j, w in enumerate(widths):
                x = nn.Conv(
                    w, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"conv{idx}"
                )(x)
                idx += 1
                if j == 1 and stage == len(_VGG19_STAGES) - 1:
                    taps.append(x)  # conv5_2: the one genuinely pre-ReLU tap
                    return taps
                x = nn.relu(x)
                if j == 1:
                    taps.append(x)  # post-ReLU (torch in-place mutation)
            x = max_pool_2x2(x)
        return taps
