"""Exponential moving average of parameters (reference ldm/modules/ema.py).

Warmup rule: effective decay = min(decay, (1 + step) / (10 + step)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_update"]


def ema_update(ema_params, params, step, decay: float = 0.9999):
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )
