"""LR schedules for LDM training (gen_slices/ldm/lr_scheduler.py roles).

These return multiplier schedules f(step) -> scale (applied to base_lr),
mirroring the reference's Lambda semantics:

* warmup_cosine: linear warmup lr_start -> lr_max, then cosine decay to
  lr_min over max_decay_steps (LambdaWarmUpCosineScheduler).
* warmup_linear: linear warmup then linear decay (LambdaLinearScheduler).
"""

from __future__ import annotations

import numpy as np

__all__ = ["warmup_cosine", "warmup_linear"]


def warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                  lr_start: float, max_decay_steps: int):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = jnp.clip(
            (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1), 0.0, 1.0
        )
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * np.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def warmup_linear(warm_up_steps: int, f_min: float, f_max: float,
                  f_start: float, cycle_lengths: int):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) * step / max(warm_up_steps, 1)
        t = jnp.clip(
            (step - warm_up_steps) / max(cycle_lengths - warm_up_steps, 1), 0.0, 1.0
        )
        lin = f_max + (f_min - f_max) * t
        return jnp.where(step < warm_up_steps, warm, lin)

    return schedule
