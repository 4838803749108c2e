"""LR multiplier schedules for LDM training.

Exact functional rebuilds of the reference schedulers
(``gen_slices/ldm/lr_scheduler.py:4-98``), as jit-traceable
``f(step) -> multiplier`` functions applied on top of ``base_lr``:

* ``warmup_cosine`` — LambdaWarmUpCosineScheduler: linear warmup
  lr_start -> lr_max, then cosine decay to lr_min over max_decay_steps.
* ``warmup_cosine2`` — LambdaWarmUpCosineScheduler2: list-configured
  repeated cycles of the same shape.
* ``warmup_linear`` — LambdaLinearScheduler: per cycle, linear warmup then
  the reference's linear decay ``f_min + (f_max-f_min)*(cycle_len-n)/cycle_len``
  (note: the decay ramp spans the whole cycle, not cycle minus warmup —
  reference ``lr_scheduler.py:88-97``).

``from_scheduler_config`` resolves the reference's ``scheduler_config``
YAML block (target + params) into one of these.
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

__all__ = [
    "warmup_cosine", "warmup_cosine2", "warmup_linear", "from_scheduler_config",
]

_Lists = Union[float, int, Sequence[float], Sequence[int]]


def warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                  lr_start: float, max_decay_steps: int):
    """LambdaWarmUpCosineScheduler (reference lr_scheduler.py:4-30)."""

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


def _as_arrays(*vals: _Lists):
    arrs = [np.atleast_1d(np.asarray(v, np.float64)) for v in vals]
    n = max(a.shape[0] for a in arrs)
    return [np.broadcast_to(a, (n,)).copy() for a in arrs]


def _cycle_split(cycle_lengths: np.ndarray):
    """cum_cycles boundaries; step n -> (cycle index, offset into cycle)."""
    cum = np.concatenate([[0.0], np.cumsum(cycle_lengths)])

    def locate(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        # reference find_in_interval: first cycle whose cum end >= n
        cyc = jnp.searchsorted(jnp.asarray(cum[1:], jnp.float32), step, side="left")
        cyc = jnp.clip(cyc, 0, len(cycle_lengths) - 1)
        return cyc, step - jnp.asarray(cum, jnp.float32)[cyc]

    return locate


def warmup_cosine2(warm_up_steps: _Lists, f_min: _Lists, f_max: _Lists,
                   f_start: _Lists, cycle_lengths: _Lists):
    """LambdaWarmUpCosineScheduler2 (reference lr_scheduler.py:36-78)."""
    wu, fmin, fmax, fstart, cl = _as_arrays(
        warm_up_steps, f_min, f_max, f_start, cycle_lengths)
    locate = _cycle_split(cl)

    def schedule(step):
        import jax.numpy as jnp

        cyc, n = locate(step)
        wu_c = jnp.asarray(wu, jnp.float32)[cyc]
        fmin_c = jnp.asarray(fmin, jnp.float32)[cyc]
        fmax_c = jnp.asarray(fmax, jnp.float32)[cyc]
        fstart_c = jnp.asarray(fstart, jnp.float32)[cyc]
        cl_c = jnp.asarray(cl, jnp.float32)[cyc]
        warm = (fmax_c - fstart_c) / jnp.maximum(wu_c, 1.0) * n + fstart_c
        t = jnp.clip((n - wu_c) / jnp.maximum(cl_c - wu_c, 1.0), 0.0, 1.0)
        cos = fmin_c + 0.5 * (fmax_c - fmin_c) * (1 + jnp.cos(t * np.pi))
        return jnp.where(n < wu_c, warm, cos)

    return schedule


def warmup_linear(warm_up_steps: _Lists, f_min: _Lists, f_max: _Lists,
                  f_start: _Lists, cycle_lengths: _Lists):
    """LambdaLinearScheduler (reference lr_scheduler.py:81-98)."""
    wu, fmin, fmax, fstart, cl = _as_arrays(
        warm_up_steps, f_min, f_max, f_start, cycle_lengths)
    locate = _cycle_split(cl)

    def schedule(step):
        import jax.numpy as jnp

        cyc, n = locate(step)
        wu_c = jnp.asarray(wu, jnp.float32)[cyc]
        fmin_c = jnp.asarray(fmin, jnp.float32)[cyc]
        fmax_c = jnp.asarray(fmax, jnp.float32)[cyc]
        fstart_c = jnp.asarray(fstart, jnp.float32)[cyc]
        cl_c = jnp.asarray(cl, jnp.float32)[cyc]
        warm = (fmax_c - fstart_c) / jnp.maximum(wu_c, 1.0) * n + fstart_c
        lin = fmin_c + (fmax_c - fmin_c) * (cl_c - n) / cl_c
        return jnp.where(n < wu_c, warm, lin)

    return schedule


_TARGETS = {
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler": warmup_cosine,
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler2": warmup_cosine2,
    "ldm.lr_scheduler.LambdaLinearScheduler": warmup_linear,
    "warmup_cosine": warmup_cosine,
    "warmup_cosine2": warmup_cosine2,
    "warmup_linear": warmup_linear,
}


def from_scheduler_config(cfg):
    """Resolve a reference-style scheduler_config block (ddpm.py:1431-1441).

    ``{"target": "ldm.lr_scheduler.LambdaLinearScheduler",
       "params": {"warm_up_steps": [100], "f_min": [1.0], ...}}``
    """
    if cfg is None:
        return None
    target = cfg["target"]
    if target not in _TARGETS:
        raise KeyError(f"unknown scheduler target {target!r}")
    params = dict(cfg.get("params") or {})
    params.pop("verbosity_interval", None)
    return _TARGETS[target](**params)
