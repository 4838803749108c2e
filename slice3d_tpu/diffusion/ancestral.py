"""Ancestral DDPM sampling + progressive denoising as one lax.scan.

TPU-native equivalent of the reference's ancestral samplers
(gen_slices/ldm/models/diffusion/ddpm.py:1151-1238 ``p_mean_variance`` /
``p_sample`` / ``progressive_denoising`` and ddpm.py:1270-1336
``p_sample_loop`` / ``sample``): eps-parameterization, posterior-mean
update with clipped log-variance, no noise at t == 0, optional [-1, 1]
clipping of the x0 estimate and scalar temperature on the injected noise.

The whole reverse trajectory compiles to a single XLA program.  The
reference's Python-side intermediates list (``i % log_every_t == 0``)
becomes a fixed-size device buffer written by in-bounds scatter slots
precomputed on host — non-log steps target an out-of-range slot that the
scatter drops, so no per-step host sync and no dynamic shapes.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import DiffusionSchedule

__all__ = ["ddpm_sample"]


def _log_slots(timesteps: int, log_every_t: int) -> Tuple[np.ndarray, int]:
    """Per-scan-step intermediate buffer slot (descending t order).

    Reference logging rule (ddpm.py:1312, 1264): record when
    ``i % log_every_t == 0 or i == timesteps - 1`` where ``i`` is the ddpm
    step.  Steps that don't log get slot ``n_log`` — out of bounds for the
    buffer, dropped by the scatter.
    """
    ts = np.arange(timesteps - 1, -1, -1)  # scan order: T-1 .. 0
    is_log = (ts % log_every_t == 0) | (ts == timesteps - 1)
    slots = np.where(is_log, np.cumsum(is_log) - 1, int(is_log.sum()))
    return slots.astype(np.int32), int(is_log.sum())


def ddpm_sample(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: Tuple[int, ...],
    *,
    x_T: Optional[jnp.ndarray] = None,
    timesteps: Optional[int] = None,
    clip_denoised: bool = False,
    temperature: float = 1.0,
    log_every_t: Optional[int] = None,
    record: str = "x",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run the full reverse ancestral (DDPM) trajectory.

    Args:
      eps_fn: (x, t_batch) -> predicted noise; conditioning closed over.
      schedule: full DiffusionSchedule (all T steps are walked).
      rng: PRNG key (initial noise + per-step posterior noise).
      shape: latent shape (B, H, W, C).
      x_T: optional fixed initial noise (golden tests / inpainting starts).
      timesteps: walk only the lowest `timesteps` steps (reference
        ``start_T``/``timesteps`` clamp, ddpm.py:1288-1291); default all.
      clip_denoised: clamp the x0 estimate to [-1, 1] (ddpm.py:1169).
      temperature: scalar multiplier on the injected posterior noise.
      log_every_t: when set, also return stacked intermediates per the
        reference's logging rule: (n_log + 1, B, H, W, C) for record="x"
        (row 0 is the seeded initial noise, mirroring the reference's
        ``intermediates = [img]``), (n_log, B, H, W, C) for "pred_x0".
      record: which intermediate to log — "x" (the chain state, as
        ``p_sample_loop``) or "pred_x0" (the running x0 estimate, as
        ``progressive_denoising``).

    Returns (x_0, intermediates-or-None).
    """
    if record not in ("x", "pred_x0"):
        raise ValueError(record)
    t_total = schedule.num_timesteps
    t_run = t_total if timesteps is None else min(timesteps, t_total)

    rng, init_key = jax.random.split(rng)
    x = x_T if x_T is not None else jax.random.normal(init_key, shape, jnp.float32)

    ts = jnp.arange(t_run - 1, -1, -1, dtype=jnp.int32)
    sr_ac = jnp.asarray(schedule.sqrt_recip_alphas_cumprod)
    srm1_ac = jnp.asarray(schedule.sqrt_recipm1_alphas_cumprod)
    coef1 = jnp.asarray(schedule.posterior_mean_coef1)
    coef2 = jnp.asarray(schedule.posterior_mean_coef2)
    log_var = jnp.asarray(schedule.posterior_log_variance_clipped)
    keys = jax.random.split(rng, t_run)

    if log_every_t:
        slots, n_log = _log_slots(t_run, log_every_t)
        buf0 = jnp.zeros((n_log,) + tuple(shape), jnp.float32)
        slots = jnp.asarray(slots)
    else:
        buf0 = None
        slots = jnp.zeros((t_run,), jnp.int32)

    b = shape[0]

    def body(carry, scan):
        x, buf = carry
        t, slot, key = scan
        eps = eps_fn(x, jnp.full((b,), t, jnp.int32))
        # predict_start_from_noise (ddpm.py:217-221)
        x0 = sr_ac[t] * x - srm1_ac[t] * eps
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        # q_posterior mean + clipped log-variance (ddpm.py:223-230)
        mean = coef1[t] * x0 + coef2[t] * x
        noise = jax.random.normal(key, x.shape, x.dtype) * temperature
        nonzero = (t > 0).astype(x.dtype)
        x_next = mean + nonzero * jnp.exp(0.5 * log_var[t]) * noise
        if buf is not None:
            rec = x_next if record == "x" else x0
            buf = buf.at[slot].set(rec, mode="drop")
        return (x_next, buf), None

    x0_init = x
    (x, buf), _ = jax.lax.scan(body, (x, buf0), (ts, slots, keys))
    if buf is not None and record == "x":
        # p_sample_loop seeds its intermediates with the initial noise
        # (ddpm.py:1284 ``intermediates = [img]``); progressive_denoising
        # starts empty (ddpm.py:1232).
        buf = jnp.concatenate([x0_init[None].astype(buf.dtype), buf], axis=0)
    return x, buf
