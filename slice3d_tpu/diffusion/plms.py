"""PLMS (pseudo linear multistep) sampler as a single jit-compiled lax.scan.

Update rule matches the reference (gen_slices/ldm/models/diffusion/plms.py
:173-236): eps-parameterization, eta must be 0, step 0 uses a pseudo
improved-Euler corrector (two model evals), later steps an Adams-Bashforth
combination of the raw eps history (order 2/3/4 as history fills).  The
history lives in a fixed (3, B, H, W, C) carry buffer so the whole reverse
trajectory compiles to one XLA program — no Python per step, no host sync
until the final latent; the order switch is a ``lax.switch`` over the three
coefficient combinations (the model eval itself stays outside the switch).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedule import DDIMParams

__all__ = ["plms_sample"]


def plms_sample(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    params: DDIMParams,
    rng: jax.Array,
    shape: Tuple[int, ...],
    x_T: Optional[jnp.ndarray] = None,
    guidance_scale: float = 1.0,
    eps_fn_uncond: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Run the reverse PLMS trajectory.

    Args:
      eps_fn: (x, t_batch) -> predicted noise; conditioning is closed over.
      params: DDIMParams built with eta=0 (the reference PLMS raises on
        eta != 0 — plms.py:25-26; we mirror that check).
      rng: PRNG key for the initial noise (the trajectory itself is
        deterministic).
      shape: latent shape (B, H, W, C).
      x_T: optional fixed initial noise (for golden tests).
      guidance_scale / eps_fn_uncond: classifier-free guidance
        (plms.py:180-187), same contract as :func:`ddim_sample`.

    Returns the final x_0-step latent.
    """
    import numpy as np

    if float(np.max(np.abs(np.asarray(params.sigmas)))) != 0.0:
        raise ValueError("ddim_eta must be 0 for PLMS (plms.py:25-26)")
    use_cfg = eps_fn_uncond is not None and guidance_scale != 1.0
    rng, init_key = jax.random.split(rng)
    x = x_T if x_T is not None else jax.random.normal(init_key, shape, jnp.float32)
    x = x.astype(jnp.float32)

    # descending time order (reference time_range = flip(ddim_timesteps))
    steps = jnp.asarray(params.timesteps)[::-1]
    a_t = jnp.asarray(params.alphas)[::-1]
    a_prev = jnp.asarray(params.alphas_prev)[::-1]
    sqrt_1m_a = jnp.asarray(params.sqrt_one_minus_alphas)[::-1]
    n = params.num_steps
    b = shape[0]

    def model_eps(x, t_step):
        tb = jnp.full((b,), t_step, jnp.int32)
        eps = eps_fn(x, tb)
        if use_cfg:
            eps_u = eps_fn_uncond(x, tb)
            eps = eps_u + guidance_scale * (eps - eps_u)
        return eps

    def update(x, eps, a, ap, s1m):
        # get_x_prev_and_pred_x0 with sigma = 0 (plms.py:201-216)
        pred_x0 = (x - s1m * eps) / jnp.sqrt(a)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - ap, 0.0)) * eps
        return jnp.sqrt(ap) * pred_x0 + dir_xt

    # step 0: pseudo improved Euler — e' = (e_t + eps(x', t_next)) / 2,
    # both updates at index 0's schedule row (plms.py:222-226)
    e0 = model_eps(x, steps[0])
    x_eul = update(x, e0, a_t[0], a_prev[0], sqrt_1m_a[0])
    t_next0 = steps[jnp.minimum(1, n - 1)]
    e0_next = model_eps(x_eul, t_next0)
    x = update(x, (e0 + e0_next) / 2.0, a_t[0], a_prev[0], sqrt_1m_a[0])
    if n == 1:
        return x

    hist0 = jnp.stack([e0, jnp.zeros_like(e0), jnp.zeros_like(e0)])

    def body(carry, scan):
        x, hist = carry
        i, t_step, a, ap, s1m = scan
        e_t = model_eps(x, t_step)

        def ab2(_):
            return (3.0 * e_t - hist[0]) / 2.0

        def ab3(_):
            return (23.0 * e_t - 16.0 * hist[0] + 5.0 * hist[1]) / 12.0

        def ab4(_):
            return (55.0 * e_t - 59.0 * hist[0] + 37.0 * hist[1]
                    - 9.0 * hist[2]) / 24.0

        order_ix = jnp.minimum(i, 3) - 1  # i>=1 here: 0 -> AB2, 1 -> AB3, 2+ -> AB4
        e_prime = jax.lax.switch(order_ix, (ab2, ab3, ab4), None)
        x = update(x, e_prime, a, ap, s1m)
        hist = jnp.stack([e_t, hist[0], hist[1]])
        return (x, hist), None

    xs = (jnp.arange(1, n, dtype=jnp.int32), steps[1:], a_t[1:], a_prev[1:],
          sqrt_1m_a[1:])
    (x, _), _ = jax.lax.scan(body, (x, hist0), xs)
    return x
