"""DDIM sampler as a single jit-compiled lax.scan.

Update rule matches the reference (gen_slices/ldm/models/diffusion/ddim.py
:162-201): eps-parameterization, eta-scaled stochasticity, no clipping.
The whole reverse trajectory compiles to one XLA program — no Python per
step, no host sync until the final latent.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedule import DDIMParams

__all__ = ["ddim_sample"]


def ddim_sample(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    params: DDIMParams,
    rng: jax.Array,
    shape: Tuple[int, ...],
    x_T: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    guidance_scale: float = 1.0,
    eps_fn_uncond: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Run the reverse DDIM trajectory.

    Args:
      eps_fn: (x, t_batch) -> predicted noise; conditioning is closed over.
      params: DDIMParams (ascending step order; the scan reverses).
      rng: PRNG key (initial noise + per-step noise when eta > 0).
      shape: latent shape (B, H, W, C).
      x_T: optional fixed initial noise (for golden tests).
      guidance_scale / eps_fn_uncond: classifier-free guidance (reference
        ddim.py:168-175): eps = e_uncond + scale * (e_cond - e_uncond).
        The reference runs one 2B-batched model call on
        concat([uncond, cond]); callers wanting that MXU-friendly batching
        pass an ``eps_fn`` that does it internally and leave this off.

    Returns the final x_0-step latent.
    """
    use_cfg = eps_fn_uncond is not None and guidance_scale != 1.0
    rng, init_key = jax.random.split(rng)
    x = x_T if x_T is not None else jax.random.normal(init_key, shape, jnp.float32)

    # descending time order
    steps = jnp.asarray(params.timesteps)[::-1]
    a_t = jnp.asarray(params.alphas)[::-1]
    a_prev = jnp.asarray(params.alphas_prev)[::-1]
    sqrt_1m_a = jnp.asarray(params.sqrt_one_minus_alphas)[::-1]
    sigma = jnp.asarray(params.sigmas)[::-1]
    keys = jax.random.split(rng, params.num_steps)

    b = shape[0]

    def body(x, scan):
        t_step, a, ap, s1m, sg, key = scan
        tb = jnp.full((b,), t_step, jnp.int32)
        eps = eps_fn(x, tb)
        if use_cfg:
            eps_u = eps_fn_uncond(x, tb)
            eps = eps_u + guidance_scale * (eps - eps_u)
        pred_x0 = (x - s1m * eps) / jnp.sqrt(a)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - ap - sg ** 2, 0.0)) * eps
        noise = sg * jax.random.normal(key, x.shape, x.dtype) * temperature
        return jnp.sqrt(ap) * pred_x0 + dir_xt + noise, None

    x, _ = jax.lax.scan(body, x, (steps, a_t, a_prev, sqrt_1m_a, sigma, keys))
    return x
