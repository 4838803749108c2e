"""DPM-Solver++(2M) sampler: ODE convergence + pipeline integration.

DDIM with eta=0 and DPM-Solver++ discretize the SAME probability-flow
ODE, so for any smooth eps-model both must converge to one endpoint as
steps grow — and the second-order solver must get there in far fewer
steps.  A 200-step DDIM trajectory serves as the near-exact reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slice3d_tpu.diffusion.ddim import ddim_sample
from slice3d_tpu.diffusion.dpm import dpm_solver_sample
from slice3d_tpu.diffusion.schedule import DDIMParams, DiffusionSchedule


def _toy_eps_fn():
    """A smooth, nonlinear, t-dependent eps model (fixed random conv)."""
    w = jax.random.normal(jax.random.PRNGKey(7), (3, 3, 4, 4)) * 0.3

    def eps_fn(x, t):
        h = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        temb = jnp.sin(t.astype(jnp.float32) / 100.0)[:, None, None, None]
        return jnp.tanh(h) + 0.1 * temb * x

    return eps_fn


def _matched_params(schedule, n, t_max=996):
    """Node sets with a FIXED start time: the uniform rule's start node
    shifts with n (996/991/981...), which changes the initial condition
    and would swamp solver error in a convergence comparison."""
    steps = np.unique(np.round(np.linspace(1, t_max, n)).astype(int))
    ac = schedule.alphas_cumprod.astype(np.float64)
    alphas = ac[steps]
    alphas_prev = np.concatenate([[ac[0]], ac[steps[:-1]]])
    f32 = lambda x: np.asarray(x, np.float32)
    return DDIMParams(
        timesteps=np.asarray(steps, np.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sqrt_one_minus_alphas=f32(np.sqrt(1 - alphas)),
        sigmas=f32(np.zeros_like(alphas)),
    )


def test_dpm_converges_to_the_ddim_ode():
    schedule = DiffusionSchedule.create(1000, "linear", 0.0015, 0.0155)
    eps_fn = _toy_eps_fn()
    shape = (1, 8, 8, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    rng = jax.random.PRNGKey(2)

    def run_ddim(n):
        return ddim_sample(eps_fn, _matched_params(schedule, n), rng, shape,
                           x_T=x_T)

    def run_dpm(n):
        return dpm_solver_sample(eps_fn, _matched_params(schedule, n), rng,
                                 shape, x_T=x_T)

    ref = run_ddim(200)  # near-exact ODE solution

    def rel_err(x):
        return float(jnp.linalg.norm(x - ref) / jnp.linalg.norm(ref))

    e_dpm30, e_dpm10 = rel_err(run_dpm(30)), rel_err(run_dpm(10))
    e_ddim30 = rel_err(run_ddim(30))

    # 30-step DPM lands on the 200-step DDIM endpoint
    assert e_dpm30 < 0.02, e_dpm30
    # second order beats first order at equal step count
    assert e_dpm30 < e_ddim30, (e_dpm30, e_ddim30)
    # convergence: more steps -> smaller error
    assert e_dpm30 < e_dpm10, (e_dpm30, e_dpm10)


@pytest.mark.nightly
def test_sample_slices_dpm(trainer_mod=None):
    """sampler='dpm' runs through the full LDM sampling path."""
    from tests.test_ldm import batch as _  # noqa: F401 (fixture source)
    from tests.test_ldm import tiny_module
    from slice3d_tpu.train.train_ldm import LDMTrainer

    trainer = LDMTrainer(img_size=16, batch_size=2, timesteps=20,
                         module=tiny_module())
    state = trainer.init_state(0)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(2, 13, 16, 16, 3)).astype(np.float32).clip(-1, 1),
        "img_ipt_view": rng.normal(size=(2, 16, 16, 3)).astype(np.float32).clip(-1, 1),
    }
    gen = trainer.sample_slices(state, batch, ddim_steps=4, sampler="dpm",
                                rng=jax.random.PRNGKey(0))
    assert gen.shape == (2, 12, 16, 16, 3)
    assert np.isfinite(gen).all()
    with pytest.raises(ValueError, match="sampler"):
        trainer.sample_slices(state, batch, ddim_steps=4, sampler="nope")
