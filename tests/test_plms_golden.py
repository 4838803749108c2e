"""PLMS golden trajectory: our lax.scan sampler vs an independent torch
implementation of the reference PLMS loop on the same tiny UNet.

Both sides share the UNet weights (via ldm_unet conversion) and the fixed
initial noise; the torch side recomputes schedule + update rule directly
from the reference formulas (gen_slices/ldm/models/diffusion/plms.py
:24-57,120-236: improved-Euler first step, Adams-Bashforth order 2/3/4 as
the raw-eps history fills, eta pinned to 0).  S=8 exercises every order
branch including steady-state AB4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_refs import TADMUNet  # noqa: E402
from slice3d_tpu.convert import torch_import  # noqa: E402
from slice3d_tpu.diffusion.plms import plms_sample  # noqa: E402
from slice3d_tpu.diffusion.schedule import DDIMParams, DiffusionSchedule  # noqa: E402
from slice3d_tpu.models.ldm_unet import LDMUNet  # noqa: E402

T, S = 100, 10
LINEAR_START, LINEAR_END = 0.0015, 0.0155


def torch_plms_trajectory(tw, x_T):
    # make_beta_schedule("linear") — util.py:21-30
    betas = (np.linspace(LINEAR_START ** 0.5, LINEAR_END ** 0.5, T,
                         dtype=np.float64) ** 2)
    alphacums = np.cumprod(1.0 - betas)
    # make_ddim_timesteps uniform + the reference's +1 shift — util.py:46-60
    ddim_timesteps = np.asarray(list(range(0, T, T // S))) + 1
    # make_ddim_sampling_parameters (eta=0) — util.py:63-75
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray(
        [alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())

    def update(x, e, index):
        # get_x_prev_and_pred_x0, sigma = 0 — plms.py:201-216
        a_t = float(alphas[index])
        a_prev = float(alphas_prev[index])
        pred_x0 = (x - float(np.sqrt(1 - a_t)) * e) / np.sqrt(a_t)
        dir_xt = float(np.sqrt(1.0 - a_prev)) * e
        return np.sqrt(a_prev) * pred_x0 + dir_xt

    x = torch.from_numpy(x_T.copy())
    time_range = np.flip(ddim_timesteps)
    n = len(ddim_timesteps)
    old_eps = []
    b = x.shape[0]
    with torch.no_grad():
        for i, step in enumerate(time_range):
            index = n - i - 1
            ts = torch.full((b,), int(step), dtype=torch.long)
            e_t = tw(x, ts)
            if len(old_eps) == 0:
                # pseudo improved Euler — plms.py:222-226
                x_eul = update(x, e_t, index)
                step_next = int(time_range[min(i + 1, n - 1)])
                ts_next = torch.full((b,), step_next, dtype=torch.long)
                e_next = tw(x_eul, ts_next)
                e_prime = (e_t + e_next) / 2
            elif len(old_eps) == 1:
                e_prime = (3 * e_t - old_eps[-1]) / 2
            elif len(old_eps) == 2:
                e_prime = (23 * e_t - 16 * old_eps[-1] + 5 * old_eps[-2]) / 12
            else:
                e_prime = (55 * e_t - 59 * old_eps[-1] + 37 * old_eps[-2]
                           - 9 * old_eps[-3]) / 24
            x = update(x, e_prime, index)
            old_eps.append(e_t)
            if len(old_eps) >= 4:
                old_eps.pop(0)
    return x.numpy()


@pytest.mark.slow
def test_plms_golden_trajectory():
    torch.manual_seed(33)
    cfg = dict(in_ch=4, out_ch=4, mc=32, mult=(1, 2), nres=1,
               attn_ds=(2,), n_heads=4)
    tw = TADMUNet(**cfg).eval()

    rng = np.random.default_rng(11)
    x_T = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)  # NCHW for torch

    golden = torch_plms_trajectory(tw, x_T)

    variables = torch_import.ldm_unet(
        tw.state_dict(), "", model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, attention_ds=(2,),
    )
    model = LDMUNet(
        in_channels=4, out_channels=4, model_channels=32,
        channel_mult=(1, 2), num_res_blocks=1, attention_ds=(2,),
        n_heads=4, fmap_inject_blocks=(),
    )

    def eps_fn(x, t):
        return model.apply(variables, x, t, None)

    schedule = DiffusionSchedule.create(T, "linear", LINEAR_START, LINEAR_END)
    params = DDIMParams.create(schedule, S, 0.0)
    x_nhwc = jnp.asarray(np.transpose(x_T, (0, 2, 3, 1)))
    out = plms_sample(eps_fn, params, jax.random.PRNGKey(0), x_nhwc.shape,
                      x_T=x_nhwc)
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-3)


def test_plms_rejects_eta():
    schedule = DiffusionSchedule.create(T, "linear", LINEAR_START, LINEAR_END)
    params = DDIMParams.create(schedule, S, 1.0)
    with pytest.raises(ValueError):
        plms_sample(lambda x, t: x, params, jax.random.PRNGKey(0),
                    (1, 4, 4, 4))


def test_plms_single_step():
    # n=1 exercises the improved-Euler-only path (t_next clamps to t_0)
    schedule = DiffusionSchedule.create(T, "linear", LINEAR_START, LINEAR_END)
    params = DDIMParams.create(schedule, 1, 0.0)
    out = plms_sample(lambda x, t: jnp.zeros_like(x), params,
                      jax.random.PRNGKey(0), (1, 4, 4, 2))
    assert out.shape == (1, 4, 4, 2)
    assert np.isfinite(np.asarray(out)).all()
