"""DDIM golden trajectory: our lax.scan sampler vs an independent torch
implementation of the reference sampling loop on the same tiny UNet.

Both sides share the UNet weights (via ldm_unet conversion) and the fixed
initial noise; the torch side recomputes schedule + update rule directly
from the reference formulas (ldm/models/diffusion/ddim.py:24-53,110-201 and
ldm/modules/diffusionmodules/util.py:21-75), so a shared misreading in our
DDIMParams would be caught here.  eta=1.0 with temperature=0 keeps the
trajectory deterministic while exercising the eta-sigma path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_refs import TADMUNet  # noqa: E402
from slice3d_tpu.convert import torch_import  # noqa: E402
from slice3d_tpu.diffusion.ddim import ddim_sample  # noqa: E402
from slice3d_tpu.diffusion.schedule import DDIMParams, DiffusionSchedule  # noqa: E402
from slice3d_tpu.models.ldm_unet import LDMUNet  # noqa: E402

T, S, ETA = 100, 10, 1.0
LINEAR_START, LINEAR_END = 0.0015, 0.0155


def torch_ddim_trajectory(tw, x_T):
    # make_beta_schedule("linear") — util.py:21-30
    betas = (np.linspace(LINEAR_START ** 0.5, LINEAR_END ** 0.5, T,
                         dtype=np.float64) ** 2)
    alphacums = np.cumprod(1.0 - betas)
    # make_ddim_timesteps uniform + the reference's +1 shift — util.py:46-60
    ddim_timesteps = np.asarray(list(range(0, T, T // S))) + 1
    # make_ddim_sampling_parameters — util.py:63-75
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray(
        [alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = ETA * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))

    x = torch.from_numpy(x_T.copy())
    time_range = np.flip(ddim_timesteps)
    traj = []
    with torch.no_grad():
        for i, step in enumerate(time_range):
            index = S - i - 1
            ts = torch.full((x.shape[0],), int(step), dtype=torch.long)
            e_t = tw(x, ts)
            a_t = float(alphas[index])
            a_prev = float(alphas_prev[index])
            sigma_t = float(sigmas[index])
            sqrt_one_minus_at = float(np.sqrt(1 - a_t))
            # p_sample_ddim — ddim.py:162-201 (temperature 0: no noise term)
            pred_x0 = (x - sqrt_one_minus_at * e_t) / np.sqrt(a_t)
            dir_xt = np.sqrt(1.0 - a_prev - sigma_t ** 2) * e_t
            x = np.sqrt(a_prev) * pred_x0 + dir_xt
            traj.append(x.numpy().copy())
    return traj


@pytest.mark.slow
def test_ddim_golden_trajectory():
    torch.manual_seed(21)
    cfg = dict(in_ch=4, out_ch=4, mc=32, mult=(1, 2), nres=1,
               attn_ds=(2,), n_heads=4)
    tw = TADMUNet(**cfg).eval()

    rng = np.random.default_rng(9)
    x_T = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)  # NCHW for torch

    t_traj = torch_ddim_trajectory(tw, x_T)

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
    params = DDIMParams.create(schedule, S, ETA)
    x_nhwc = jnp.asarray(np.transpose(x_T, (0, 2, 3, 1)))
    out = ddim_sample(eps_fn, params, jax.random.PRNGKey(0), x_nhwc.shape,
                      x_T=x_nhwc, temperature=0.0)
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, t_traj[-1], atol=1e-4, rtol=1e-3)
