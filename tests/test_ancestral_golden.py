"""Ancestral (DDPM) sampler golden trajectories vs an independent torch
replay of the reference loops.

The torch side re-derives the posterior tables and update rules directly
from the reference formulas (gen_slices/ldm/models/diffusion/ddpm.py:
217-230 predict_start/q_posterior, 1151-1212 p_mean_variance/p_sample,
1270-1306 p_sample_loop, 1213-1268 progressive_denoising), sharing UNet
weights with our flax twin via the converter.  temperature=0 keeps the
trajectory deterministic while still exercising every posterior
coefficient except the (separately pinned) noise amplitude.

Also pins the DDIM classifier-free-guidance branch (ddim.py:168-175)
against a numpy replay.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_refs import TADMUNet  # noqa: E402
from slice3d_tpu.convert import torch_import  # noqa: E402
from slice3d_tpu.diffusion.ancestral import ddpm_sample, _log_slots  # noqa: E402
from slice3d_tpu.diffusion.ddim import ddim_sample  # noqa: E402
from slice3d_tpu.diffusion.schedule import DDIMParams, DiffusionSchedule  # noqa: E402
from slice3d_tpu.models.ldm_unet import LDMUNet  # noqa: E402

T = 20
LINEAR_START, LINEAR_END = 0.0015, 0.0155
LOG_EVERY = 6


def _tables():
    betas = (np.linspace(LINEAR_START ** 0.5, LINEAR_END ** 0.5, T,
                         dtype=np.float64) ** 2)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = betas * (1 - ac_prev) / (1 - ac)
    return {
        "sqrt_recip_ac": np.sqrt(1 / ac),
        "sqrt_recipm1_ac": np.sqrt(1 / ac - 1),
        "coef1": betas * np.sqrt(ac_prev) / (1 - ac),
        "coef2": (1 - ac_prev) * np.sqrt(alphas) / (1 - ac),
        "log_var": np.log(np.maximum(post_var, 1e-20)),
    }


def torch_ancestral(tw, x_T, clip_denoised, record):
    """Reference p_sample_loop / progressive_denoising at temperature 0."""
    tb = _tables()
    x = torch.from_numpy(x_T.copy())
    inter = [x.numpy().copy()] if record == "x" else []
    with torch.no_grad():
        for i in range(T - 1, -1, -1):
            ts = torch.full((x.shape[0],), i, dtype=torch.long)
            eps = tw(x, ts)
            x0 = tb["sqrt_recip_ac"][i] * x - tb["sqrt_recipm1_ac"][i] * eps
            if clip_denoised:
                x0 = x0.clamp(-1.0, 1.0)
            mean = tb["coef1"][i] * x0 + tb["coef2"][i] * x
            x = mean  # temperature 0: the noise term vanishes
            if i % LOG_EVERY == 0 or i == T - 1:
                inter.append((x if record == "x" else x0).numpy().copy())
    return x.numpy(), np.stack(inter)


def _make_pair():
    torch.manual_seed(7)
    cfg = dict(in_ch=4, out_ch=4, mc=32, mult=(1, 2), nres=1,
               attn_ds=(2,), n_heads=4)
    tw = TADMUNet(**cfg).eval()
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

    return tw, eps_fn


@pytest.mark.slow
@pytest.mark.parametrize("clip,record", [(False, "x"), (True, "pred_x0")])
def test_ancestral_golden(clip, record):
    tw, eps_fn = _make_pair()
    rng = np.random.default_rng(3)
    x_T = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)  # NCHW

    t_final, t_inter = torch_ancestral(tw, x_T, clip, record)

    schedule = DiffusionSchedule.create(T, "linear", LINEAR_START, LINEAR_END)
    x_nhwc = jnp.asarray(np.transpose(x_T, (0, 2, 3, 1)))
    out, inter = ddpm_sample(
        eps_fn, schedule, jax.random.PRNGKey(0), x_nhwc.shape,
        x_T=x_nhwc, clip_denoised=clip, temperature=0.0,
        log_every_t=LOG_EVERY, record=record,
    )
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    ours_inter = np.transpose(np.asarray(inter), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(ours, t_final, atol=1e-4, rtol=1e-3)
    assert ours_inter.shape == t_inter.shape
    np.testing.assert_allclose(ours_inter, t_inter, atol=1e-4, rtol=1e-3)


def test_log_slots_rule():
    slots, n_log = _log_slots(T, LOG_EVERY)
    # reference rule: record at i % log == 0 or i == T-1, descending order
    logged = [T - 1 - k for k, s in enumerate(slots) if s < n_log]
    assert logged == [i for i in range(T - 1, -1, -1)
                      if i % LOG_EVERY == 0 or i == T - 1]
    assert n_log == len(logged)


def test_ddim_cfg_golden():
    """CFG combination eps = e_u + s*(e_c - e_u) against a numpy replay."""
    S, ETA, SCALE = 5, 0.0, 3.5

    def eps_c(x, t):
        return jnp.tanh(x) * 0.1 + 0.01 * t[:, None, None, None]

    def eps_u(x, t):
        return jnp.sin(x) * 0.05

    schedule = DiffusionSchedule.create(T, "linear", LINEAR_START, LINEAR_END)
    params = DDIMParams.create(schedule, S, ETA)

    rng = np.random.default_rng(11)
    x_T = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)

    out = ddim_sample(eps_c, params, jax.random.PRNGKey(0), x_T.shape,
                      x_T=jnp.asarray(x_T), temperature=0.0,
                      guidance_scale=SCALE, eps_fn_uncond=eps_u)

    # numpy replay (reference ddim.py:168-201, temperature 0)
    x = x_T.copy()
    steps = np.asarray(params.timesteps)[::-1]
    a_t = np.asarray(params.alphas, np.float64)[::-1]
    a_prev = np.asarray(params.alphas_prev, np.float64)[::-1]
    s1m = np.asarray(params.sqrt_one_minus_alphas, np.float64)[::-1]
    for k in range(S):
        tb = np.full((2,), steps[k], np.float32)
        e_c = np.tanh(x) * 0.1 + 0.01 * tb[:, None, None, None]
        e_u = np.sin(x) * 0.05
        e = e_u + SCALE * (e_c - e_u)
        pred_x0 = (x - s1m[k] * e) / np.sqrt(a_t[k])
        x = np.sqrt(a_prev[k]) * pred_x0 + np.sqrt(1 - a_prev[k]) * e
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5, rtol=1e-4)
