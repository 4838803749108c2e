"""Tests for atlas tiling, schedules, and the DDIM sampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slice3d_tpu.ops.atlas import tile_slices_to_atlas, untile_atlas
from slice3d_tpu.diffusion.schedule import DiffusionSchedule, DDIMParams, make_beta_schedule
from slice3d_tpu.diffusion.ddim import ddim_sample


def test_atlas_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 12, 16, 16, 4)).astype(np.float32)
    atlas = tile_slices_to_atlas(jnp.asarray(z))
    assert atlas.shape == (2, 64, 64, 4)
    back = np.asarray(untile_atlas(atlas, keep=13))
    np.testing.assert_array_equal(back[:, :12], z)
    np.testing.assert_array_equal(back[:, 12], 0)  # first pad tile is zero


def test_atlas_layout_row_major():
    # slice s must land at tile (row=s//4, col=s%4)
    z = np.zeros((1, 12, 4, 4, 1), np.float32)
    for s in range(12):
        z[0, s] = s + 1
    atlas = np.asarray(tile_slices_to_atlas(jnp.asarray(z)))[0, :, :, 0]
    for s in range(12):
        r, c = divmod(s, 4)
        np.testing.assert_array_equal(atlas[r * 4:(r + 1) * 4, c * 4:(c + 1) * 4], s + 1)
    np.testing.assert_array_equal(atlas[12:, :], 0)


def test_linear_schedule_values():
    # reference 'linear': linspace in sqrt(beta) space, squared
    betas = make_beta_schedule("linear", 1000, 0.0015, 0.0155)
    assert abs(betas[0] - 0.0015) < 1e-12
    assert abs(betas[-1] - 0.0155) < 1e-12
    mid = (np.sqrt(0.0015) + np.sqrt(0.0155)) / 2
    assert abs(betas[500] - mid ** 2) < 1e-4


def test_schedule_consistency():
    s = DiffusionSchedule.create(1000, "linear", 0.0015, 0.0155)
    assert s.num_timesteps == 1000
    np.testing.assert_allclose(
        s.alphas_cumprod, np.cumprod(1 - s.betas.astype(np.float64)), rtol=1e-5
    )
    np.testing.assert_allclose(
        s.sqrt_one_minus_alphas_cumprod ** 2, 1 - s.alphas_cumprod, atol=1e-6
    )
    assert s.lvlb_weights[0] == s.lvlb_weights[1]


def test_ddim_params_uniform():
    s = DiffusionSchedule.create(1000, "linear", 0.0015, 0.0155)
    p = DDIMParams.create(s, 200, eta=1.0)
    assert p.num_steps == 200
    np.testing.assert_array_equal(p.timesteps[:3], [1, 6, 11])
    assert p.timesteps[-1] == 996
    assert p.alphas_prev[0] == s.alphas_cumprod[0]
    # eta=0 -> all sigmas zero
    p0 = DDIMParams.create(s, 200, eta=0.0)
    np.testing.assert_array_equal(p0.sigmas, 0)


def test_ddim_zero_eps_telescopes():
    s = DiffusionSchedule.create(1000, "linear", 0.0015, 0.0155)
    p = DDIMParams.create(s, 50, eta=0.0)
    shape = (1, 4, 4, 2)
    x_T = jnp.ones(shape)
    out = ddim_sample(lambda x, t: jnp.zeros_like(x), p, jax.random.PRNGKey(0),
                      shape, x_T=x_T)
    # with eps==0 each step multiplies by sqrt(a_prev/a_t); telescopes to
    # sqrt(a_prev_first / a_last)
    expect = np.sqrt(p.alphas_prev[0] / p.alphas[-1])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4)


def test_ddim_deterministic_given_key():
    s = DiffusionSchedule.create(100, "linear", 0.0015, 0.0155)
    p = DDIMParams.create(s, 10, eta=1.0)
    f = lambda x, t: 0.1 * x
    a = ddim_sample(f, p, jax.random.PRNGKey(7), (1, 4, 4, 1))
    b = ddim_sample(f, p, jax.random.PRNGKey(7), (1, 4, 4, 1))
    c = ddim_sample(f, p, jax.random.PRNGKey(8), (1, 4, 4, 1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0
