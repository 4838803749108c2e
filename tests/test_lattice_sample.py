"""Separable lattice-slab sampling vs the reference gather path."""

import numpy as np
import pytest

import jax.numpy as jnp

from slice3d_tpu.camera import camera_matrices
from slice3d_tpu.models.sdf_head import sample_packed_sum
from slice3d_tpu.ops.lattice_sample import (
    lattice_sample_sum,
    projection_is_separable,
)


def _packed_levels(rng, b=1, s=3, d=4, sizes=((8, 8), (5, 7), (2, 2))):
    return [
        jnp.asarray(rng.normal(size=(b, h, w, s * d)).astype(np.float32))
        for h, w in sizes
    ]


def test_matches_sample_packed_sum():
    rng = np.random.default_rng(0)
    s, d = 3, 4
    packed = _packed_levels(rng, s=s, d=d)
    # nodes include out-of-range values to pin the zero-attenuation border
    u = np.array([-1.2, -1.0, -0.3, 0.41, 0.99, 1.1], np.float32)
    v = np.array([-0.9, 0.0, 0.7, 1.0], np.float32)
    uu, vv = np.meshgrid(u, v)  # (Ny, Nx)
    uv = jnp.asarray(
        np.stack([uu.ravel(), vv.ravel()], axis=-1)[None])  # (1, M, 2)

    want = sample_packed_sum(packed, uv, s, hat_max_rows=0)  # (1, M, s, d)
    got = lattice_sample_sum(packed, jnp.asarray(u)[None],
                             jnp.asarray(v)[None], s)
    got = got.reshape(1, -1, s, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_matches_with_obj_index():
    rng = np.random.default_rng(1)
    s, d = 2, 3
    packed = _packed_levels(rng, b=3, s=s, d=d, sizes=((4, 4), (6, 3)))
    u = np.linspace(-1, 1, 5).astype(np.float32)
    v = np.linspace(-1, 1, 4).astype(np.float32)
    uu, vv = np.meshgrid(u, v)
    uv = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], axis=-1)[None])
    oid = jnp.asarray([2], jnp.int32)

    want = sample_packed_sum(packed, uv, s, obj_index=oid, hat_max_rows=0)
    got = lattice_sample_sum(packed, jnp.asarray(u)[None],
                             jnp.asarray(v)[None], s, obj_index=oid)
    np.testing.assert_allclose(np.asarray(got.reshape(1, -1, s, d)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_projection_separability_structure():
    # the real rotation-free reference projection IS separable
    _, trans_tp = camera_matrices(0.7, 0.3, 1.8)
    assert projection_is_separable(trans_tp)
    assert projection_is_separable(np.eye(4, 3, dtype=np.float32))
    # a rotated projection is not
    rot = np.array(
        [[0.8, -0.6, 0.0], [0.6, 0.8, 0.0], [0.0, 0.0, 1.0]], np.float32)
    full = np.concatenate([rot, np.zeros((1, 3), np.float32)], axis=0)
    assert not projection_is_separable(full)


def test_perspective_slab_is_tensor_grid():
    """Per-slab u depends only on x and v only on y under the real
    projection — the structural fact the separable path relies on."""
    from slice3d_tpu.ops import project_points

    _, trans_tp = camera_matrices(1.1, -0.4, 2.0)
    trans = jnp.asarray(trans_tp, jnp.float32)[None]
    rng = np.random.default_rng(2)
    xs = rng.uniform(-0.5, 0.5, 4).astype(np.float32)
    ys = rng.uniform(-0.5, 0.5, 5).astype(np.float32)
    z = np.float32(0.21)
    xx, yy = np.meshgrid(xs, ys)
    pts = np.stack([xx.ravel(), yy.ravel(), np.full(xx.size, z)], -1)
    uv = np.asarray(project_points(jnp.asarray(pts)[None], trans))[0]
    uv = uv.reshape(len(ys), len(xs), 2)
    # u constant down columns, v constant across rows
    assert np.abs(uv[..., 0] - uv[:1, :, 0]).max() <= 1e-6
    assert np.abs(uv[..., 1] - uv[:, :1, 1]).max() <= 1e-6


def test_shared_plane_group_mode():
    """Scalar obj_index = slab-group mode: G node rows share one plane
    set; must equal per-row sampling of that object."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    s, d = 2, 3
    packed = _packed_levels(rng, b=3, s=s, d=d, sizes=((4, 4), (6, 3)))
    g, nx, ny = 3, 5, 4
    u = rng.uniform(-1, 1, (g, nx)).astype(np.float32)
    v = rng.uniform(-1, 1, (g, ny)).astype(np.float32)
    got = lattice_sample_sum(packed, jnp.asarray(u), jnp.asarray(v), s,
                             obj_index=jnp.asarray(1, jnp.int32))
    want = lattice_sample_sum(packed, jnp.asarray(u), jnp.asarray(v), s,
                              obj_index=jnp.asarray([1, 1, 1], jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
