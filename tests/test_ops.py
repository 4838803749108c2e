"""Parity tests for core ops against torch reference semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from slice3d_tpu.ops import grid_sample_2d, project_points, resize_nearest, resize_bilinear

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


RNG = np.random.default_rng(0)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("hw", [(7, 5), (16, 16)])
def test_grid_sample_parity(align_corners, hw):
    h, w = hw
    n, c, m = 2, 3, 50
    feats = RNG.normal(size=(n, h, w, c)).astype(np.float32)
    # include out-of-range coords to exercise zero padding
    coords = RNG.uniform(-1.3, 1.3, size=(n, m, 2)).astype(np.float32)

    ours = grid_sample_2d(jnp.asarray(feats), jnp.asarray(coords), align_corners=align_corners)

    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.from_numpy(coords).unsqueeze(1)  # (N, 1, M, 2)
    t_out = F.grid_sample(
        t_feats, t_grid, mode="bilinear", padding_mode="zeros", align_corners=align_corners
    )  # (N, C, 1, M)
    t_out = t_out.squeeze(2).permute(0, 2, 1).numpy()  # (N, M, C)

    np.testing.assert_allclose(np.asarray(ours), t_out, atol=2e-5)


def test_grid_sample_exact_corners():
    # -1/-1 with align_corners=True must hit pixel (0, 0) exactly.
    feats = np.arange(12, dtype=np.float32).reshape(1, 2, 2, 3)
    coords = np.array([[[-1.0, -1.0], [1.0, 1.0], [1.0, -1.0]]], dtype=np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(coords)))
    np.testing.assert_allclose(out[0, 0], feats[0, 0, 0])  # y=0, x=0
    np.testing.assert_allclose(out[0, 1], feats[0, 1, 1])  # y=1, x=1
    np.testing.assert_allclose(out[0, 2], feats[0, 0, 1])  # y=0, x=1


def test_project_points_matches_manual():
    from slice3d_tpu import camera

    rot, proj = camera.camera_matrices(0.3, 0.1, 1.2)
    pts = RNG.uniform(-0.5, 0.5, size=(1, 17, 3)).astype(np.float32)
    out = np.asarray(project_points(jnp.asarray(pts), jnp.asarray(proj[None].astype(np.float32))))

    homo = np.concatenate([pts[0], np.ones((17, 1), np.float32)], axis=1)
    uvw = homo @ proj.astype(np.float32)
    xy = uvw[:, :2] / uvw[:, 2:3]
    expect = np.clip(2 * (xy - 0.5), -1, 1)
    np.testing.assert_allclose(out[0], expect, atol=1e-6)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_sample_packed_sum_batched_matches_per_object():
    """The flat-batch gather (B folded into the row axis with per-object
    offsets) must agree exactly with running each object alone — pins the
    base-offset index math of the B>1 fast path."""
    from slice3d_tpu.models.sdf_head import sample_packed_sum

    b, m, s, d = 3, 29, 12, 8
    packed = [
        jnp.asarray(RNG.normal(size=(b, h, w, s * d)).astype(np.float32))
        for (h, w) in ((9, 7), (5, 4))
    ]
    uv = jnp.asarray(RNG.uniform(-1.2, 1.2, size=(b, m, 2)).astype(np.float32))

    batched = np.asarray(sample_packed_sum(packed, uv, s))
    for i in range(b):
        single = np.asarray(sample_packed_sum(
            [p[i:i + 1] for p in packed], uv[i:i + 1], s))
        np.testing.assert_allclose(batched[i], single[0], atol=1e-6)


@pytest.mark.parametrize("shape_out", [(16, 16), (8, 8), (4, 4), (1, 1), (5, 9)])
def test_resize_nearest_parity(shape_out):
    x = RNG.normal(size=(2, 13, 11, 3)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), shape_out))
    t = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=shape_out, mode="nearest")
    np.testing.assert_allclose(ours, t.permute(0, 2, 3, 1).numpy(), atol=0)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("shape_out", [(128, 128), (30, 20)])
def test_resize_bilinear_parity(shape_out, align):
    x = RNG.normal(size=(1, 64, 48, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), shape_out, align_corners=align))
    t = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=shape_out, mode="bilinear", align_corners=align
    )
    np.testing.assert_allclose(ours, t.permute(0, 2, 3, 1).numpy(), atol=1e-5)
