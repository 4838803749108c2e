"""DISN + CameraNet smoke/consistency tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slice3d_tpu import camera
from slice3d_tpu.models.camnet import CameraNet, camera_pose_loss, rotation_from_ortho6d
from slice3d_tpu.models.disn import DISNModel


def test_rotation_from_ortho6d_orthonormal():
    rng = np.random.default_rng(0)
    poses = jnp.asarray(rng.normal(size=(5, 6)).astype(np.float32))
    rots = np.asarray(rotation_from_ortho6d(poses))
    for r in rots:
        np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99


@pytest.mark.slow
def test_camnet_forward_and_loss():
    model = CameraNet()
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out["pred_RT_inv"].shape == (2, 4, 3)
    assert ((np.asarray(out["distance_ratio"]) >= 0.7)
            & (np.asarray(out["distance_ratio"]) <= 1.05)).all()

    pcd = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 3)).astype(np.float32))
    regress = jnp.asarray(np.stack([np.eye(4, 3, dtype=np.float32)] * 2))
    norm = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2))
    k = jnp.asarray(np.stack([camera.intrinsics().astype(np.float32)] * 2))
    loss, pred_trans = camera_pose_loss(out["pred_RT_inv"], pcd, regress, norm, k)
    assert np.isfinite(float(loss))
    assert pred_trans.shape == (2, 4, 3)


def test_disn_forward():
    model = DISNModel()
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    qry = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 16, 3)).astype(np.float32))
    trans = jnp.asarray(
        camera.full_projection_matrix(0.3, 0.1, 1.2)[None].astype(np.float32)
    )
    rot = jnp.eye(3, dtype=jnp.float32)[None]
    variables = model.init(jax.random.PRNGKey(0), img, qry, trans, rot)
    sdf = model.apply(variables, img, qry, trans, rot)
    assert sdf.shape == (1, 16)
    assert np.isfinite(np.asarray(sdf)).all()


def test_full_projection_consistent_with_split():
    # projecting ROTATED points with the rotation-free matrix must equal
    # projecting UNROTATED points with the full matrix
    rng = np.random.default_rng(3)
    az, el, d = 0.8, 0.25, 1.2
    rot, trans_tp = camera.camera_matrices(az, el, d)
    full_tp = camera.full_projection_matrix(az, el, d)
    pts = rng.uniform(-0.5, 0.5, (50, 3))

    homo_rot = np.concatenate([pts @ rot, np.ones((50, 1))], axis=1)
    homo_raw = np.concatenate([pts, np.ones((50, 1))], axis=1)
    a = homo_rot @ trans_tp
    b = homo_raw @ full_tp
    np.testing.assert_allclose(a[:, :2] / a[:, 2:], b[:, :2] / b[:, 2:], atol=1e-8)
