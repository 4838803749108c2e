"""Shape/consistency smoke tests for the full models (tiny inputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slice3d_tpu.models.gtslice import GTSliceModel
from slice3d_tpu.models.slicenet import SliceNetModel
from slice3d_tpu.models.sdf_head import prepare_queries
from slice3d_tpu import camera


@pytest.fixture(scope="module")
def cam():
    rot, proj = camera.camera_matrices(0.4, 0.2, 1.2)
    return (
        jnp.asarray(rot[None].astype(np.float32)),
        jnp.asarray(proj[None].astype(np.float32)),
    )


@pytest.mark.slow
def test_gtslice_forward_and_split_query(cam):
    obj_rot, trans = cam
    model = GTSliceModel(n_slices=12)
    rng = np.random.default_rng(0)
    slices = jnp.asarray(rng.normal(size=(1, 12, 32, 32, 3)).astype(np.float32))
    qry = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 40, 3)).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), slices, qry, trans, obj_rot)
    sdf = model.apply(variables, slices, qry, trans, obj_rot)
    assert sdf.shape == (1, 40)
    assert np.isfinite(np.asarray(sdf)).all()

    # encode-once / query-many must agree with the fused forward
    pyr = model.apply(variables, slices, method=GTSliceModel.encode)
    qry_cam = prepare_queries(qry, obj_rot, test_mode=False)
    sdf2 = model.apply(variables, pyr, qry_cam, trans, method=GTSliceModel.query)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(sdf2), atol=1e-5)


@pytest.mark.slow
def test_folded_query_matches_standard(cam):
    obj_rot, trans = cam
    model = GTSliceModel(n_slices=4)
    rng = np.random.default_rng(5)
    slices = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)).astype(np.float32))
    qry = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 24, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(2), slices, qry, trans, obj_rot)

    qry_cam = prepare_queries(qry, obj_rot, test_mode=False)
    pyr = model.apply(variables, slices, method=GTSliceModel.encode)
    ref = model.apply(variables, pyr, qry_cam, trans, method=GTSliceModel.query)

    folded = model.apply(variables, slices, method=GTSliceModel.encode_folded)
    fast = model.apply(variables, folded, qry_cam, trans, method=GTSliceModel.query_folded)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_gtslice_test_mode_flips_yz(cam):
    _, trans = cam
    q = jnp.asarray(np.array([[[0.1, 0.2, 0.3]]], np.float32))
    out = prepare_queries(q, None, test_mode=True)
    np.testing.assert_allclose(np.asarray(out), [[[0.1, -0.2, -0.3]]], atol=0)


@pytest.mark.slow
def test_slicenet_forward(cam):
    obj_rot, trans = cam
    model = SliceNetModel(n_slices=12)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    qry = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 16, 3)).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), img, qry, trans, obj_rot)
    sdf, slices_rec = model.apply(variables, img, qry, trans, obj_rot)
    assert sdf.shape == (1, 16)
    assert slices_rec.shape == (12, 32, 32, 3)
    rec = np.asarray(slices_rec)
    assert rec.min() >= -1.0 and rec.max() <= 1.0

    # pyramid channel total must be 992 (512+256+128+64+32), ref models.py:78
    pyr, _ = model.apply(variables, img, method=SliceNetModel.encode)
    assert sum(p.shape[-1] for p in pyr) == 992
    assert [p.shape[-1] for p in pyr] == [512, 256, 128, 64, 32]


@pytest.mark.slow
def test_gtslice_pyramid_channels(cam):
    # 1472 = 64+128+256+512+512, ref model_gt.py:98
    model = GTSliceModel(n_slices=2)
    rng = np.random.default_rng(2)
    slices = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3)).astype(np.float32))
    qry = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 8, 3)).astype(np.float32))
    obj_rot, trans = cam
    variables = model.init(jax.random.PRNGKey(0), slices, qry, trans, obj_rot)
    pyr = model.apply(variables, slices, method=GTSliceModel.encode)
    assert sum(p.shape[-1] for p in pyr) == 1472
