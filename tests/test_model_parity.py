"""End-to-end numeric parity: GTSlice model vs torch twin via ckpt import."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_refs import TorchGTSliceRef, randomize_bn_stats  # noqa: E402
from slice3d_tpu.models.gtslice import GTSliceModel  # noqa: E402
from slice3d_tpu.convert import torch_import  # noqa: E402
from slice3d_tpu import camera  # noqa: E402


@pytest.mark.slow
def test_gtslice_full_parity():
    torch.manual_seed(11)
    n_slices, hw, m = 12, 32, 33
    tmodel = randomize_bn_stats(TorchGTSliceRef(n_slices)).eval()

    rng = np.random.default_rng(3)
    slices = rng.normal(size=(1, n_slices, hw, hw, 3)).astype(np.float32) * 0.5
    qry = rng.uniform(-0.5, 0.5, size=(1, m, 3)).astype(np.float32)
    rot, proj = camera.camera_matrices(0.8, 0.25, 1.2)
    qry_rot = qry @ rot.astype(np.float32)
    trans = proj[None].astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(slices).permute(0, 1, 4, 2, 3),
            torch.from_numpy(qry_rot),
            torch.from_numpy(trans),
        ).numpy()

    variables = torch_import.gtslice_model(tmodel.state_dict())
    model = GTSliceModel(n_slices=n_slices)
    pyr = model.apply(variables, jnp.asarray(slices), method=GTSliceModel.encode)
    ours = model.apply(
        variables, pyr, jnp.asarray(qry_rot[None] if qry_rot.ndim == 2 else qry_rot),
        jnp.asarray(trans), method=GTSliceModel.query,
    )
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_slicenet_full_parity():
    """End-to-end SliceNet vs torch twin through torch_import.slicenet_model
    (reference src/models.py:12-94 + src/unet_custom.py:4-69)."""
    from torch_refs import TorchSliceNetRef
    from slice3d_tpu.models.slicenet import SliceNetModel

    torch.manual_seed(7)
    n_slices, hw, m = 12, 32, 17
    tmodel = randomize_bn_stats(TorchSliceNetRef(n_slices), seed=5).eval()

    rng = np.random.default_rng(4)
    img = rng.normal(size=(1, hw, hw, 3)).astype(np.float32).clip(-1, 1)
    qry = rng.uniform(-0.5, 0.5, size=(1, m, 3)).astype(np.float32)
    rot, proj = camera.camera_matrices(0.5, 0.1, 1.2)
    qry_rot = (qry @ rot.astype(np.float32)).astype(np.float32)
    trans = proj[None].astype(np.float32)

    with torch.no_grad():
        t_sdf, t_slices = tmodel(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(qry_rot),
            torch.from_numpy(trans),
        )
    t_sdf = t_sdf.numpy()
    t_slices = t_slices.permute(0, 2, 3, 1).numpy()  # (B*S, H, W, 3)

    variables = torch_import.slicenet_model(tmodel.state_dict())
    model = SliceNetModel(n_slices=n_slices)

    pyr, slices_rec = model.apply(
        variables, jnp.asarray(img), method=SliceNetModel.encode)
    ours = model.apply(
        variables, pyr, jnp.asarray(qry_rot), jnp.asarray(trans),
        method=SliceNetModel.query)
    np.testing.assert_allclose(np.asarray(slices_rec), t_slices,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours), t_sdf, atol=5e-4, rtol=1e-3)

    # the folded fast inference path must agree with the reference too
    packed, _ = model.apply(
        variables, jnp.asarray(img), method=SliceNetModel.encode_folded)
    fast = model.apply(
        variables, packed, jnp.asarray(qry_rot), jnp.asarray(trans),
        method=SliceNetModel.query_folded)
    np.testing.assert_allclose(np.asarray(fast), t_sdf, atol=1e-3, rtol=1e-3)
