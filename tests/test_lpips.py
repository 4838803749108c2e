"""LPIPS distance parity vs the torch twin through lpips_model()."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_refs import TLPIPS  # noqa: E402
from slice3d_tpu.convert.torch_import import lpips_model  # noqa: E402
from slice3d_tpu.models.lpips import lpips_distance  # noqa: E402


def test_lpips_parity():
    torch.manual_seed(3)
    tmodel = TLPIPS().eval()
    # give the lin heads non-trivial positive weights like the shipped ckpt
    with torch.no_grad():
        for k in range(5):
            getattr(tmodel, f"lin{k}").model[1].weight.abs_()

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(y).permute(0, 3, 1, 2))
    t = t.numpy().reshape(-1)

    variables = lpips_model(tmodel.state_dict())
    ours = np.asarray(lpips_distance(variables["params"], x, y))
    np.testing.assert_allclose(ours, t, atol=2e-5, rtol=1e-4)
    # distance of an image to itself is 0
    same = np.asarray(lpips_distance(variables["params"], x, x))
    np.testing.assert_allclose(same, 0.0, atol=1e-7)
