"""Parity of the VGG backbones vs torch reference stacks (random weights)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_refs import vgg16_bn_features, vgg19_features, randomize_bn_stats  # noqa: E402
from slice3d_tpu.models.vgg import VGG16BNBackbone, VGG19Features  # noqa: E402
from slice3d_tpu.convert import torch_import  # noqa: E402


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(7)
    return rng.normal(size=(2, 64, 64, 3)).astype(np.float32)


def test_vgg16bn_taps_parity(image):
    torch.manual_seed(0)
    feats = randomize_bn_stats(vgg16_bn_features()).eval()
    x = torch.from_numpy(image).permute(0, 3, 1, 2)
    with torch.no_grad():
        t1 = feats[:4](x)
        t2 = feats[4:11](t1)
        t3 = feats[11:21](t2)
        t4 = feats[21:31](t3)
        t5 = feats[31:41](t4)
        tf = feats[41:44](t5)
    torch_taps = [t1, t2, t3, t4, t5]

    variables = torch_import.vgg16bn_backbone(feats.state_dict(), "")
    model = VGG16BNBackbone(with_final=True)
    taps, final = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(image),
    )

    for ours, theirs in zip(taps, torch_taps):
        np.testing.assert_allclose(
            np.asarray(ours),
            theirs.permute(0, 2, 3, 1).numpy(),
            atol=2e-4,
            rtol=1e-3,
        )
    np.testing.assert_allclose(
        np.asarray(final), tf.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )


def test_vgg19_taps_parity(image):
    torch.manual_seed(1)
    feats = vgg19_features().eval()
    x = torch.from_numpy(image).permute(0, 3, 1, 2)
    with torch.no_grad():
        s1 = feats[:3](x)
        s2 = feats[3:8](s1)
        s3 = feats[8:13](s2)
        s4 = feats[13:22](s3)
        s5 = feats[22:31](s4)
    torch_taps = [s1, s2, s3, s4, s5]

    params = torch_import.vgg19_features(feats.state_dict(), "")
    taps = VGG19Features().apply(params, jnp.asarray(image))

    assert len(taps) == 5
    for ours, theirs in zip(taps, torch_taps):
        np.testing.assert_allclose(
            np.asarray(ours),
            theirs.permute(0, 2, 3, 1).numpy(),
            atol=2e-4,
            rtol=1e-3,
        )
