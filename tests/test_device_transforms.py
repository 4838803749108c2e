"""Device-side preprocessing parity vs the host PIL path."""

import numpy as np
import pytest

from slice3d_tpu.data.builders import create_synthetic_dataset
from slice3d_tpu.data.dataset import Slice3DDataset, preprocess_image
from slice3d_tpu.data.device_transforms import (
    DeviceTransformLoader,
    preprocess_rgba_device,
)
from slice3d_tpu.data.pipeline import BatchLoader
from PIL import Image


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return create_synthetic_dataset(
        str(tmp_path_factory.mktemp("dsdev")), n_shapes=2, n_views=6,
        img_size=16, n_sdf=128,
    )


def test_same_size_exact():
    """No resize -> compositing + normalization are bit-exact vs host."""
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    for white_bg in (False, True):
        host = preprocess_image(Image.fromarray(raw, "RGBA"), 16, white_bg)
        dev = np.asarray(preprocess_rgba_device(raw, 16, white_bg))
        np.testing.assert_allclose(dev, host, atol=1e-6)


def test_resize_close_to_pil():
    """Downscale: jax linear-antialias vs PIL BILINEAR agree closely on a
    smooth image (both are adaptive triangle filters)."""
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64),
                         indexing="ij")
    smooth = np.stack([np.sin(4 * xx), np.cos(3 * yy), xx * yy], axis=-1)
    raw = np.concatenate([
        (smooth * 127 + 128).astype(np.uint8),
        np.full((64, 64, 1), 255, np.uint8),
    ], axis=-1)
    host = preprocess_image(Image.fromarray(raw, "RGBA"), 16, False)
    dev = np.asarray(preprocess_rgba_device(raw, 16, False))
    assert np.abs(dev - host).mean() < 5e-3
    assert np.abs(dev - host).max() < 5e-2


def test_raw_dataset_and_loader(root):
    ds_raw = Slice3DDataset(root, split="val", img_size=16, n_qry=8,
                            n_views=6, device_preprocess=True)
    s = ds_raw[0]
    assert s["img_input_raw"].dtype == np.uint8
    assert s["img_input_raw"].shape[-1] == 4
    assert s["img_slices_raw"].shape[0] == 12

    loader = DeviceTransformLoader(
        BatchLoader(ds_raw, 2, shuffle=False, drop_last=False, num_workers=1),
        img_size=16)
    batch = next(iter(loader))
    assert batch["img_input"].shape == (2, 16, 16, 3)
    assert batch["img_slices"].shape == (2, 12, 16, 16, 3)

    # matches the host-preprocessed dataset output
    ds_host = Slice3DDataset(root, split="val", img_size=16, n_qry=8,
                             n_views=6)
    np.testing.assert_allclose(
        np.asarray(batch["img_input"][0]), ds_host[0]["img_input"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(batch["img_slices"][1]), ds_host[1]["img_slices"],
        atol=1e-6)


def test_raw_mixed_resolution_rejected(tmp_path):
    """Raw (pre-resize) feeds are stacked, so a dataset with one odd-sized
    PNG must fail with a message naming the file, not a bare np.stack
    shape error mid-epoch."""
    root = create_synthetic_dataset(str(tmp_path / "mix"), n_shapes=1,
                                    n_views=6, img_size=16, n_sdf=32)
    ds = Slice3DDataset(root, split="val", img_size=16, n_qry=8, n_views=6,
                        device_preprocess=True)
    _ = ds[0]  # uniform so far

    import glob as _glob
    import os as _os

    # val split reads the fixed view 004; poison one of its slice PNGs
    odd = sorted(_glob.glob(_os.path.join(root, "01_img_slices", "*", "004",
                                          "*.png")))[0]
    Image.new("RGBA", (24, 24), (255, 0, 0, 255)).save(odd)
    with pytest.raises(ValueError, match="uniform source resolutions"):
        ds[0]
