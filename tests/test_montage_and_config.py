"""Montage roundtrip, LDM dataset, registry, and main.py config parsing."""

import os

import numpy as np
import pytest

from slice3d_tpu.utils.montage import slices_to_montage, montage_to_slices, to_uint8
from slice3d_tpu.utils.registry import instantiate_from_config, resolve_target
from slice3d_tpu.data.ldm_data import LDMSliceDataset
from slice3d_tpu.data.builders import create_synthetic_dataset


def test_montage_roundtrip():
    rng = np.random.default_rng(0)
    slices = rng.uniform(-1, 1, size=(12, 8, 8, 3)).astype(np.float32)
    m = slices_to_montage(slices)
    assert m.shape == (32, 32, 3)
    np.testing.assert_array_equal(m[24:], 0)  # pad row
    back = montage_to_slices(m, 8)
    np.testing.assert_array_equal(back, slices)


def test_to_uint8_range():
    x = np.array([-2.0, -1.0, 0.0, 1.0, 2.0], np.float32)
    np.testing.assert_array_equal(to_uint8(x), [0, 0, 127, 255, 255])


def test_registry_aliases():
    from slice3d_tpu.diffusion.latent import LatentDiffusion

    cls = resolve_target("ldm.models.diffusion.ddpm.LatentDiffusion")
    assert cls is LatentDiffusion
    obj = instantiate_from_config(
        {"target": "ldm.models.diffusion.ddpm.LatentDiffusion",
         "params": {"timesteps": 10, "cond_stage_trainable": True}}
    )
    assert obj.timesteps == 10


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    # validation/test always read view 4, so the fixture needs >= 5 views
    return create_synthetic_dataset(
        str(tmp_path_factory.mktemp("ldmds")), n_shapes=2, n_views=6, img_size=16
    )


def test_ldm_dataset(root):
    ds = LDMSliceDataset(root=root, split="validation", size=16, n_views=6)
    s = ds[0]
    assert s["image"].shape == (13, 16, 16, 3)
    assert s["img_ipt_view"].shape == (16, 16, 3)
    # last stack entry is the input view
    np.testing.assert_array_equal(s["image"][12], s["img_ipt_view"])

    rec = LDMSliceDataset(root=root, split="trainval_rec", size=16, n_views=6)
    assert len(rec) == 2 * 6


def test_main_config_parsing():
    import main as main_mod

    cfg = main_mod.load_config(["configs/objaverse-ldm-kl-8.yaml"], ["data.params.batch_size=2"])
    assert cfg["data"]["params"]["batch_size"] == 2
    assert cfg["model"]["params"]["timesteps"] == 1000
    module, trainer, img_size, bs = main_mod.build_module_and_trainer(cfg, True)
    assert img_size == 128 and bs == 2
    assert module.unet_channels == 192
    assert module.latent_size == 16
    assert module.vae_mult == (1, 2, 4, 4)


def test_reconstruct_slices_cli(tmp_path):
    """Slice-dump CLI end-to-end (reference reconstruct_slices.py):
    12 PNGs per shape in dataset naming at 256^2."""
    import os

    from slice3d_tpu.data.builders import create_synthetic_dataset

    root_parent = tmp_path / "data"
    create_synthetic_dataset(str(root_parent / "objaverse"), n_shapes=1,
                             n_views=6, img_size=32, n_sdf=64)
    import reconstruct_slices

    reconstruct_slices.main([
        "--name_dataset", "objaverse", "--dir_data", str(root_parent),
        "--img_size", "32", "--n_views", "6", "--random_init",
        "--dir_experiments", str(tmp_path / "exp"), "--name_exp", "sdump",
    ])
    out = tmp_path / "exp" / "sdump" / "results_slices" / "objaverse" / "00000"
    files = sorted(os.listdir(out))
    assert len(files) == 12
    from PIL import Image

    im = Image.open(out / "X_1.png")
    assert im.size == (256, 256)
