"""End-to-end drive of the camera-pose estimator trainer + CLI.

The reference's trainer for this model is dead TF1 code
(reg_slices/src/train_cam_est_disn.py); this pins the working JAX
equivalent: dataset assembly from the standard layout, one optimizer step,
and a metric-named checkpoint from the ``train_cam.py`` CLI.
"""

import glob
import os
import sys

import numpy as np
import pytest

from slice3d_tpu.data.builders import create_synthetic_dataset
from slice3d_tpu.train.train_cam import CamEstDataset

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cam_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("cam_ds")
    create_synthetic_dataset(str(root / "objaverse"), n_shapes=2, n_views=2,
                             img_size=32, n_sdf=512)
    return root


def test_cam_dataset_items(cam_ds):
    ds = CamEstDataset(str(cam_ds / "objaverse"), split="train",
                       img_size=32, n_views=2, n_pcd=64)
    assert len(ds) == 2
    item = ds[0]
    assert item["img_input"].shape == (32, 32, 3)
    assert item["pcd"].shape == (64, 3)
    assert item["regress_mat"].shape == (4, 3)
    assert np.isfinite(item["regress_mat"]).all()
    # points come from the near-surface band of the sdf samples
    assert np.abs(item["pcd"]).max() <= 1.0


@pytest.mark.slow
def test_train_cam_cli_end_to_end(cam_ds, tmp_path):
    sys.path.insert(0, ROOT)
    try:
        import train_cam
    finally:
        sys.path.remove(ROOT)
    train_cam.main([
        "--name_exp_cam", "camtest", "--name_dataset", "objaverse",
        "--dir_data", str(cam_ds), "--img_size", "32", "--n_bs", "2",
        "--n_epochs", "1", "--n_views", "2", "--n_wk", "0",
        "--freq_log", "1", "--dir_experiments", str(tmp_path),
    ])
    ckpts = glob.glob(str(tmp_path / "camtest" / "ckpt" / "*.ckpt"))
    assert len(ckpts) == 1
    # metric-named checkpoint: <epoch>_<step>_<loss>.ckpt with a finite loss
    loss = float(os.path.basename(ckpts[0])[:-5].split("_")[2])
    assert np.isfinite(loss)
