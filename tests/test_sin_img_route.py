"""Single-image demo route end-to-end (reference call stack 3.5).

create_dataset_sin_img.py synthesizes the full dataset layout from one
RGBA image (recentering, identity meta.pkl, blank slices, zero SDF,
split lists); reconstruct.py must then produce a mesh from that layout
with the regression model — the README's one-image demo path.
"""

import glob
import io
import os

import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow
def test_single_image_route_end_to_end(tmp_path):
    import create_dataset_sin_img
    import reconstruct

    # an off-center RGBA blob (exercises the alpha-bbox recenter)
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(64, 64, 4), dtype=np.uint8)
    arr[..., 3] = 0
    arr[4:28, 30:60, 3] = 255
    img_path = str(tmp_path / "input.png")
    Image.fromarray(arr, "RGBA").save(img_path)

    data_root = str(tmp_path / "data")
    create_dataset_sin_img.main([
        "--img_path", img_path, "--name_dataset", "custom_sin_img",
        "--dir_data", data_root, "--img_size", "32",
    ])
    root = os.path.join(data_root, "custom_sin_img")
    # reference layout synthesized: input view 004, meta, splits, sdf
    assert os.path.exists(os.path.join(root, "00_img_input", "00000",
                                       "004.png"))
    assert os.path.exists(os.path.join(root, "00_img_input", "00000",
                                       "meta.pkl"))
    assert open(os.path.join(root, "03_splits", "test.lst")).read().split() \
        == ["00000"]

    reconstruct.main([
        "--name_model", "slicenet", "--name_dataset", "custom_sin_img",
        "--dir_data", data_root, "--img_size", "32", "--random_init",
        "--mc_res0", "8", "--mc_up_steps", "0", "--mc_chunk_size", "1024",
        "--dir_experiments", str(tmp_path / "exp"), "--name_exp", "demo",
    ])
    objs = glob.glob(str(tmp_path / "exp" / "demo" / "results" /
                         "custom_sin_img" / "*.obj"))
    assert [os.path.basename(p) for p in objs] == ["00000.obj"]
    for line in io.open(objs[0]):
        assert line.startswith(("v ", "f "))
