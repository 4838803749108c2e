"""Dataset layout reader + loader tests on a synthetic fixture."""

import numpy as np
import pytest

from slice3d_tpu.data import Slice3DDataset, BatchLoader, SLICE_ORDER
from slice3d_tpu.data.builders import create_synthetic_dataset, create_single_image_dataset


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return create_synthetic_dataset(
        str(tmp_path_factory.mktemp("ds")), n_shapes=2, n_views=6, img_size=16, n_sdf=512
    )


def test_slice_order():
    assert SLICE_ORDER[:4] == (("X", "1"), ("X", "2"), ("X", "3"), ("X", "4"))
    assert SLICE_ORDER[4:8] == (("Z", "4"), ("Z", "3"), ("Z", "2"), ("Z", "1"))
    assert SLICE_ORDER[8:] == (("Y", "1"), ("Y", "2"), ("Y", "3"), ("Y", "4"))


def test_getitem_shapes(root):
    ds = Slice3DDataset(root, split="val", img_size=16, n_qry=64, n_views=6)
    s = ds[0]
    assert s["img_input"].shape == (16, 16, 3)
    assert s["img_slices"].shape == (12, 16, 16, 3)
    assert s["qry_norot"].shape == (64, 3)
    assert s["sdf"].shape == (64,)
    assert s["obj_rot_mat"].shape == (3, 3)
    assert s["trans_mat_wo_rot_tp"].shape == (4, 3)
    assert s["img_input"].min() >= -1.0 and s["img_input"].max() <= 1.0
    # occ consistent with sdf
    np.testing.assert_array_equal(s["occ"], (s["sdf"] <= 0).astype(np.float32))


def test_val_split_deterministic(root):
    ds = Slice3DDataset(root, split="val", img_size=16, n_qry=32, n_views=6)
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a["qry_norot"], b["qry_norot"])
    np.testing.assert_array_equal(a["img_input"], b["img_input"])


def test_batch_loader(root):
    ds = Slice3DDataset(root, split="train", img_size=16, n_qry=32, n_views=6)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["img_input"].shape == (2, 16, 16, 3)
    assert b["img_slices"].shape == (2, 12, 16, 16, 3)


def test_batch_loader_propagates_worker_errors(root):
    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise ValueError("boom")

    loader = BatchLoader(Broken(), batch_size=2, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        next(iter(loader))


def test_single_image_dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = np.zeros((64, 64, 4), np.uint8)
    arr[10:30, 20:50, :3] = rng.integers(0, 255, (20, 30, 3))
    arr[10:30, 20:50, 3] = 255
    src = tmp_path / "input.png"
    Image.fromarray(arr, "RGBA").save(src)

    root = create_single_image_dataset(str(src), str(tmp_path / "ds"), img_size=32)
    ds = Slice3DDataset(root, split="test", img_size=32, load_sdf=False)
    s = ds[0]
    assert s["img_input"].shape == (32, 32, 3)
    # identity meta: distance 1.2, zero az/el
    rot = s["obj_rot_mat"]
    assert rot.shape == (3, 3)
    assert abs(s["trans_mat_wo_rot_tp"][3, 2] - 1.2) < 1e-6
