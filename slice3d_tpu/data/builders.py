"""Dataset builders: single-image ingestion and synthetic test fixtures.

``create_single_image_dataset`` is the equivalent of the reference
``create_dataset_sin_img.py:22-81``: wrap one RGBA image into the standard
dataset layout (view 004, identity normalization meta, blank slices, zero
SDF array, single-id split lists) so the reconstruction CLI can run on it.

``create_synthetic_dataset`` writes a tiny procedurally generated dataset
(random images, a sphere SDF) used by the test-suite and benchmarks — the
reference has no equivalent because it has no tests.
"""

from __future__ import annotations

import os
import pickle
import numpy as np
from PIL import Image

from .dataset import SLICE_ORDER

__all__ = ["create_single_image_dataset", "create_synthetic_dataset"]


def _save_meta(path: str, azimuths, elevations, distances, scale, offset):
    k = np.zeros((3, 3))
    cam_poses = np.zeros((len(azimuths), 3, 4))
    with open(path, "wb") as f:
        pickle.dump([k, np.asarray(azimuths), np.asarray(elevations),
                     np.asarray(distances), cam_poses, scale, np.asarray(offset)], f)


def create_single_image_dataset(
    img_path: str,
    root: str,
    *,
    img_size: int = 256,
    center_obj: bool = True,
) -> str:
    """Build data/<name> layout from one RGBA image. Returns the root dir."""
    uid = "00000"
    os.makedirs(root, exist_ok=True)
    for d in ("00_img_input", "01_img_slices", "02_sdfs", "03_splits"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    img = Image.open(img_path)
    if img.mode != "RGBA":
        raise ValueError("input image must be RGBA (alpha marks the object)")
    if center_obj:
        alpha = img.split()[3]
        bbox = alpha.getbbox()
        if bbox is not None:
            w, h = img.size
            ow, oh = bbox[2] - bbox[0], bbox[3] - bbox[1]
            off = ((w - ow) // 2 - bbox[0], (h - oh) // 2 - bbox[1])
            canvas = Image.new("RGBA", (w, h), (0, 0, 0, 0))
            canvas.paste(img, off, mask=alpha)
            img = canvas

    view_dir = os.path.join(root, "00_img_input", uid)
    os.makedirs(view_dir, exist_ok=True)
    img.save(os.path.join(view_dir, "004.png"), "PNG")
    _save_meta(
        os.path.join(view_dir, "meta.pkl"),
        np.zeros(12), np.zeros(12), np.ones(12) * 1.2, 1.0, np.zeros(3),
    )

    sdir = os.path.join(root, "01_img_slices", uid, "004")
    os.makedirs(sdir, exist_ok=True)
    blank = Image.new("RGBA", (img_size, img_size))
    for axis, part in SLICE_ORDER:
        blank.save(os.path.join(sdir, f"{axis}_{part}.png"))

    np.save(os.path.join(root, "02_sdfs", f"{uid}.npy"), np.zeros((16384, 4)))

    for split in ("train", "val", "test"):
        with open(os.path.join(root, "03_splits", f"{split}.lst"), "w") as f:
            f.write(uid)
    return root


def create_synthetic_dataset(
    root: str,
    *,
    n_shapes: int = 2,
    n_views: int = 12,
    img_size: int = 32,
    n_sdf: int = 2048,
    seed: int = 0,
) -> str:
    """Procedural mini-dataset (noise images + sphere SDFs) for tests."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    ids = ["%05d" % i for i in range(n_shapes)]

    for uid in ids:
        vdir = os.path.join(root, "00_img_input", uid)
        os.makedirs(vdir, exist_ok=True)
        for v in range(n_views):
            arr = rng.integers(0, 255, size=(img_size, img_size, 4), dtype=np.uint8)
            arr[..., 3] = (arr[..., 3] > 64) * 255
            Image.fromarray(arr, "RGBA").save(os.path.join(vdir, "%03d.png" % v))
        _save_meta(
            os.path.join(vdir, "meta.pkl"),
            rng.uniform(0, 2 * np.pi, n_views),
            rng.uniform(-0.17, 0.7, n_views),
            np.full(n_views, 1.2),
            float(rng.uniform(0.8, 1.1)),
            rng.uniform(-0.05, 0.05, 3),
        )
        for v in range(n_views):
            sdir = os.path.join(root, "01_img_slices", uid, "%03d" % v)
            os.makedirs(sdir, exist_ok=True)
            for axis, part in SLICE_ORDER:
                arr = rng.integers(0, 255, size=(img_size, img_size, 4), dtype=np.uint8)
                Image.fromarray(arr, "RGBA").save(os.path.join(sdir, f"{axis}_{part}.png"))
        os.makedirs(os.path.join(root, "02_sdfs"), exist_ok=True)
        pts = rng.uniform(-0.5, 0.5, size=(n_sdf, 3)).astype(np.float32)
        sdf = (np.linalg.norm(pts, axis=1) - 0.3).astype(np.float32)
        np.save(os.path.join(root, "02_sdfs", f"{uid}.npy"),
                np.concatenate([pts, sdf[:, None]], axis=1))

    os.makedirs(os.path.join(root, "03_splits"), exist_ok=True)
    for split in ("train", "val", "test", "trainval"):
        with open(os.path.join(root, "03_splits", f"{split}.lst"), "w") as f:
            f.write("\n".join(ids))
    return root
