"""Reader for the Slice3D on-disk dataset layout.

Layout (shared API between all pipeline stages, see README of the dataset):

    data/<dataset>/
      00_img_input/<shape_id>/{000..011}.png + meta.pkl
      01_img_slices/<shape_id>/<view>/{X,Y,Z}_{1..4}.png
      02_sdfs/<shape_id>.npy                      (N, 4) [xyz, sdf]
      03_splits/{train,val,test,trainval}.lst
      04_img_slices_gen/... / 05_img_slices_rec/...  (generated/recon slices)

Functional equivalent of the reference ``Slice3DDataset``
(reg_slices/src/datasets.py:14-179): slice order X1-4, Z4-1, Y1-4; white-bg
or alpha-masked compositing; bilinear resize; [-1, 1] normalization; camera
matrices from meta.pkl; per-object SDF rescaling with the 0.003 level shift;
random view + random 256-point subsample for train, view 4 + seed 1234 for
val/test.

Arrays are NHWC float32 numpy — the host side of the input pipeline.
"""

from __future__ import annotations

import os
import pickle
import random
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from .. import camera

__all__ = ["Slice3DDataset", "SLICE_ORDER", "load_image", "preprocess_image"]

# Axis/part order of the 12 slices (reference datasets.py:106-111).
SLICE_ORDER: Tuple[Tuple[str, str], ...] = tuple(
    [("X", p) for p in "1234"]
    + [("Z", p) for p in "4321"]
    + [("Y", p) for p in "1234"]
)


def load_image(path: str) -> Image.Image:
    return Image.open(path)


def composite_rgba(img: Image.Image, white_bg: bool) -> np.ndarray:
    """RGBA -> RGB uint8, either alpha-masked onto black or white bg."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3 + [np.full_like(arr, 255)], axis=-1)
    if arr.shape[-1] == 3:
        return arr
    rgb = arr[..., :3].astype(np.float32)
    alpha = arr[..., 3:4].astype(np.float32)
    if white_bg:
        # reference png_2_whitebg: fully transparent pixels -> white
        mask = (alpha == 0).astype(np.float32)
        out = 255.0 * mask + rgb * (1.0 - mask)
    else:
        out = rgb * (alpha / 255.0)
    return out.astype(np.uint8)


def preprocess_image(img: Image.Image, img_size: int, white_bg: bool) -> np.ndarray:
    """Composite, resize (bilinear), normalize to [-1, 1]. Returns (H, W, 3)."""
    rgb = composite_rgba(img, white_bg)
    pil = Image.fromarray(rgb)
    if pil.size != (img_size, img_size):
        pil = pil.resize((img_size, img_size), Image.BILINEAR)
    x = np.asarray(pil).astype(np.float32) / 255.0
    return (x - 0.5) / 0.5


@dataclass
class Slice3DDataset:
    root: str  # data/<dataset> directory
    split: str = "train"
    img_size: int = 128
    n_qry: int = 256
    n_views: int = 12
    n_slices: int = 12
    from_which_slices: str = "gt"  # gt | gt_rec | gen
    use_white_bg: bool = False
    load_slices: bool = True
    load_sdf: bool = True
    load_full_projection: bool = False  # 'trans_mat_right' for DISN
    categories: Sequence[str] = ("",)
    # emit raw uint8 RGBA under *_raw keys; compositing/resize/normalize
    # then run on device (data.device_transforms.DeviceTransformLoader)
    device_preprocess: bool = False

    def __post_init__(self):
        self.files: List[Tuple[str, str]] = []
        for category in self.categories:
            lst = os.path.join(self.root, "03_splits", category, f"{self.split}.lst")
            with open(lst) as f:
                ids = f.read().split()
            self.files.extend((category, sid) for sid in ids)
        self.dir_img_input = os.path.join(self.root, "00_img_input")
        slices_dir = {
            "gt": "01_img_slices",
            "gen": "04_img_slices_gen",
            "gt_rec": "05_img_slices_rec",
        }[self.from_which_slices]
        self.dir_img_slices = os.path.join(self.root, slices_dir)
        self.dir_sdf = os.path.join(self.root, "02_sdfs")
        self._raw_hw = {}  # per-feed first raw resolution (uniformity check)

    def __len__(self) -> int:
        return len(self.files)

    # -- pieces -----------------------------------------------------------

    def view_index(self, rng: Optional[random.Random] = None) -> int:
        if self.split == "train":
            r = rng or random
            return r.randint(0, self.n_views - 1)
        return 4  # fixed eval view (reference datasets.py:95)

    def load_input_view(self, shape_id: str, view: int) -> np.ndarray:
        path = os.path.join(self.dir_img_input, shape_id, "%03d.png" % view)
        return preprocess_image(load_image(path), self.img_size, self.use_white_bg)

    def load_slice_images(self, shape_id: str, view: int) -> np.ndarray:
        """(n_slices, H, W, 3) in dataset slice order."""
        out = []
        vdir = os.path.join(self.dir_img_slices, shape_id, "%03d" % view)
        generated = self.from_which_slices in ("gen", "gt_rec")
        for axis, part in SLICE_ORDER:
            img = load_image(os.path.join(vdir, f"{axis}_{part}.png"))
            if generated:
                # generated slices are already composited RGB (resize if the
                # generation resolution differs from img_size)
                rgb = img.convert("RGB")
                if rgb.size != (self.img_size, self.img_size):
                    rgb = rgb.resize((self.img_size, self.img_size), Image.BILINEAR)
                x = np.asarray(rgb).astype(np.float32) / 255.0
                out.append((x - 0.5) / 0.5)
            else:
                out.append(preprocess_image(img, self.img_size, self.use_white_bg))
        return np.stack(out)

    def load_camera(self, shape_id: str, view: int):
        meta_path = os.path.join(self.dir_img_input, shape_id, "meta.pkl")
        with open(meta_path, "rb") as f:
            meta = pickle.load(f)
        az, el, dist = meta[1][view], meta[2][view], meta[3][view]
        scale, offset = meta[5], meta[6]
        obj_rot, trans_tp = camera.camera_matrices(az, el, dist)
        return (
            obj_rot.astype(np.float32),
            trans_tp.astype(np.float32),
            float(scale),
            np.asarray(offset, dtype=np.float64),
        )

    def load_sdf_samples(self, shape_id: str, scale: float, offset) -> Tuple[np.ndarray, np.ndarray]:
        sdf_npy = np.load(os.path.join(self.dir_sdf, f"{shape_id}.npy"))
        pts, vals = camera.sdf_sample_transform(
            sdf_npy[:, :3], sdf_npy[:, 3], scale, offset
        )
        return pts.astype(np.float32), vals.astype(np.float32)

    # -- sample assembly ---------------------------------------------------

    def load_raw_rgba(self, path: str, group: str = "input") -> np.ndarray:
        """(H, W, 4) uint8 for the device-side preprocess path.

        Raw images are stacked/batched per feed key before the on-device
        resize, so every source PNG within a ``group`` ("input" or
        "slices" — they may differ from each other) must share one
        resolution; the host path resized per image and tolerated mixed
        sizes.  Fail with the offending file instead of a bare np.stack
        shape error mid-epoch.
        """
        arr = np.asarray(load_image(path))
        if arr.ndim == 2:
            arr = np.stack([arr] * 3 + [np.full_like(arr, 255)], axis=-1)
        if arr.shape[-1] == 3:
            arr = np.concatenate(
                [arr, np.full_like(arr[..., :1], 255)], axis=-1)
        first = self._raw_hw.setdefault(group, arr.shape[:2])
        if arr.shape[:2] != first:
            raise ValueError(
                f"device_preprocess needs uniform source resolutions per "
                f"feed: {path} is {arr.shape[:2]}, {group} images started "
                f"with {first} (resize the renders or disable "
                f"device_preprocess)")
        return np.ascontiguousarray(arr, np.uint8)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        category, shape_id = self.files[index]
        view = self.view_index()

        obj_rot, trans_tp, scale, offset = self.load_camera(shape_id, view)
        feed: Dict[str, np.ndarray] = {
            "obj_rot_mat": obj_rot,
            "trans_mat_wo_rot_tp": trans_tp,
        }
        if self.device_preprocess:
            feed["img_input_raw"] = self.load_raw_rgba(os.path.join(
                self.dir_img_input, shape_id, "%03d.png" % view))
        else:
            feed["img_input"] = self.load_input_view(
                shape_id, view).astype(np.float32)
        if self.load_full_projection:
            import pickle as _pickle

            with open(os.path.join(self.dir_img_input, shape_id, "meta.pkl"), "rb") as f:
                meta = _pickle.load(f)
            feed["trans_mat_right"] = camera.full_projection_matrix(
                meta[1][view], meta[2][view], meta[3][view]
            ).astype(np.float32)
        if self.load_slices:
            if self.device_preprocess and self.from_which_slices == "gt":
                vdir = os.path.join(self.dir_img_slices, shape_id,
                                    "%03d" % view)
                feed["img_slices_raw"] = np.stack([
                    self.load_raw_rgba(os.path.join(vdir, f"{a}_{p}.png"),
                                       group="slices")
                    for a, p in SLICE_ORDER])
            else:
                feed["img_slices"] = self.load_slice_images(
                    shape_id, view).astype(np.float32)
        if self.load_sdf:
            pts, vals = self.load_sdf_samples(shape_id, scale, offset)
            if self.split == "train":
                perm = np.random.permutation(len(pts))[: self.n_qry]
            else:
                perm = np.random.RandomState(1234).permutation(len(pts))[: self.n_qry]
            feed["qry_norot"] = pts[perm]
            feed["sdf"] = vals[perm]
            feed["occ"] = (vals[perm] <= 0).astype(np.float32)
        return feed
