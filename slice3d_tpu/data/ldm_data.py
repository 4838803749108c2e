"""LDM slice dataset: 12 slice images + input view per sample.

Rebuild of the reference Objaverse/custom-sin-img LDM datasets
(``gen_slices/ldm/data/objaverse.py:9-115`` and ``custom_sin_img.py:9-105``):
each sample stacks the 12 slice images (order X1-4, Z4-1, Y1-4) plus the
input view, all white-bg composited and resized to ``size``, normalised to
[-1, 1].  Where the reference concatenates to one 39-channel HWC array we
keep a (13, H, W, 3) stack — the atlas/tiling lives on-device in
``ops/atlas.py`` so the host pipeline stays a plain memcpy.

Split semantics (reference ``objaverse.py:57-62``):
  * ``train``        — random view per fetch.
  * ``validation`` / ``test`` — fixed view 4.
  * ``trainval_rec`` — iterates the trainval list once per view
    (index ``i`` -> shape ``i % n_shapes``, view ``i // n_shapes``),
    used to dump VAE reconstructions for gtslice training.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from .dataset import SLICE_ORDER, load_image, preprocess_image

__all__ = ["LDMSliceDataset"]

_SPLIT_LST = {
    "train": "train.lst",
    "validation": "val.lst",
    "val": "val.lst",
    "test": "test.lst",
    "trainval_rec": "trainval.lst",
}


@dataclass
class LDMSliceDataset:
    root: str
    split: str = "train"
    size: int = 128
    n_views: int = 12
    from_which_slices: str = "gt"  # gt | gt_rec | gen

    def __post_init__(self):
        lst = os.path.join(self.root, "03_splits", _SPLIT_LST[self.split])
        with open(lst) as f:
            self.image_ids: List[str] = f.read().split()
        self.n_shapes = len(self.image_ids)
        slices_dir = {
            "gt": "01_img_slices",
            "gen": "04_img_slices_gen",
            "gt_rec": "05_img_slices_rec",
        }[self.from_which_slices]
        self.dir_img_slices = os.path.join(self.root, slices_dir)
        self.dir_img_input = os.path.join(self.root, "00_img_input")

    def __len__(self) -> int:
        if self.split == "trainval_rec":
            return self.n_shapes * self.n_views
        return self.n_shapes

    def _view_for(self, index: int, rng: Optional[random.Random]) -> int:
        if self.split == "train":
            return (rng or random).randint(0, self.n_views - 1)
        if self.split == "trainval_rec":
            return index // self.n_shapes
        return 4  # fixed eval view (reference objaverse.py:60)

    def __getitem__(self, index: int, rng: Optional[random.Random] = None
                    ) -> Dict[str, np.ndarray]:
        shape_id = self.image_ids[index % self.n_shapes]
        view = self._view_for(index, rng)
        vname = "%03d" % view

        imgs = []
        vdir = os.path.join(self.dir_img_slices, shape_id, vname)
        for axis, part in SLICE_ORDER:
            img = load_image(os.path.join(vdir, f"{axis}_{part}.png"))
            imgs.append(preprocess_image(img, self.size, white_bg=True))

        ipt_path = os.path.join(self.dir_img_input, shape_id, f"{vname}.png")
        img_ipt = preprocess_image(load_image(ipt_path), self.size, white_bg=True)
        imgs.append(img_ipt)

        # batches must stay numeric (device upload); shape id is recoverable
        # from the split list order when writing outputs
        return {
            "image": np.stack(imgs).astype(np.float32),  # (13, H, W, 3)
            "img_ipt_view": img_ipt.astype(np.float32),
            "view": np.int32(view),
        }
