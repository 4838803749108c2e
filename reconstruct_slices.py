#!/usr/bin/env python
"""Dump SliceNet's predicted slice images as PNGs
(reference reg_slices/reconstruct_slices.py CLI).

Writes experiments/<exp>/results_slices/<dataset>/<id>/{X,Z,Y}_{1..4}.png at
256x256 in the dataset slice naming (X1-4, Z4-1, Y1-4).
"""

import os

import numpy as np
from PIL import Image

from slice3d_tpu.config import options_from_args
from slice3d_tpu.data import Slice3DDataset, SLICE_ORDER
from slice3d_tpu.models.build import build_model, load_model_variables
from slice3d_tpu.pipeline import Reconstructor


def main(argv=None):
    opts = options_from_args(argv)

    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    opts.name_model = "slicenet"

    model = build_model(opts)
    ckpt_path = os.path.join(opts.exp_dir, "ckpt", opts.name_ckpt) if opts.name_ckpt else None
    variables = load_model_variables(model, opts, ckpt_path)
    recon = Reconstructor(model, variables)

    dataset = Slice3DDataset(
        opts.dataset_root, split="test", img_size=opts.img_size,
        n_views=opts.n_views, use_white_bg=opts.use_white_bg,
        load_slices=False, load_sdf=False, categories=opts.categories,
    )

    out_root = os.path.join(opts.exp_dir, "results_slices", opts.name_dataset)
    for idx in range(len(dataset)):
        _, shape_id = dataset.files[idx]
        feed = dataset[idx]
        slices = recon.predicted_slices(feed["img_input"])  # (S, H, W, 3) [-1,1]
        out_dir = os.path.join(out_root, shape_id)
        os.makedirs(out_dir, exist_ok=True)
        for s, (axis, part) in enumerate(SLICE_ORDER):
            img = ((slices[s] + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
            pil = Image.fromarray(img).resize((256, 256), Image.BILINEAR)
            pil.save(os.path.join(out_dir, f"{axis}_{part}.png"))
        print(f"[{idx + 1}/{len(dataset)}] wrote slices for {shape_id}")


if __name__ == "__main__":
    main()
