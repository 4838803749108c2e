#!/usr/bin/env python
"""Projection self-check (reference reg_slices/test_projection.py).

Projects near-surface GT SDF samples through the full camera chain onto the
rendered input view and writes an annotated PNG — a visual check that the
camera math matches the renderer.

  python test_projection.py --dir_data ./data --name_dataset objaverse \
      --shape_idx 0 --view 4 --out proj_check.png
"""

import argparse

import numpy as np
from PIL import Image, ImageDraw

from slice3d_tpu.data.dataset import Slice3DDataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir_data", type=str, default="./data")
    p.add_argument("--name_dataset", type=str, default="objaverse")
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--shape_idx", type=int, default=0)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--n_pts", type=int, default=300)
    p.add_argument("--out", type=str, default="proj_check.png")
    args = p.parse_args()

    ds = Slice3DDataset(
        f"{args.dir_data}/{args.name_dataset}", split=args.split,
        img_size=args.img_size, n_qry=8192,
    )
    sample = ds[args.shape_idx]

    img = ((sample["img_input"] + 1) * 127.5).astype(np.uint8)
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)

    qry = sample["qry_norot"]
    sdf = sample["sdf"]
    band = np.argsort(np.abs(sdf))[: args.n_pts]
    pts = qry[band] @ sample["obj_rot_mat"]

    homo = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
    uvw = homo @ sample["trans_mat_wo_rot_tp"]
    xy = uvw[:, :2] / uvw[:, 2:3]
    px = xy * args.img_size

    for x, y in px:
        draw.ellipse([x - 2, y - 2, x + 2, y + 2], outline=(255, 0, 0))
    pil.save(args.out)
    print(f"wrote {args.out} with {len(px)} projected surface points")


if __name__ == "__main__":
    main()
