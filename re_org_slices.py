#!/usr/bin/env python
"""Crop sampled slice montages back into the dataset layout
(reference gen_slices/re_org_slices.py CLI).

gen:  <dir_slices>/{batch}_{case}.png -> data/<ds>/04_img_slices_gen/<id>/004/
rec:  same montages over trainval x views -> data/<ds>/05_img_slices_rec/...
Slice naming follows the dataset order: X_1..4, Z_4..1 (reversed), Y_1..4.
"""

import argparse
import os

from PIL import Image

from slice3d_tpu.data.dataset import SLICE_ORDER


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--dir_slices", type=str, required=True)
    p.add_argument("--type_slices", type=str, default="gen", choices=["gen", "rec"])
    p.add_argument("--name_dataset", type=str, default="objaverse")
    p.add_argument("--dir_data", type=str, default="./data")
    p.add_argument("--img_size", type=int, default=128)
    p.add_argument("--n_bs", type=int, default=8)
    p.add_argument("--n_views", type=int, default=12)
    return p


def crop_slices(args):
    root = os.path.join(args.dir_data, args.name_dataset)
    if args.type_slices == "gen":
        dir_tgt = os.path.join(root, "04_img_slices_gen")
        with open(os.path.join(root, "03_splits", "test.lst")) as f:
            uids = f.read().split()
    else:
        dir_tgt = os.path.join(root, "05_img_slices_rec")
        with open(os.path.join(root, "03_splits", "trainval.lst")) as f:
            base = f.read().split()
        uids = base * args.n_views

    n_base = len(uids) // args.n_views if args.type_slices == "rec" else len(uids)
    size = args.img_size
    for idx, uid in enumerate(uids):
        batch_id, case_id = divmod(idx, args.n_bs)
        view = "004" if args.type_slices == "gen" else "%03d" % (idx // n_base)
        src = os.path.join(args.dir_slices, f"{batch_id}_{case_id}.png")
        if not os.path.exists(src):
            continue
        img = Image.open(src)
        out_dir = os.path.join(dir_tgt, uid, view)
        os.makedirs(out_dir, exist_ok=True)
        # montage grid is row-major slice order == dataset SLICE_ORDER
        for s, (axis, part) in enumerate(SLICE_ORDER):
            r, c = divmod(s, 4)
            tile = img.crop((c * size, r * size, (c + 1) * size, (r + 1) * size))
            dst = os.path.join(out_dir, f"{axis}_{part}.png")
            if args.type_slices == "rec" and os.path.exists(dst):
                continue
            tile.save(dst)
        if idx % 1000 == 0:
            print(idx)


if __name__ == "__main__":
    crop_slices(get_parser().parse_args())
