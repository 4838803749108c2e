#!/usr/bin/env python
"""Build a single-image dataset (reference create_dataset_sin_img.py CLI).

  python create_dataset_sin_img.py --img_path ./input.png \
      --name_dataset custom_sin_img
"""

import argparse
import os

from slice3d_tpu.data.builders import create_single_image_dataset


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_path", type=str, default="./imgs/demo/input.png")
    parser.add_argument("--name_dataset", type=str, default="custom_sin_img")
    parser.add_argument("--dir_data", type=str, default="./data")
    parser.add_argument("--img_size", type=int, default=256)
    parser.add_argument("--center_obj", type=bool, default=True)
    args = parser.parse_args(argv)

    root = create_single_image_dataset(
        args.img_path,
        os.path.join(args.dir_data, args.name_dataset),
        img_size=args.img_size,
        center_obj=args.center_obj,
    )
    print(f"dataset written to {root}")


if __name__ == "__main__":
    main()
