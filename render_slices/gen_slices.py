#!/usr/bin/env python
"""Render GT slice images for objects that already have input views.

Driver (role of reference render_slices/gen_slices.py): per object, shell
out to Blender with blender_script_slices.py to cut the mesh into 4 slabs
per camera-aligned axis and render each slab.  Oversized meshes are
skipped; failures drop markers; finished views are skipped (resumable).

  python render_slices/gen_slices.py --models_json models.json \
      --dir_out data/objaverse --slice_direction camera
"""

import argparse
import json
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor

SCRIPT = os.path.join(os.path.dirname(__file__), "blender_script_slices.py")
MAX_MESH_BYTES = 100 * 1024 * 1024  # skip >100MB meshes


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--models_json", type=str, required=True)
    p.add_argument("--dir_out", type=str, default="data/objaverse")
    p.add_argument("--n_jobs", type=int, default=8)
    p.add_argument("--n_views", type=int, default=12)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--slice_direction", type=str, default="camera",
                   choices=["camera", "axis"])
    p.add_argument("--blender", type=str, default="blender")
    return p


def slice_one(args, shape_id, glb_path):
    if os.path.getsize(glb_path) > MAX_MESH_BYTES:
        return
    out_dir = os.path.join(args.dir_out, "01_img_slices", shape_id)
    done = os.path.join(out_dir, "%03d" % (args.n_views - 1), "Y_4.png")
    if os.path.exists(done):
        return
    meta = os.path.join(args.dir_out, "00_img_input", shape_id, "meta.pkl")
    if not os.path.exists(meta):
        return
    cmd = [
        args.blender, "-b", "-P", SCRIPT, "--",
        "--object_path", glb_path,
        "--meta_path", meta,
        "--output_dir", out_dir,
        "--n_views", str(args.n_views),
        "--resolution", str(args.resolution),
        "--slice_direction", args.slice_direction,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=1800)
    except Exception as exc:
        fail_dir = os.path.join("logs", "failed")
        os.makedirs(fail_dir, exist_ok=True)
        with open(os.path.join(fail_dir, f"{shape_id}.txt"), "w") as f:
            f.write(str(exc))


def main():
    args = get_parser().parse_args()
    with open(args.models_json) as f:
        models = json.load(f)
    with ThreadPoolExecutor(args.n_jobs) as pool:
        futures = [
            pool.submit(slice_one, args, sid, path) for sid, path in models.items()
        ]
        for i, fut in enumerate(futures):
            fut.result()
            if i % 100 == 0:
                print(f"{i}/{len(futures)}")


if __name__ == "__main__":
    main()
