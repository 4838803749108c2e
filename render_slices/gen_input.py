#!/usr/bin/env python
"""Render input views for a set of .glb objects (offline data generation).

Parallel driver that shells out to headless Blender per object
(role of the reference render_slices/gen_input.py): writes
``data/<dataset>/00_img_input/<shape_id>/{000..011}.png`` + ``meta.pkl``.

Requires a Blender binary on PATH (not available in CI — this stage runs
wherever the raw Objaverse assets live).  Failures drop a marker under
``logs/failed/`` and do not stop the sweep; finished objects are skipped,
so the sweep is resumable.

  python render_slices/gen_input.py --models_json input_models_path.json \
      --dir_out data/objaverse --n_jobs 8
"""

import argparse
import json
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor

SCRIPT = os.path.join(os.path.dirname(__file__), "blender_script_input.py")


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--models_json", type=str, required=True,
                   help="json mapping shape_id -> .glb path")
    p.add_argument("--dir_out", type=str, default="data/objaverse")
    p.add_argument("--n_jobs", type=int, default=8)
    p.add_argument("--n_views", type=int, default=12)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--blender", type=str, default="blender")
    return p


def render_one(args, shape_id, glb_path):
    out_dir = os.path.join(args.dir_out, "00_img_input", shape_id)
    if os.path.exists(os.path.join(out_dir, "meta.pkl")):
        return  # idempotent
    cmd = [
        args.blender, "-b", "-P", SCRIPT, "--",
        "--object_path", glb_path,
        "--output_dir", out_dir,
        "--n_views", str(args.n_views),
        "--resolution", str(args.resolution),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    except Exception as exc:  # failure marker, keep sweeping
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
            pool.submit(render_one, args, sid, path) for sid, path in models.items()
        ]
        for i, fut in enumerate(futures):
            fut.result()
            if i % 100 == 0:
                print(f"{i}/{len(futures)}")


if __name__ == "__main__":
    main()
