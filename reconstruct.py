#!/usr/bin/env python
"""Reconstruct meshes for a test split (reference reg_slices/reconstruct.py CLI).

Examples:
  python reconstruct.py --name_model gtslice --name_dataset objaverse \
      --name_exp my_exp --name_ckpt model.ckpt --mode test --from_which_slices gt
  python reconstruct.py --name_model slicenet --name_dataset custom_sin_img \
      --mode test --random_init   # smoke run without weights

Writes experiments/<exp>/results/<dataset>/<shape_id>.obj.
"""

import os
import sys
import time

from slice3d_tpu.config import options_from_args
from slice3d_tpu.data import Slice3DDataset
from slice3d_tpu.mesh import export_obj
from slice3d_tpu.models.build import build_model, load_model_variables
from slice3d_tpu.pipeline import Reconstructor


def main(argv=None):
    opts = options_from_args(argv)

    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # Validate the dataset before any (slow) device compilation.
    dataset = Slice3DDataset(
        opts.dataset_root,
        split="test",
        img_size=opts.img_size,
        n_qry=opts.n_qry,
        n_views=opts.n_views,
        from_which_slices=opts.from_which_slices,
        use_white_bg=opts.use_white_bg,
        load_slices=(opts.name_model == "gtslice"),
        load_sdf=False,
        categories=opts.categories,
    )

    model = build_model(opts)
    ckpt_path = None
    if opts.name_ckpt:
        ckpt_path = os.path.join(opts.exp_dir, "ckpt", opts.name_ckpt)
    variables = load_model_variables(model, opts, ckpt_path)

    recon = Reconstructor(
        model,
        variables,
        resolution0=opts.mc_res0,
        upsampling_steps=opts.mc_up_steps,
        threshold=opts.mc_threshold,
        chunk_size=opts.mc_chunk_size,
        simplify_nfaces=opts.simplify_nfaces,
    )

    out_dir = os.path.join(opts.exp_dir, "results", opts.name_dataset)
    os.makedirs(out_dir, exist_ok=True)

    for idx in range(len(dataset)):
        _, shape_id = dataset.files[idx]
        path_mesh = os.path.join(out_dir, f"{shape_id}.obj")
        if os.path.exists(path_mesh) and not opts.overwrite_res:
            continue
        feed = dataset[idx]
        t0 = time.perf_counter()
        mesh, stats = recon.reconstruct(feed)
        dt = time.perf_counter() - t0
        export_obj(mesh, path_mesh)
        print(
            f"[{idx + 1}/{len(dataset)}] {shape_id}: {len(mesh.vertices)} verts, "
            f"{len(mesh.faces)} faces in {dt:.2f}s "
            f"(eval {stats['time_eval_points']:.2f}s over "
            f"{stats['n_points_evaluated']} pts, mc {stats['time_marching']:.2f}s)"
        )


if __name__ == "__main__":
    main()
