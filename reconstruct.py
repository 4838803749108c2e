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
import time

from slice3d_tpu.config import options_from_args
from slice3d_tpu.data import Slice3DDataset
from slice3d_tpu.mesh import export_obj
from slice3d_tpu.models.build import build_model, load_model_variables
from slice3d_tpu.pipeline import Reconstructor


def _build_campose_predictor(opts):
    """Estimated-camera-pose path (reference reconstruct.py:390-406):
    CameraNet predicts the inverse rotation; the recorded sign fixes and
    row swap map it into the dataset's obj_rot_mat convention, and the
    predicted full projection replaces trans_mat_right."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slice3d_tpu import camera
    from slice3d_tpu.models.camnet import CameraNet, _ROT_MAT_INV

    cam_model = CameraNet(train_bn=False)
    ckpt = None
    if opts.name_ckpt_cam:
        ckpt = os.path.join(opts.dir_experiments, opts.name_exp_cam, "ckpt",
                            opts.name_ckpt_cam)
    if ckpt and os.path.exists(ckpt):
        from slice3d_tpu.models.build import _is_torch_file
        from slice3d_tpu.train.checkpoint import restore_checkpoint

        if _is_torch_file(ckpt):
            import torch

            from slice3d_tpu.convert import torch_import

            payload = torch.load(ckpt, map_location="cpu", weights_only=False)
            sd = payload.get("model", payload)
            cam_vars = torch_import.camnet_model(sd)
        else:
            cam_vars = restore_checkpoint(ckpt)["variables"]
    else:
        cam_vars = cam_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, opts.img_size, opts.img_size, 3))
        )
        print("est_campose: no camera checkpoint found, using random weights")

    predict = jax.jit(lambda v, img: cam_model.apply(v, img))
    k = camera.intrinsics(1.0, 1.0).astype(np.float32)

    def apply(feed):
        out = predict(cam_vars, jnp.asarray(feed["img_input"])[None])
        rot = np.asarray(out["pred_rotation_mat_inv"][0]).copy()
        # reference sign fixes + row swap (reconstruct.py:394-403)
        rot[0, 1] *= -1.0
        rot[0, 2] *= -1.0
        rot[2, 1] *= -1.0
        rot[2, 2] *= -1.0
        rot[1, 0] *= -1.0
        rot[[1, 2]] = rot[[2, 1]]
        feed["obj_rot_mat"] = rot.astype(np.float32)

        pred_rt_inv = np.asarray(out["pred_RT_inv"][0])  # (4, 3)
        rot_inv = np.asarray(_ROT_MAT_INV)
        pred_regress = rot_inv @ pred_rt_inv  # norm_mat = identity here
        feed["trans_mat_right"] = (k @ pred_regress.T).T.astype(np.float32)
        return feed

    return apply


def main(argv=None):
    opts = options_from_args(argv)

    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # Split follows --mode like the reference CLI (reconstruct.py:334-415);
    # train-mode invocations still reconstruct the test split.
    split = opts.mode if opts.mode in ("val", "test", "trainval") else "test"

    # Validate the dataset before any (slow) device compilation.
    dataset = Slice3DDataset(
        opts.dataset_root,
        split=split,
        img_size=opts.img_size,
        n_qry=opts.n_qry,
        n_views=opts.n_views,
        from_which_slices=opts.from_which_slices,
        use_white_bg=opts.use_white_bg,
        load_slices=(opts.name_model == "gtslice"),
        load_sdf=False,
        load_full_projection=(opts.name_model == "disn"),
        categories=opts.categories,
    )

    model = build_model(opts)
    ckpt_path = None
    if opts.name_ckpt:
        ckpt_path = os.path.join(opts.exp_dir, "ckpt", opts.name_ckpt)
    variables = load_model_variables(model, opts, ckpt_path)

    cam_predict = None
    if opts.est_campose:
        cam_predict = _build_campose_predictor(opts)

    # mc_batch_size > 1 pools objects per device dispatch; with multiple
    # chips either the object batch (throughput) or each object's query
    # point axis (latency, --mc_shard_axis points) shards over the mesh.
    batch = max(opts.mc_batch_size, 1)
    import jax

    from slice3d_tpu.parallel import reconstruction_mesh

    mesh = reconstruction_mesh(opts.mc_shard_axis, batch,
                               opts.mc_chunk_size, len(jax.devices()))

    recon = Reconstructor(
        model,
        variables,
        resolution0=opts.mc_res0,
        upsampling_steps=opts.mc_up_steps,
        threshold=opts.mc_threshold,
        chunk_size=opts.mc_chunk_size,
        simplify_nfaces=opts.simplify_nfaces,
        refine_steps=opts.mc_refine_steps,
        batch_size=batch,
        mesh=mesh,
        extract_method=opts.mc_extract,
        shard_axis=opts.mc_shard_axis,
    )

    out_dir = os.path.join(opts.exp_dir, "results", opts.name_dataset)
    os.makedirs(out_dir, exist_ok=True)

    todo = []
    for idx in range(len(dataset)):
        _, shape_id = dataset.files[idx]
        path_mesh = os.path.join(out_dir, f"{shape_id}.obj")
        if os.path.exists(path_mesh) and not opts.overwrite_res:
            continue
        todo.append((idx, shape_id, path_mesh))
    if not todo:
        print("all result meshes exist (use --overwrite_res to redo)")
        return

    def feeds():
        for idx, _, _ in todo:
            feed = dataset[idx]
            if cam_predict is not None:
                feed = cam_predict(feed)
            yield feed

    t_start = time.perf_counter()

    def on_result(j, mesh, stats):
        _, shape_id, path_mesh = todo[j]
        export_obj(mesh, path_mesh)
        print(
            f"[{j + 1}/{len(todo)}] {shape_id}: {len(mesh.vertices)} verts, "
            f"{len(mesh.faces)} faces "
            f"(eval {stats['time_eval_points']:.2f}s over "
            f"{stats['n_points_evaluated']} pts, mc {stats['time_marching']:.2f}s)"
        )

    # device eval of object i+1 overlaps host meshing of object i
    recon.reconstruct_all(feeds(), on_result)
    total = time.perf_counter() - t_start
    print(f"{len(todo)} objects in {total:.2f}s "
          f"({60.0 * len(todo) / max(total, 1e-9):.1f} objects/min)")


if __name__ == "__main__":
    main()
