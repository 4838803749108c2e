"""End-to-end generation route over the ON-DISK interchange.

Reference call stack 3.4: main.py test/sample mode writes slice montages
-> re_org_slices.py crops them into 04_img_slices_gen/<id>/004/ ->
reconstruct.py --name_model gtslice --from_which_slices gen regresses the
SDF from the generated slices.  The three CLIs only communicate through
files, so this pins the interchange conventions (montage grid order,
tile naming X_1..4/Z_4..1/Y_1..4, view 004, directory layout) that no
single-module test can see drift in.
"""

import glob
import os

import numpy as np
import pytest
import yaml

from slice3d_tpu.data.builders import create_synthetic_dataset


@pytest.mark.nightly
def test_generation_route_end_to_end(tmp_path):
    import main as launcher
    import re_org_slices
    import reconstruct

    data_root = str(tmp_path / "data")
    root = create_synthetic_dataset(os.path.join(data_root, "objaverse"),
                                    n_shapes=2, n_views=6, img_size=32,
                                    n_sdf=128)

    # 1. sample slices with a tiny random-init LDM (montages to logdir)
    cfg = {
        "model": {
            "base_learning_rate": 5e-5,
            "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
            "params": {
                "timesteps": 20,
                "unet_config": {"params": {"model_channels": 32,
                                           "channel_mult": [1, 2],
                                           "num_res_blocks": 1}},
                "first_stage_config": {"params": {"ddconfig": {
                    "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1}}},
            },
        },
        "data": {"params": {
            "batch_size": 2,
            "test": {"params": {"size": 32, "root": root}},
        }},
    }
    cfg_path = tmp_path / "ldm_tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    logroot = tmp_path / "logs"
    launcher.main(["-b", str(cfg_path), "--mode", "sample",
                   "-l", str(logroot), "-n", "gen_e2e",
                   "--ddim_steps", "2"])
    logdir = os.path.join(logroot, os.listdir(logroot)[0])
    montages = glob.glob(os.path.join(logdir, "images_testing_sampled",
                                      "*_[0-9].png"))
    assert montages, "sample mode wrote no montages"

    # 2. crop montages back into the dataset layout (04_img_slices_gen)
    re_org_slices.crop_slices(re_org_slices.get_parser().parse_args([
        "--dir_slices", os.path.join(logdir, "images_testing_sampled"),
        "--type_slices", "gen", "--name_dataset", "objaverse",
        "--dir_data", data_root, "--img_size", "32", "--n_bs", "2",
    ]))
    for sid in ("00000", "00001"):
        tiles = sorted(os.listdir(
            os.path.join(root, "04_img_slices_gen", sid, "004")))
        assert len(tiles) == 12
        assert {t.split("_")[0] for t in tiles} == {"X", "Y", "Z"}

    # 3. reconstruct meshes FROM the generated slices (gtslice route)
    reconstruct.main([
        "--name_model", "gtslice", "--from_which_slices", "gen",
        "--dir_data", data_root, "--name_dataset", "objaverse",
        "--img_size", "32", "--n_views", "6", "--random_init",
        "--mc_res0", "8", "--mc_up_steps", "0", "--mc_chunk_size", "1024",
        "--dir_experiments", str(tmp_path / "exp"), "--name_exp", "gen_e2e",
    ])
    objs = sorted(glob.glob(str(tmp_path / "exp" / "gen_e2e" / "results" /
                                "objaverse" / "*.obj")))
    assert [os.path.basename(p) for p in objs] == ["00000.obj", "00001.obj"]


@pytest.mark.nightly
def test_ldm_train_cli(tmp_path):
    """main.py -t on an LDM config: the reference's primary training CLI
    (gen_slices/main.py trainer.fit route) — train steps, full-split
    validation, top-k + last checkpoints, scalar logging."""
    import main as launcher
    from slice3d_tpu.train.checkpoint import restore_checkpoint

    root = create_synthetic_dataset(str(tmp_path / "ds"), n_shapes=2,
                                    n_views=6, img_size=32, n_sdf=64)
    cfg = {
        "model": {
            "base_learning_rate": 5e-5,
            "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
            "params": {
                "timesteps": 20,
                "unet_config": {"params": {"model_channels": 32,
                                           "channel_mult": [1, 2],
                                           "num_res_blocks": 1,
                                           "attention_resolutions": [2]}},
                "first_stage_config": {"params": {"ddconfig": {
                    "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1}}},
            },
        },
        "data": {"params": {
            "batch_size": 2,
            "train": {"params": {"size": 32, "root": root, "n_views": 6}},
            "validation": {"params": {"size": 32, "root": root,
                                      "n_views": 6}},
        }},
    }
    cfg_path = tmp_path / "ldm_tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    logroot = tmp_path / "logs"
    launcher.main(["-b", str(cfg_path), "-t", "-l", str(logroot),
                   "-n", "ldm_train", "--max_steps", "2",
                   "--ckpt_every", "2", "--val_every", "2",
                   "--log_images_every", "0"])
    run = os.path.join(logroot, os.listdir(logroot)[0])
    cks = os.listdir(os.path.join(run, "checkpoints"))
    assert "last.ckpt" in cks
    assert any(c.startswith("step=") and "loss_simple_ema" in c for c in cks)
    payload = restore_checkpoint(os.path.join(run, "checkpoints", "last.ckpt"))
    assert int(np.asarray(payload["step"])) == 2
    import jax

    for leaf in jax.tree_util.tree_leaves(payload["variables"]["params"]):
        assert np.isfinite(np.asarray(leaf)).all()
