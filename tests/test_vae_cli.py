"""End-to-end drive of the VAE finetune route through the main.py CLI.

The reference trains the AE through the same launcher
(gen_slices/main.py:542 + ldm/models/autoencoder.py:442-451, configs under
gen_slices/configs/autoencoder/).  A few steps on a tiny synthetic dataset
must construct VAEFinetuneTrainer, run the dual (AE + discriminator)
update, validate on the full val split, and checkpoint.
"""

import os
import sys

import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slice3d_tpu.data.builders import create_synthetic_dataset


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    return create_synthetic_dataset(
        str(tmp_path_factory.mktemp("vae_ds")), n_shapes=2, n_views=12,
        img_size=16, n_sdf=64,
    )


def _tiny_cfg(root):
    return {
        "model": {
            "base_learning_rate": 4.5e-6,
            "target": "ldm.models.autoencoder.AutoencoderKL",
            "params": {
                "monitor": "val/rec_loss",
                "embed_dim": 4,
                "lossconfig": {
                    "target": "ldm.modules.losses.LPIPSWithDiscriminator",
                    "params": {"disc_start": 1, "kl_weight": 1e-6,
                               "disc_weight": 0.5},
                },
                # ch must be a multiple of 32 (GroupNorm groups)
                "ddconfig": {
                    "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
                    "z_channels": 4,
                },
            },
        },
        "data": {
            "params": {
                "batch_size": 2,
                "train": {"params": {"size": 16, "root": root}},
                "validation": {"params": {"size": 16, "root": root}},
            },
        },
    }


def test_vae_finetune_cli(tmp_path, ds_root):
    import main as launcher

    cfg_path = tmp_path / "vae_tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_tiny_cfg(ds_root), f)

    logdir = tmp_path / "logs"
    launcher.main([
        "-b", str(cfg_path), "-t",
        "-l", str(logdir), "-n", "vae_e2e",
        "--max_steps", "2", "--ckpt_every", "2", "--val_every", "2",
        "--log_images_every", "2",
    ])

    runs = os.listdir(logdir)
    assert len(runs) == 1
    run_dir = logdir / runs[0]
    ckpts = os.listdir(run_dir / "checkpoints")
    assert "last.ckpt" in ckpts
    # top-k checkpoint on val/rec_loss was written at step 2
    assert any(c.startswith("step=") and "val_rec_loss" in c for c in ckpts)
    # ImageLogger-style montages
    imgs = os.listdir(run_dir / "images" / "train")
    assert any(i.startswith("inputs") for i in imgs)
    assert any(i.startswith("reconstruction") for i in imgs)
    # training stayed numerically healthy (guards the empty-PatchGAN-logits
    # NaN: 16^2 images need the auto-shrunk 2-layer discriminator)
    import jax
    import numpy as np
    from slice3d_tpu.train.checkpoint import restore_checkpoint

    payload = restore_checkpoint(str(run_dir / "checkpoints" / "last.ckpt"))
    for leaf in jax.tree_util.tree_leaves(payload["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_vae_finetune_resume(tmp_path, ds_root):
    """Resuming from last.ckpt restores the step counter and keeps going."""
    import main as launcher

    cfg_path = tmp_path / "vae_tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_tiny_cfg(ds_root), f)

    logdir = tmp_path / "logs"
    launcher.main([
        "-b", str(cfg_path), "-t", "-l", str(logdir), "-n", "vae_resume",
        "--max_steps", "1", "--ckpt_every", "1", "--val_every", "0",
        "--log_images_every", "0",
    ])
    run_dir = logdir / os.listdir(logdir)[0]
    launcher.main([
        "-b", str(cfg_path), "-t", "-r", str(run_dir),
        "--max_steps", "2", "--ckpt_every", "2", "--val_every", "0",
        "--log_images_every", "0",
    ])
    assert os.path.exists(run_dir / "checkpoints" / "last.ckpt")
