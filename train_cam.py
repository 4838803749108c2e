#!/usr/bin/env python
"""Train the camera-pose estimator used by ``reconstruct.py --est_campose``.

The reference ships only a dead TF1 trainer for this model
(reg_slices/src/train_cam_est_disn.py: its imports don't exist in-repo,
and its dataset has hardcoded local paths, datasets_cam.py:37-40); this
CLI trains the working equivalent (`slice3d_tpu/train/train_cam.py`) over
the standard Slice3D dataset layout.

  python train_cam.py --name_exp_cam cam1 --name_dataset objaverse
"""

from slice3d_tpu.config import options_from_args
from slice3d_tpu.train.train_cam import CamTrainer


def main(argv=None):
    from slice3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    opts = options_from_args(argv)
    CamTrainer(lr=opts.lr).train(opts)


if __name__ == "__main__":
    main()
