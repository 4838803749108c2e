#!/usr/bin/env python
"""Train the GT-slices-to-3D model (reference reg_slices/train_gt.py CLI).

  python train_gt.py --name_exp exp_gt --name_dataset objaverse \
      --from_which_slices gt_rec
"""

from slice3d_tpu.config import options_from_args
from slice3d_tpu.train.train_reg import train


def main(argv=None):
    from slice3d_tpu.utils.cache import enable_compilation_cache

    from slice3d_tpu.parallel import init_distributed

    # join a multi-host cluster when SLICE3D_COORDINATOR/
    # NUM_PROCESSES/PROCESS_ID are set; MUST run before anything
    # initializes the XLA backend
    init_distributed()
    enable_compilation_cache()
    opts = options_from_args(argv)
    opts.name_model = "gtslice"
    train(opts)


if __name__ == "__main__":
    main()
