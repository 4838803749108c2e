#!/usr/bin/env python
"""Train the SliceNet regression model (reference reg_slices/train.py CLI).

  python train.py --name_exp exp1 --name_dataset objaverse --name_model slicenet
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
    if opts.name_model == "gtslice":
        raise SystemExit("use train_gt.py for the gtslice model")
    train(opts)


if __name__ == "__main__":
    main()
