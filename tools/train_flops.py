"""Analytic FLOP count of a training step via XLA's own cost model.

Lowers the exact train_step used by bench_all configs 6/7 for the CPU
backend (lowering only — no compile, no execution) and prints the HLO
cost analysis as one JSON line: {"config": N, "flops_per_step": F}.

Run in a SUBPROCESS: the axon TPU plugin's remote-compile path returns a
stub cost analysis, so the parent bench process (which holds the TPU
backend) cannot do this in-process.  Forward-pass conv/matmul FLOPs from
unoptimized HLO are exact; fusion only changes elementwise accounting,
which is noise at these shapes.

Usage: python tools/train_flops.py {6|7}
Shapes honor the same BENCH6_*/BENCH7_* env knobs as bench_all.py.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

ENV = os.environ.get


def _sds(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "aval") else jax.ShapeDtypeStruct(x.shape, x.dtype),
        tree)


def flops6():
    from slice3d_tpu.config import Options
    from slice3d_tpu.models.vgg import VGG19Features
    from slice3d_tpu.train.train_reg import RegressionTrainer

    bs = int(ENV("BENCH6_BS", "16"))
    n_qry = int(ENV("BENCH6_QRY", "256"))
    img = int(ENV("BENCH6_IMG", "128"))
    opts = Options(name_model="slicenet", img_size=img, n_qry=n_qry, n_bs=bs)
    vgg19 = VGG19Features().init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    trainer = RegressionTrainer(opts, vgg19_params=vgg19)
    state = trainer.init_state()
    batch = {
        "img_input": np.zeros((bs, img, img, 3), np.float32),
        "img_slices": np.zeros((bs, 12, img, img, 3), np.float32),
        "qry_norot": np.zeros((bs, n_qry, 3), np.float32),
        "sdf": np.zeros((bs, n_qry), np.float32),
        "occ": np.zeros((bs, n_qry), np.float32),
        "obj_rot_mat": np.zeros((bs, 3, 3), np.float32),
        "trans_mat_wo_rot_tp": np.zeros((bs, 4, 3), np.float32),
    }
    lo = jax.jit(trainer.train_step).lower(_sds(state), _sds(batch))
    return lo.cost_analysis()


def flops7():
    import jax.numpy as jnp

    from slice3d_tpu.diffusion.latent import LatentDiffusion
    from slice3d_tpu.train.train_ldm import LDMTrainer

    bs = int(ENV("BENCH7_BS", "8"))
    img = 128
    module = LatentDiffusion(latent_size=16, dtype=jnp.bfloat16)
    trainer = LDMTrainer(img_size=img, batch_size=bs, module=module,
                         scale_by_std=False, use_ema=True)
    state = trainer.init_state()
    batch = {
        "image": np.zeros((bs, 13, img, img, 3), np.float32),
        "img_ipt_view": np.zeros((bs, img, img, 3), np.float32),
    }
    rng = jax.random.PRNGKey(0)
    lo = jax.jit(trainer.train_step).lower(_sds(state), _sds(batch), rng)
    return lo.cost_analysis()


def main():
    cfg = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    ca = flops6() if cfg == 6 else flops7()
    print(json.dumps({"config": cfg,
                      "flops_per_step": float(ca.get("flops", 0.0))}))


if __name__ == "__main__":
    main()
