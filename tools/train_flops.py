"""Analytic FLOP count of the training steps (BASELINE.md train-MFU source).

Lowers the config-6 (SliceNet regression, bs 16 — reference operating point
reg_slices/options.py:26-28) and config-7 (LDM, bs 8 —
objaverse-ldm-kl-8.yaml:59-63) train steps on the CPU backend and reads
``Lowered.cost_analysis()['flops']`` from the pre-optimization HLO — no
device or full XLA compile needed.  Train MFU = flops / step_latency_s /
peak; pair with the ``step_latency_s`` rows measured by ``bench_all.py``.

Usage: python tools/train_flops.py [6|7] ...
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 98.5e12  # convs/matmuls not cast to bf16 run at half rate


def flops6():
    import jax

    from slice3d_tpu.config import Options
    from slice3d_tpu.models.vgg import VGG19Features
    from slice3d_tpu.train.train_reg import RegressionTrainer

    bs, n_qry, img = 16, 256, 128
    opts = Options(name_model="slicenet", img_size=img, n_qry=n_qry, n_bs=bs)
    vgg19 = VGG19Features().init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    trainer = RegressionTrainer(opts, vgg19_params=vgg19)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    batch = {
        "img_input": rng.normal(size=(bs, img, img, 3)).astype(np.float32),
        "img_slices": rng.normal(size=(bs, 12, img, img, 3)).astype(np.float32),
        "qry_norot": rng.uniform(-0.5, 0.5, (bs, n_qry, 3)).astype(np.float32),
        "sdf": (rng.normal(size=(bs, n_qry)) * 0.1).astype(np.float32),
        "occ": (rng.random((bs, n_qry)) > 0.5).astype(np.float32),
        "obj_rot_mat": np.broadcast_to(
            np.eye(3, dtype=np.float32), (bs, 3, 3)).copy(),
        "trans_mat_wo_rot_tp": np.broadcast_to(
            np.eye(4, 3, dtype=np.float32), (bs, 4, 3)).copy(),
    }
    lowered = trainer._train_step.lower(state, batch)  # already jitted
    cost = lowered.cost_analysis()
    return {"config": 6, "train_step_gflops": round(cost["flops"] / 1e9, 1),
            "operating_point": f"bs={bs},qry={n_qry},img={img}"}


def flops7():
    import jax
    import jax.numpy as jnp

    from slice3d_tpu.diffusion.latent import LatentDiffusion
    from slice3d_tpu.train.train_ldm import LDMTrainer

    bs, img = 8, 128
    module = LatentDiffusion(latent_size=16, dtype=jnp.bfloat16)
    trainer = LDMTrainer(img_size=img, batch_size=bs, module=module,
                         scale_by_std=False, use_ema=True)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(bs, 13, img, img, 3)).astype(np.float32),
        "img_ipt_view": rng.normal(size=(bs, img, img, 3)).astype(np.float32),
    }
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    lowered = trainer._train_step.lower(
        state, dev_batch, jax.random.PRNGKey(0))  # already jitted
    cost = lowered.cost_analysis()
    return {"config": 7, "train_step_gflops": round(cost["flops"] / 1e9, 1),
            "operating_point": f"bs={bs},{img}px,ema=on"}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1:] or ["6", "7"]
    fns = {"6": flops6, "7": flops7}
    for key in which:
        out = fns[key]()
        # MFU at a measured step latency, if provided via env
        lat = os.environ.get(f"STEP{key}_LATENCY_S")
        if lat:
            flops_s = out["train_step_gflops"] * 1e9 / float(lat)
            out["train_mfu_bf16_peak"] = round(flops_s / V5E_BF16_PEAK, 4)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
