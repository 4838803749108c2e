"""Camera-pose estimator training (reference train_cam_est path).

The reference's camera-estimation trainer is dead code (its imports don't
exist in-repo, reg_slices/src/train_cam_est_disn.py) and its dataset has
hardcoded local paths (datasets_cam.py:37-40).  This loop provides the
working equivalent over the standard Slice3D dataset layout: the point
cloud comes from the near-surface band of the 02_sdfs samples and the
ground-truth regression matrix from the recorded camera chain.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import camera
from ..config import Options
from ..data.dataset import Slice3DDataset
from ..data.pipeline import BatchLoader
from ..models.camnet import CameraNet, camera_pose_loss
from ..parallel import create_mesh, put_batch
from .checkpoint import save_checkpoint

__all__ = ["CamEstDataset", "CamTrainer"]


@dataclass
class CamEstDataset:
    """Pose-estimation samples from the Slice3D layout."""

    root: str
    split: str = "train"
    img_size: int = 128
    n_views: int = 12
    n_pcd: int = 2048
    use_white_bg: bool = False

    def __post_init__(self):
        self._ds = Slice3DDataset(
            self.root, split=self.split, img_size=self.img_size,
            n_views=self.n_views, use_white_bg=self.use_white_bg,
            load_slices=False, load_sdf=False,
        )

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        _, shape_id = self._ds.files[index]
        view = self._ds.view_index()
        img = self._ds.load_input_view(shape_id, view)

        meta_rot, _, scale, offset = self._ds.load_camera(shape_id, view)
        pts, vals = self._ds.load_sdf_samples(shape_id, scale, offset)
        band = np.argsort(np.abs(vals))[: self.n_pcd]
        pcd = pts[band]
        if len(pcd) < self.n_pcd:
            reps = int(np.ceil(self.n_pcd / max(len(pcd), 1)))
            pcd = np.tile(pcd, (reps, 1))[: self.n_pcd]

        # GT regression matrix: transpose of RT @ canonical rotation
        import pickle

        with open(os.path.join(self._ds.dir_img_input, shape_id, "meta.pkl"), "rb") as f:
            meta = pickle.load(f)
        az, el, dist = -meta[1][view], meta[2][view], meta[3][view]
        rt = camera.blender_rt(az, el, dist)
        rot_full = rt @ camera.canonical_rot4()
        regress_mat = rot_full.T  # (4, 3)
        k = camera.intrinsics(1.0, 1.0)

        return {
            "img_input": img.astype(np.float32),
            "pcd": pcd.astype(np.float32),
            "regress_mat": regress_mat.astype(np.float32),
            "norm_mat": np.eye(4, dtype=np.float32),
            "K": k.astype(np.float32),
        }


class CamTrainer:
    def __init__(self, lr: float = 3e-4):
        self.model = CameraNet(train_bn=True)
        self.eval_model = CameraNet(train_bn=False)
        self.tx = optax.adam(lr)
        self.mesh = create_mesh()
        self._step = jax.jit(self._step_impl, donate_argnums=(0, 1, 2))

    def init_state(self, img_size: int = 128, seed: int = 0):
        variables = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img_size, img_size, 3))
        )
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        return params, stats, self.tx.init(params)

    def _step_impl(self, params, stats, opt_state, batch):
        def loss_fn(p):
            out, mut = self.model.apply(
                {"params": p, "batch_stats": stats}, batch["img_input"],
                mutable=["batch_stats"],
            )
            loss, _ = camera_pose_loss(
                out["pred_RT_inv"], batch["pcd"], batch["regress_mat"],
                batch["norm_mat"], batch["K"],
            )
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    def train(self, opts: Options, max_steps: Optional[int] = None):
        ds = CamEstDataset(opts.dataset_root, split="train",
                           img_size=opts.img_size, n_views=opts.n_views,
                           use_white_bg=opts.use_white_bg)
        loader = BatchLoader(ds, opts.n_bs, shuffle=True, num_workers=opts.n_wk)
        params, stats, opt_state = self.init_state(opts.img_size)
        dir_ckpt = os.path.join(opts.dir_experiments, opts.name_exp_cam, "ckpt")
        step = 0
        for epoch in range(opts.n_epochs):
            for batch in loader:
                batch = put_batch(batch, self.mesh)
                params, stats, opt_state, loss = self._step(params, stats, opt_state, batch)
                step += 1
                if step % opts.freq_log == 0:
                    print(f"[cam] epoch {epoch} step {step} loss {float(loss):.3e}")
                if max_steps and step >= max_steps:
                    save_checkpoint(
                        os.path.join(dir_ckpt, f"{epoch}_{step}_{float(loss):.4}.ckpt"),
                        {"variables": {"params": params, "batch_stats": stats}},
                    )
                    return params, stats
            if epoch % opts.freq_ckpt == 0:
                save_checkpoint(
                    os.path.join(dir_ckpt, f"{epoch}_{step}_{float(loss):.4}.ckpt"),
                    {"variables": {"params": params, "batch_stats": stats}},
                )
        return params, stats
