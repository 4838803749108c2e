"""Training loop for the regression models (SliceNet / GTSlice).

Reference semantics (reg_slices/train.py / train_gt.py): Adam at lr 3e-4
halved every ``freq_decay`` epochs; SliceNet loss = L1(sdf) +
L1(slice images) + 0.001 * VGG19 perceptual; GTSlice loss = L1(sdf) only;
sign-agreement accuracy metric; checkpoint every ``freq_ckpt`` epochs with
metrics in the filename; TensorBoard scalars Loss/Acc train+val.

TPU design: one jit-compiled train step over a (data, model) device mesh —
batch sharded on 'data', parameters replicated (gradient all-reduce is
inserted by XLA), BatchNorm batch stats cross-replica averaged by the jit
partitioner since stats are computed from sharded batches and averaged into
replicated state.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import Options, dump_options
from ..data import BatchLoader, Slice3DDataset
from ..models.gtslice import GTSliceModel
from ..models.slicenet import SliceNetModel
from ..models.perceptual import perceptual_loss
from ..parallel import create_mesh, put_batch
from .checkpoint import (latest_checkpoint, restore_checkpoint,
                         save_checkpoint, wait_pending)

__all__ = ["TrainState", "RegressionTrainer", "make_lr_schedule"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(base_lr: float, steps_per_epoch: int, freq_decay: int,
                     decay: float):
    """lr * decay^(epoch // freq_decay) (reference train.py:179-181)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (decay ** (epoch // freq_decay))

    return schedule


def sign_accuracy(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred >= 0) == (target >= 0))


class RegressionTrainer:
    def __init__(self, opts: Options, *, vgg19_params=None, steps_per_epoch: int = 1000):
        self.opts = opts
        self.is_slicenet = opts.name_model == "slicenet"
        model_cls = SliceNetModel if self.is_slicenet else GTSliceModel
        # Mixed precision: bf16 layer compute, fp32 params/moments/loss.
        cdtype = (jnp.bfloat16
                  if getattr(opts, "train_dtype", "float32") == "bfloat16"
                  else None)
        self.model = model_cls(n_slices=opts.n_slices, train_bn=True,
                               dtype=cdtype)
        self.eval_model = model_cls(n_slices=opts.n_slices, train_bn=False,
                                    dtype=cdtype)
        self._compute_dtype = cdtype
        self.vgg19_params = vgg19_params
        self.schedule = make_lr_schedule(
            opts.lr, steps_per_epoch, opts.freq_decay, opts.lr_decay_factor
        )
        self.tx = optax.adam(self.schedule)
        self.mesh = create_mesh()
        self._train_step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_impl)

    # -- state ------------------------------------------------------------

    def init_state(self, seed: int = 0) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        s = self.opts.img_size
        qry = jnp.zeros((1, 8, 3), jnp.float32)
        trans = jnp.asarray(np.eye(4, 3, dtype=np.float32))[None]
        rot = jnp.eye(3, dtype=jnp.float32)[None]
        if self.is_slicenet:
            variables = self.model.init(
                rng, jnp.zeros((1, s, s, 3), jnp.float32), qry, trans, rot
            )
        else:
            variables = self.model.init(
                rng,
                jnp.zeros((1, self.opts.n_slices, s, s, 3), jnp.float32),
                qry, trans, rot,
            )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )

    # -- steps --------------------------------------------------------------

    def _forward(self, model, variables, batch, mutable):
        kwargs = dict(mutable=mutable) if mutable else {}
        if self.is_slicenet:
            return model.apply(
                variables,
                batch["img_input"],
                batch["qry_norot"],
                batch["trans_mat_wo_rot_tp"],
                batch["obj_rot_mat"],
                **kwargs,
            )
        return model.apply(
            variables,
            batch["img_slices"],
            batch["qry_norot"],
            batch["trans_mat_wo_rot_tp"],
            batch["obj_rot_mat"],
            **kwargs,
        )

    def _losses(self, out, batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        if self.is_slicenet:
            sdf_pred, slices_rec = out
        else:
            sdf_pred, slices_rec = out, None
        # loss math is always fp32 regardless of the compute dtype
        sdf_pred = sdf_pred.astype(jnp.float32)
        if slices_rec is not None:
            slices_rec = slices_rec.astype(jnp.float32)
        target = batch["sdf"] if self.opts.pred_type == "sdf" else batch["occ"]
        if self.opts.pred_type == "occ":
            loss_pred = jnp.mean(
                optax.sigmoid_binary_cross_entropy(sdf_pred, batch["occ"])
            )
        else:
            loss_pred = jnp.mean(jnp.abs(sdf_pred - batch["sdf"]))
        logs = {"loss_pred": loss_pred}
        loss = loss_pred
        if slices_rec is not None:
            b = batch["img_slices"].shape[0]
            gt = batch["img_slices"].reshape((-1,) + batch["img_slices"].shape[2:])
            loss_img = jnp.mean(jnp.abs(slices_rec - gt))
            loss = loss + loss_img
            logs["loss_img"] = loss_img
            if self.vgg19_params is not None:
                loss_vgg = 0.001 * perceptual_loss(
                    self.vgg19_params, slices_rec, gt,
                    dtype=self._compute_dtype)
                loss = loss + loss_vgg
                logs["loss_vgg"] = loss_vgg
        if self.opts.pred_type == "occ":
            logs["acc"] = jnp.mean(
                (jax.nn.sigmoid(sdf_pred) > 0.5) == (batch["occ"] > 0.5)
            )
        else:
            logs["acc"] = sign_accuracy(sdf_pred, batch["sdf"])
        return loss, logs

    def _step_impl(self, state: TrainState, batch):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mut = self._forward(self.model, variables, batch, ["batch_stats"])
            loss, logs = self._losses(out, batch)
            return loss, (logs, mut["batch_stats"])

        (loss, (logs, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs["loss"] = loss
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            logs,
        )

    def _eval_impl(self, state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = self._forward(self.eval_model, variables, batch, None)
        _, logs = self._losses(out, batch)
        return logs

    # -- epochs -------------------------------------------------------------

    def train_step(self, state, batch):
        batch = put_batch(batch, self.mesh)
        return self._train_step(state, batch)

    def eval_epoch(self, state, loader) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        n = 0
        for batch in loader:
            logs = self._eval_step(state, put_batch(batch, self.mesh))
            for k, v in logs.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    # -- checkpoint -----------------------------------------------------------

    def save(self, state: TrainState, dir_ckpt: str, epoch: int,
             metrics: Dict[str, float]) -> str:
        name = (
            f"{epoch}_{int(state.step)}_{float(metrics.get('loss_pred', 0)):.4}_"
            f"{float(metrics.get('acc', 0)):.4}_{float(metrics.get('loss_img', 0)):.4}.ckpt"
        )
        payload = {
            "variables": {
                "params": state.params,
                "batch_stats": state.batch_stats,
            },
            "opt_state": state.opt_state,
            "n_epoch": epoch,
            "n_iter": int(state.step),
        }
        return save_checkpoint(os.path.join(dir_ckpt, name), payload,
                               backend=getattr(self.opts, "ckpt_backend",
                                               "msgpack"))

    def restore(self, state: TrainState, path: str) -> Tuple[TrainState, int]:
        payload = restore_checkpoint(
            path,
            {
                "variables": {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                },
                "opt_state": state.opt_state,
                "n_epoch": 0,
                "n_iter": 0,
            },
        )
        state = state.replace(
            params=payload["variables"]["params"],
            batch_stats=payload["variables"]["batch_stats"],
            opt_state=payload["opt_state"],
            step=jnp.asarray(payload["n_iter"], jnp.int32),
        )
        return state, int(payload["n_epoch"]) + 1


def _backup_code(exp_dir: str) -> None:
    """Snapshot the framework source into <exp_dir>/code/ for reproducibility
    (reference reg_slices/train.py:95-103 copies its .py files the same way).
    """
    import shutil

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(exp_dir, "code", "slice3d_tpu")
    try:
        shutil.copytree(
            pkg_root, dst, dirs_exist_ok=True,
            ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.o"))
    except OSError:  # pragma: no cover - backup is best-effort
        pass


def train(opts: Options, *, max_steps: Optional[int] = None) -> None:
    """Full training entry point (reference train.py:105-183)."""
    os.makedirs(opts.exp_dir, exist_ok=True)
    dump_options(opts, os.path.join(opts.exp_dir, "opts.txt"))
    _backup_code(opts.exp_dir)
    dir_ckpt = os.path.join(opts.exp_dir, "ckpt")
    os.makedirs(dir_ckpt, exist_ok=True)

    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(opts.exp_dir, "log"))
    except Exception:  # pragma: no cover
        writer = None

    load_slices = True
    # device_preprocess only covers GT slice PNGs (gen/rec slices are
    # pre-composited RGB on disk)
    dev_pre = opts.device_preprocess and (
        opts.name_model != "gtslice" or opts.from_which_slices == "gt")
    common_ds = dict(
        img_size=opts.img_size, n_qry=opts.n_qry, n_views=opts.n_views,
        use_white_bg=opts.use_white_bg,
        from_which_slices=opts.from_which_slices if opts.name_model == "gtslice" else "gt",
        load_slices=load_slices, categories=opts.categories,
        device_preprocess=dev_pre,
    )
    train_ds = Slice3DDataset(opts.dataset_root, split="train", **common_ds)
    val_ds = Slice3DDataset(opts.dataset_root, split="val", **common_ds)
    train_loader = BatchLoader(train_ds, opts.n_bs, shuffle=True, num_workers=opts.n_wk)
    val_loader = BatchLoader(val_ds, opts.n_bs, shuffle=False, num_workers=opts.n_wk)
    if dev_pre:
        from ..data.device_transforms import DeviceTransformLoader

        train_loader = DeviceTransformLoader(
            train_loader, opts.img_size, opts.use_white_bg)
        val_loader = DeviceTransformLoader(
            val_loader, opts.img_size, opts.use_white_bg)

    # Frozen VGG19 weights enable the reference's perceptual loss term;
    # without them training runs the remaining two loss terms.
    vgg19_params = None
    if opts.vgg19_ckpt and opts.name_model == "slicenet":
        import torch

        from ..convert import torch_import

        sd = torch.load(opts.vgg19_ckpt, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        prefix = "features" if any(k.startswith("features.") for k in sd) else ""
        vgg19_params = torch_import.vgg19_features(sd, prefix)
        print(f"loaded VGG19 perceptual weights from {opts.vgg19_ckpt}")

    trainer = RegressionTrainer(
        opts, vgg19_params=vgg19_params, steps_per_epoch=max(len(train_loader), 1)
    )
    state = trainer.init_state()

    epoch0 = 0
    if opts.resume:
        ckpt = latest_checkpoint(dir_ckpt)
        if ckpt:
            state, epoch0 = trainer.restore(state, ckpt)
            print(f"resumed from {ckpt} at epoch {epoch0}")

    t0 = time.time()
    for epoch in range(epoch0, opts.n_epochs):
        for batch in train_loader:
            state, logs = trainer.train_step(state, batch)
            step = int(state.step)
            if step % opts.freq_log == 0:
                line = ", ".join(f"{k}: {float(v):.5f}" for k, v in logs.items())
                print(f"[train] epoch {epoch} iter {step} {line} ({time.time() - t0:.0f}s)")
                if writer:
                    writer.add_scalar("Loss/train", float(logs["loss_pred"]), step)
                    writer.add_scalar("Acc/train", float(logs["acc"]), step)
            if max_steps is not None and step >= max_steps:
                wait_pending()  # flush any in-flight async ckpt writes
                return
        if epoch % opts.freq_ckpt == 0:
            metrics = trainer.eval_epoch(state, val_loader)
            from ..utils.profiling import device_memory_stats

            print(f"[val] epoch {epoch}", metrics, device_memory_stats())
            if writer:
                writer.add_scalar("Loss/val", metrics.get("loss_pred", 0), int(state.step))
                writer.add_scalar("Acc/val", metrics.get("acc", 0), int(state.step))
            trainer.save(state, dir_ckpt, epoch, metrics)
    # async ckpt writes must land before the process starts tearing down
    # (orbax cannot schedule worker threads during interpreter shutdown)
    wait_pending()
