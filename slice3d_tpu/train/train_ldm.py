"""LDM training + sampling driver (gen_slices main.py semantics).

Training (reference ddpm.py:343-365, 971-983): per step, the frozen kl-f8
VAE encodes the 13-image stack (gradients stopped), the 12 slice latents
tile into the 4x64x64 atlas, the trainable cond stage encodes the input
view, and the UNet learns eps-prediction under L1 with EMA tracking and the
std-rescaling factor computed once from the first batch
(scale_by_std, ddpm.py:571-586).  Optimizer AdamW over UNet + cond stage
(ddpm.py:1420-1442), lr = accumulate * ndev * bs * base_lr when scale_lr.

Everything per-step runs as one jit program over the (data, model) mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct, traverse_util

from ..diffusion.latent import LatentDiffusion, p_losses
from ..diffusion.schedule import DDIMParams, DiffusionSchedule
from ..diffusion.ancestral import ddpm_sample
from ..diffusion.ddim import ddim_sample
from ..diffusion.dpm import dpm_solver_sample
from ..models.ema import ema_update
from ..parallel import create_mesh, put_batch
from .checkpoint import restore_checkpoint, save_checkpoint
from .lr_schedules import from_scheduler_config

__all__ = ["LDMTrainState", "LDMTrainer"]


class LDMTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    scale_factor: jnp.ndarray
    logvar: jnp.ndarray


def _trainable_mask(params) -> Any:
    flat = traverse_util.flatten_dict(params)
    mask = {k: (k[0] != "first_stage") for k in flat}
    return traverse_util.unflatten_dict(mask)


class LDMTrainer:
    def __init__(
        self,
        *,
        img_size: int = 128,
        batch_size: int = 8,
        base_lr: float = 5e-5,
        scale_lr: bool = True,
        timesteps: int = 1000,
        linear_start: float = 0.0015,
        linear_end: float = 0.0155,
        loss_type: str = "l1",
        use_ema: bool = True,
        scale_by_std: bool = True,
        accumulate: int = 1,
        module: Optional[LatentDiffusion] = None,
        scheduler_config: Optional[Dict[str, Any]] = None,
        learn_logvar: bool = False,
        cond_train_bn: bool = True,
        ckpt_backend: str = "msgpack",
        mesh=None,
    ):
        self.module = module if module is not None else LatentDiffusion(
            timesteps=timesteps, linear_start=linear_start, linear_end=linear_end,
            loss_type=loss_type, train_bn=False,
            latent_size=img_size // 8,
        )
        self.schedule = DiffusionSchedule.create(
            timesteps, "linear", linear_start, linear_end
        )
        self.img_size = img_size
        self.batch_size = batch_size
        self.ckpt_backend = ckpt_backend
        self.use_ema = use_ema
        self.scale_by_std = scale_by_std
        self.loss_type = loss_type
        self.learn_logvar = learn_logvar
        self.cond_train_bn = cond_train_bn
        ndev = max(jax.device_count(), 1)
        self.lr = (accumulate * ndev * batch_size * base_lr) if scale_lr else base_lr
        # use_scheduler semantics (reference ddpm.py:1431-1441): a present
        # scheduler_config wraps AdamW in a per-step LR-multiplier LambdaLR.
        self.lr_multiplier = from_scheduler_config(scheduler_config)
        if self.lr_multiplier is not None:
            lr_fn = lambda step: self.lr * self.lr_multiplier(step)  # noqa: E731
        else:
            lr_fn = self.lr
        # one optimizer over {net params, logvar}: the mask freezes the VAE
        # subtree always and logvar unless learn_logvar (ddpm.py:1420-1429)
        self.accumulate = int(accumulate)
        tx = optax.masked(
            optax.adamw(lr_fn),
            lambda tree: {"net": _trainable_mask(tree["net"]),
                          "logvar": learn_logvar},
        )
        if self.accumulate > 1:
            # gradient accumulation (Lightning accumulate_grad_batches):
            # grads average over `accumulate` micro-steps, the inner update
            # applies on the k-th.  state.step counts micro-steps.
            tx = optax.MultiSteps(tx, every_k_schedule=self.accumulate)
        self.tx = tx
        self.mesh = mesh if mesh is not None else create_mesh()
        self._train_step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._compute_scale = jax.jit(self._scale_impl)
        self._eval_step = jax.jit(self._eval_impl)
        # jitted end-to-end sampling programs, keyed on (sampler, steps,
        # eta, guidance, shapes) — see sample_slices
        self._sample_fns: Dict[Any, Any] = {}

    # -- init ---------------------------------------------------------------

    def init_state(self, seed: int = 0) -> LDMTrainState:
        rng = jax.random.PRNGKey(seed)
        s = self.img_size
        f = self.module.downscale
        images = jnp.zeros((1, 13, s, s, 3), jnp.float32)
        x = jnp.zeros((1, (s // f) * 4, (s // f) * 4, 4), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        img = jnp.zeros((1, s, s, 3), jnp.float32)
        z13 = jnp.zeros((1, 13, s // f, s // f, 4), jnp.float32)

        def init_all(module):
            cond = module.build_cond(z13, img, jnp.float32(1.0))
            out = module.apply_model(x, t, cond)
            module.encode_images(images, jax.random.PRNGKey(0))
            module.decode_tiles(z13[:, :1])  # create decoder params too
            return out

        variables = nn_init_helper(self.module, rng, init_all)
        params = self._cast_frozen(variables["params"])
        stats = variables.get("batch_stats", {})
        logvar = jnp.zeros((self.schedule.num_timesteps,), jnp.float32)
        return LDMTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=stats,
            opt_state=self.tx.init({"net": params, "logvar": logvar}),
            # copy (not alias) params so buffer donation stays sound
            ema_params=jax.tree_util.tree_map(
                jnp.array, _trainable_subtree(params)
            ) if self.use_ema else {},
            scale_factor=jnp.float32(1.0),
            logvar=jnp.zeros((self.schedule.num_timesteps,), jnp.float32),
        )

    def _cast_frozen(self, params):
        """Store the frozen first-stage (VAE) params in the module's compute
        dtype when that is bf16.

        Numerically a no-op: flax promotes params to the module dtype at
        every use anyway, so casting once at init/restore produces the
        same bits while halving the frozen subtree's per-step HBM reads
        (the round-4 ledger flagged the fp32-weight conv work,
        BASELINE.md).  The trainable subtrees keep fp32 master weights
        for AdamW.  Disable with SLICE3D_FROZEN_FP32=1 (ablation).
        """
        import os

        if self.module.dtype != jnp.bfloat16 or os.environ.get(
                "SLICE3D_FROZEN_FP32"):
            return params
        out = dict(params)
        if "first_stage" in out:
            out["first_stage"] = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                out["first_stage"])
        return out

    # -- steps ----------------------------------------------------------------

    def _scale_impl(self, state: LDMTrainState, batch, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        z = self.module.apply(
            variables, batch["image"], rng, True,
            method=LatentDiffusion.encode_images,
        )
        return 1.0 / jnp.std(z)

    def maybe_set_scale(self, state: LDMTrainState, batch) -> LDMTrainState:
        if not self.scale_by_std or int(state.step) > 0:
            return state
        scale = self._compute_scale(state, put_batch(batch, self.mesh),
                                    jax.random.PRNGKey(0))
        print(f"### USING STD-RESCALING: scale_factor = {float(scale):.6f} ###")
        return state.replace(scale_factor=scale)

    def _step_impl(self, state: LDMTrainState, batch, rng):
        rng_enc, rng_loss = jax.random.split(rng)

        def loss_fn(tree):
            variables = {"params": tree["net"], "batch_stats": state.batch_stats}
            z13 = self.module.apply(
                variables, batch["image"], rng_enc, True,
                method=LatentDiffusion.encode_images,
            )
            z13 = jax.lax.stop_gradient(z13)
            # cond-stage VGG runs in train mode: BN uses batch statistics
            # and updates running stats (reference ddpm.py:604-623)
            cond, mutated = self.module.apply(
                variables, z13, batch["img_ipt_view"], state.scale_factor,
                self.cond_train_bn, method=LatentDiffusion.build_cond,
                mutable=["batch_stats"],
            )
            atlas = self.module.apply(
                variables, z13, state.scale_factor,
                method=LatentDiffusion.make_atlas,
            )
            loss, logs = p_losses(
                self.module, variables, self.schedule, rng_loss, atlas, cond,
                logvar=tree["logvar"], loss_type=self.loss_type,
            )
            return loss, (logs, mutated.get("batch_stats", {}))

        tree = {"net": state.params, "logvar": state.logvar}
        (_, (logs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(tree)
        updates, new_opt = self.tx.update(grads, state.opt_state, tree)
        new_tree = optax.apply_updates(tree, updates)
        new_params, new_logvar = new_tree["net"], new_tree["logvar"]
        new_ema = state.ema_params
        if self.use_ema:
            new_ema = ema_update(
                state.ema_params, _trainable_subtree(new_params),
                state.step // self.accumulate,  # EMA warmup per optimizer step
            )
            if self.accumulate > 1:
                # EMA tracks OPTIMIZER steps: hold it on micro-steps where
                # MultiSteps only accumulated (params unchanged)
                applied = (state.step + 1) % self.accumulate == 0
                new_ema = jax.tree_util.tree_map(
                    lambda e, n: jnp.where(applied, n, e),
                    state.ema_params, new_ema,
                )
        batch_stats = _merge_stats(state.batch_stats, new_stats) \
            if self.cond_train_bn else state.batch_stats
        return (
            state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=batch_stats, opt_state=new_opt,
                ema_params=new_ema, logvar=new_logvar,
            ),
            logs,
        )

    def train_step(self, state: LDMTrainState, batch, rng):
        return self._train_step(state, put_batch(batch, self.mesh), rng)

    def current_lr(self, step: int) -> float:
        """Effective LR at ``step`` (for logging / LearningRateMonitor parity)."""
        if self.lr_multiplier is None:
            return float(self.lr)
        return float(self.lr * self.lr_multiplier(step))

    # -- validation -------------------------------------------------------

    def _eval_impl(self, params, stats, scale_factor, logvar, batch, rng):
        rng_enc, rng_loss = jax.random.split(rng)
        variables = {"params": params, "batch_stats": stats}
        z13 = self.module.apply(
            variables, batch["image"], rng_enc, True,
            method=LatentDiffusion.encode_images,
        )
        cond = self.module.apply(
            variables, z13, batch["img_ipt_view"], scale_factor,
            method=LatentDiffusion.build_cond,
        )
        atlas = self.module.apply(
            variables, z13, scale_factor, method=LatentDiffusion.make_atlas,
        )
        _, logs = p_losses(
            self.module, variables, self.schedule, rng_loss, atlas, cond,
            logvar=logvar, loss_type=self.loss_type,
        )
        return logs

    def eval_loss(self, state: LDMTrainState, batch, rng,
                  use_ema: bool = True) -> Dict[str, float]:
        """Validation losses; with use_ema the EMA weights are evaluated
        (reference logs both as val/loss_simple and val/loss_simple_ema)."""
        params = state.params
        if use_ema and self.use_ema:
            params = _merge_trainable(params, state.ema_params)
        logs = self._eval_step(
            params, state.batch_stats, state.scale_factor, state.logvar,
            put_batch(batch, self.mesh), rng,
        )
        return {k: float(v) for k, v in logs.items()}

    # -- sampling ---------------------------------------------------------------

    def sample_slices(
        self,
        state: LDMTrainState,
        batch: Dict[str, np.ndarray],
        *,
        ddim_steps: int = 200,
        eta: float = 1.0,
        rng: Optional[jax.Array] = None,
        use_ema: bool = True,
        sampler: str = "ddim",
        guidance_scale: float = 1.0,
        uncond: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> np.ndarray:
        """Input views -> generated slice images (B, 12, H, W, 3) in [-1,1].

        sampler: "ddim" (reference semantics, eta-stochastic), "dpm"
        (DPM-Solver++(2M), deterministic — same endpoint as DDIM eta=0
        in ~10x fewer steps; see diffusion/dpm.py), "plms" (pseudo linear
        multistep, reference plms.py:11-236; requires eta=0), or
        "ancestral" (full-T DDPM p_sample_loop, reference ddpm.py:1270-1306).

        guidance_scale != 1 enables classifier-free guidance (reference
        ddim.py:168-175) against ``uncond`` conditioning (defaults to
        zeroed conditioning).  Both branches run as ONE 2B-batched model
        call per step so the MXU sees a single large dispatch.

        The whole path (VAE encode -> cond -> reverse scan -> decode)
        compiles to ONE jitted program, cached per (sampler, steps, eta,
        guidance, shape) — repeat sampling pays zero host tracing (an
        un-jitted lax.scan re-traces its body every call, which on this
        1-core host cost seconds per batch at ddim=200).
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = state.params
        if use_ema and self.use_ema:
            params = _merge_trainable(params, state.ema_params)
        variables = {"params": params, "batch_stats": state.batch_stats}

        images = jnp.asarray(batch["image"])
        ipt = jnp.asarray(batch["img_ipt_view"])
        b = images.shape[0]
        key = (sampler, int(ddim_steps), float(eta), float(guidance_scale),
               uncond is None, b, images.shape[2], ipt.shape[1])
        jfn = self._sample_fns.get(key)
        if jfn is None:
            jfn = jax.jit(functools.partial(
                self._sample_impl, sampler=sampler, ddim_steps=int(ddim_steps),
                eta=float(eta), guidance_scale=float(guidance_scale),
                with_uncond=uncond is not None))
            self._sample_fns[key] = jfn
        imgs = jfn(variables, state.scale_factor, images, ipt, rng,
                   uncond if uncond is not None else 0)
        return np.asarray(imgs[:, :12])

    def _sample_impl(self, variables, scale_factor, images, ipt, rng, uncond,
                     *, sampler, ddim_steps, eta, guidance_scale, with_uncond):
        rng, rng_enc = jax.random.split(rng)
        z13 = self.module.apply(
            variables, images, rng_enc, True, method=LatentDiffusion.encode_images
        )
        cond = self.module.apply(
            variables, z13, ipt, scale_factor,
            method=LatentDiffusion.build_cond,
        )
        b = images.shape[0]
        h = (self.img_size // self.module.downscale) * 4

        eps_fn = self._make_eps_fn(variables, cond, guidance_scale,
                                   uncond if with_uncond else None)

        if sampler == "dpm":
            ddim = DDIMParams.create(self.schedule, ddim_steps, eta)
            atlas = dpm_solver_sample(eps_fn, ddim, rng, (b, h, h, 4))
        elif sampler == "ddim":
            ddim = DDIMParams.create(self.schedule, ddim_steps, eta)
            atlas = ddim_sample(eps_fn, ddim, rng, (b, h, h, 4))
        elif sampler == "plms":
            from ..diffusion.plms import plms_sample

            ddim = DDIMParams.create(self.schedule, ddim_steps, 0.0)
            atlas = plms_sample(eps_fn, ddim, rng, (b, h, h, 4))
        elif sampler == "ancestral":
            atlas, _ = ddpm_sample(eps_fn, self.schedule, rng, (b, h, h, 4),
                                   clip_denoised=False)
        else:
            raise ValueError(f"unknown sampler {sampler!r}")
        return self.module.apply(
            variables, atlas, scale_factor,
            method=LatentDiffusion.decode_atlas_images,
        )

    def _make_eps_fn(self, variables, cond, guidance_scale: float = 1.0,
                     uncond=None):
        """eps_fn closure; with CFG the cond/uncond branches fuse into one
        2B-batched UNet call (reference ddim.py:170-175 does the same
        torch.cat trick — here it keeps the MXU dispatch large)."""
        if guidance_scale == 1.0:
            def eps_fn(x, t):
                return self.module.apply(
                    variables, x, t, cond, method=LatentDiffusion.apply_model
                )
            return eps_fn

        if uncond is None:
            uncond = jax.tree_util.tree_map(jnp.zeros_like, cond)
        cond2 = jax.tree_util.tree_map(
            lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)

        def eps_fn(x, t):
            out = self.module.apply(
                variables,
                jnp.concatenate([x, x], axis=0),
                jnp.concatenate([t, t], axis=0),
                cond2, method=LatentDiffusion.apply_model,
            )
            e_u, e_c = jnp.split(out, 2, axis=0)
            return e_u + guidance_scale * (e_c - e_u)

        return eps_fn

    def sample_progressive(
        self,
        state: LDMTrainState,
        batch: Dict[str, np.ndarray],
        *,
        log_every_t: int = 200,
        rng: Optional[jax.Array] = None,
        use_ema: bool = True,
        temperature: float = 1.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Full-T progressive denoising (reference ddpm.py:1213-1268 +
        the ``plot_progressive_rows`` branch of log_images,
        ddpm.py:1354-1418): walks every ddpm step ancestrally, records the
        running x0 estimate every ``log_every_t`` steps, and decodes each
        recorded atlas to slice images.

        Returns (final_slices (B, 12, H, W, 3),
                 progressive (n_log, B, 12, H, W, 3)) in [-1, 1].
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = state.params
        if use_ema and self.use_ema:
            params = _merge_trainable(params, state.ema_params)
        variables = {"params": params, "batch_stats": state.batch_stats}

        images = jnp.asarray(batch["image"])
        ipt = jnp.asarray(batch["img_ipt_view"])
        rng, rng_enc = jax.random.split(rng)
        z13 = self.module.apply(
            variables, images, rng_enc, True, method=LatentDiffusion.encode_images
        )
        cond = self.module.apply(
            variables, z13, ipt, state.scale_factor,
            method=LatentDiffusion.build_cond,
        )
        b = images.shape[0]
        h = (self.img_size // self.module.downscale) * 4
        eps_fn = self._make_eps_fn(variables, cond)
        atlas, inter = ddpm_sample(
            eps_fn, self.schedule, rng, (b, h, h, 4),
            log_every_t=log_every_t, record="pred_x0",
            temperature=temperature,
        )

        def decode(a):
            return self.module.apply(
                variables, a, state.scale_factor,
                method=LatentDiffusion.decode_atlas_images,
            )[:, :12]

        final = np.asarray(decode(atlas))
        rows = np.stack([np.asarray(decode(inter[i]))
                         for i in range(inter.shape[0])])
        return final, rows

    def diffusion_row(
        self,
        state: LDMTrainState,
        batch: Dict[str, np.ndarray],
        *,
        log_every_t: int = 200,
        rng: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Forward-noising visualization (the ``plot_diffusion_rows``
        branch of reference log_images, ddpm.py:1370-1385): q_sample the
        clean latents at each log step and decode.

        Returns (n_log, B, 12, H, W, 3) in [-1, 1].
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        rng, rng_enc = jax.random.split(rng)
        z13 = self.module.apply(
            variables, jnp.asarray(batch["image"]), rng_enc, True,
            method=LatentDiffusion.encode_images,
        )
        atlas0 = self.module.apply(
            variables, z13, state.scale_factor, method=LatentDiffusion.make_atlas
        )
        t_total = self.schedule.num_timesteps
        steps = [t for t in range(t_total)
                 if t % log_every_t == 0 or t == t_total - 1]
        sqrt_ac = np.asarray(self.schedule.sqrt_alphas_cumprod)
        sqrt_1m = np.asarray(self.schedule.sqrt_one_minus_alphas_cumprod)
        rows = []
        for t in steps:
            rng, rng_n = jax.random.split(rng)
            noise = jax.random.normal(rng_n, atlas0.shape, atlas0.dtype)
            z_noisy = sqrt_ac[t] * atlas0 + sqrt_1m[t] * noise
            imgs = self.module.apply(
                variables, z_noisy, state.scale_factor,
                method=LatentDiffusion.decode_atlas_images,
            )
            rows.append(np.asarray(imgs[:, :12]))
        return np.stack(rows)

    def reconstruct_slices(self, state: LDMTrainState, batch,
                           rng: Optional[jax.Array] = None) -> np.ndarray:
        """VAE round trip of GT slices (B, 12, H, W, 3) — the gt_rec path."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        z13 = self.module.apply(
            variables, jnp.asarray(batch["image"]), rng, True,
            method=LatentDiffusion.encode_images,
        )
        imgs = self.module.apply(
            variables, z13[:, :12], method=LatentDiffusion.decode_tiles
        )
        return np.asarray(imgs)

    # -- checkpoint ---------------------------------------------------------------

    def state_payload(self, state: LDMTrainState) -> Dict[str, Any]:
        return {
            "variables": {"params": state.params, "batch_stats": state.batch_stats},
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
            "scale_factor": state.scale_factor,
            "logvar": state.logvar,
            "step": int(state.step),
        }

    def save(self, state: LDMTrainState, path: str) -> str:
        return save_checkpoint(path, self.state_payload(state),
                               backend=self.ckpt_backend)

    def restore(self, state: LDMTrainState, path: str) -> LDMTrainState:
        target = {
            "variables": {"params": state.params, "batch_stats": state.batch_stats},
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
            "scale_factor": state.scale_factor,
            "logvar": state.logvar,
            "step": 0,
        }
        payload = restore_checkpoint(path, target)
        return state.replace(
            params=self._cast_frozen(payload["variables"]["params"]),
            batch_stats=payload["variables"]["batch_stats"],
            opt_state=payload["opt_state"],
            ema_params=payload["ema_params"],
            scale_factor=jnp.asarray(payload["scale_factor"]),
            logvar=jnp.asarray(payload["logvar"]),
            step=jnp.asarray(payload["step"], jnp.int32),
        )


def _merge_stats(stats, updated):
    """Overlay mutated batch_stats entries onto the full collection."""
    if not updated:
        return stats
    flat = traverse_util.flatten_dict(dict(stats))
    flat.update(traverse_util.flatten_dict(dict(updated)))
    return traverse_util.unflatten_dict(flat)


def _trainable_subtree(params):
    return {k: v for k, v in params.items() if k != "first_stage"}


def _merge_trainable(params, trainable):
    out = dict(params)
    out.update(trainable)
    return out


def nn_init_helper(module, rng, fn):
    """Initialize a module by running ``fn(module)`` under nn.init."""
    import flax.linen as nn

    return nn.init(fn, module)({"params": rng})
