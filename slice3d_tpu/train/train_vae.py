"""kl-f8 VAE finetuning with reconstruction + KL + perceptual + GAN losses.

Role of the reference autoencoder training configs
(gen_slices/configs/autoencoder/*, AutoencoderKL.configure_optimizers
dual-optimizer setup, autoencoder.py:442-451): per step the autoencoder
optimizer minimizes  L1 + perceptual + kl_weight*KL + d_weight*(-D(fake)),
and the discriminator optimizer minimizes the hinge loss, with the GAN
terms switched on after ``disc_start`` steps.  Both updates run inside one
jit program (no Lightning optimizer alternation needed — the two grads are
independent).

The adaptive discriminator weight uses the gradient-norm ratio at the
decoder's final conv, computed with two extra vjps.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.discriminator import (
    NLayerDiscriminator,
    adaptive_disc_weight,
    generator_loss,
    hinge_d_loss,
    patchgan_logits_size,
)
from ..models.lpips import lpips_distance
from ..models.perceptual import perceptual_loss
from ..models.vae import AutoencoderKL, DiagonalGaussian
from ..parallel import create_mesh, put_batch

__all__ = ["VAETrainState", "VAEFinetuneTrainer"]


class VAETrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    disc_params: Any
    disc_stats: Any
    opt_state: Any
    disc_opt_state: Any


class VAEFinetuneTrainer:
    def __init__(
        self,
        *,
        img_size: int = 128,
        lr: float = 4.5e-6,
        kl_weight: float = 1e-6,
        perceptual_weight: float = 1.0,
        disc_start: int = 50001,
        disc_factor: float = 1.0,
        disc_weight: float = 0.5,
        disc_n_layers: int | None = None,
        vae_ch: int = 128,
        vae_mult=(1, 2, 4, 4),
        vae_nres: int = 2,
        vgg19_params=None,
        lpips_params=None,
        ckpt_backend: str = "msgpack",
    ):
        self.vae = AutoencoderKL(ch=vae_ch, ch_mult=vae_mult, num_res_blocks=vae_nres)
        # Auto-shrink the PatchGAN depth for small images: at the reference
        # operating point (128^2) the standard 3-layer disc emits 14^2
        # logits, but below ~30 px the hierarchy collapses to an EMPTY
        # logits tensor whose mean is silently NaN.
        if disc_n_layers is None:
            disc_n_layers = 3
            while disc_n_layers > 1 and patchgan_logits_size(
                    img_size, disc_n_layers) < 1:
                disc_n_layers -= 1
        if patchgan_logits_size(img_size, disc_n_layers) < 1:
            raise ValueError(
                f"img_size={img_size} too small for a "
                f"{disc_n_layers}-layer PatchGAN (empty logits)")
        self.disc = NLayerDiscriminator(n_layers=disc_n_layers, train_bn=True)
        self.eval_disc = NLayerDiscriminator(n_layers=disc_n_layers,
                                             train_bn=False)
        self.img_size = img_size
        self.kl_weight = kl_weight
        self.perceptual_weight = perceptual_weight
        self.disc_start = disc_start
        self.disc_factor = disc_factor
        # static multiplier on the adaptive weight (reference
        # contperceptual.py discriminator_weight; 0.5 in the AE configs)
        self.disc_weight = disc_weight
        self.vgg19_params = vgg19_params
        self.lpips_params = lpips_params
        self.ckpt_backend = ckpt_backend
        self.tx = optax.adam(lr, b1=0.5, b2=0.9)
        self.tx_d = optax.adam(lr, b1=0.5, b2=0.9)
        self.mesh = create_mesh()
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._eval = jax.jit(self._eval_impl)

    def init_state(self, seed: int = 0) -> VAETrainState:
        s = self.img_size
        rng = jax.random.PRNGKey(seed)
        v = self.vae.init(rng, jnp.zeros((1, s, s, 3)), jax.random.PRNGKey(1))
        d = self.disc.init(jax.random.PRNGKey(2), jnp.zeros((1, s, s, 3)))
        return VAETrainState(
            step=jnp.zeros((), jnp.int32),
            params=v["params"],
            disc_params=d["params"],
            disc_stats=d.get("batch_stats", {}),
            opt_state=self.tx.init(v["params"]),
            disc_opt_state=self.tx_d.init(d["params"]),
        )

    def _reconstruct(self, params, x, rng):
        variables = {"params": params}
        rec, moments = self.vae.apply(variables, x, rng)
        return rec, moments

    def _step_impl(self, state: VAETrainState, batch, rng):
        x = batch["image"]
        gan_on = (state.step >= self.disc_start).astype(jnp.float32) * self.disc_factor

        def nll_of(params, rec):
            """Reconstruction NLL.  With LPIPS weights: the reference's
            exact form sum(|x-rec| + w*lpips)/B with logvar_init=0
            (contperceptual.py:49-60; the VAE optimizer never trains
            logvar, autoencoder.py:442-448).  Without: mean-scaled L1 +
            VGG19-tap fallback."""
            if self.lpips_params is not None and self.perceptual_weight > 0:
                p = lpips_distance(self.lpips_params, x, rec)
                per_pix = jnp.abs(rec - x) + self.perceptual_weight * p[
                    :, None, None, None]
                return jnp.sum(per_pix) / x.shape[0]
            nll = jnp.mean(jnp.abs(rec - x))
            if self.vgg19_params is not None and self.perceptual_weight > 0:
                nll = nll + self.perceptual_weight * perceptual_loss(
                    self.vgg19_params, rec, x
                )
            return nll

        def ae_loss_fn(params):
            rec, moments = self._reconstruct(params, x, rng)
            nll = nll_of(params, rec)
            kl = jnp.mean(DiagonalGaussian(moments).kl())
            logits_fake, _ = self.eval_disc.apply(
                {"params": state.disc_params, "batch_stats": state.disc_stats},
                rec, mutable=["batch_stats"],
            )
            g = generator_loss(logits_fake)

            # adaptive weight from grad norms at the decoder's output conv
            last = params["decoder"]["conv_out"]["kernel"]

            def nll_of_last(k):
                p = jax.tree_util.tree_map(lambda v: v, params)
                p["decoder"]["conv_out"]["kernel"] = k
                rec2, _ = self._reconstruct(p, x, rng)
                return nll_of(p, rec2)

            def g_of_last(k):
                p = jax.tree_util.tree_map(lambda v: v, params)
                p["decoder"]["conv_out"]["kernel"] = k
                rec2, _ = self._reconstruct(p, x, rng)
                lf, _ = self.eval_disc.apply(
                    {"params": state.disc_params, "batch_stats": state.disc_stats},
                    rec2, mutable=["batch_stats"],
                )
                return generator_loss(lf)

            nll_gn = optax.global_norm(jax.grad(nll_of_last)(last))
            g_gn = optax.global_norm(jax.grad(g_of_last)(last))
            d_weight = adaptive_disc_weight(nll_gn, g_gn, self.disc_weight)

            loss = nll + self.kl_weight * kl + d_weight * gan_on * g
            logs = {"rec_loss": nll, "kl": kl, "g_loss": g, "d_weight": d_weight}
            return loss, (logs, rec)

        (ae_loss, (logs, rec)), ae_grads = jax.value_and_grad(
            ae_loss_fn, has_aux=True
        )(state.params)

        def d_loss_fn(dparams):
            variables = {"params": dparams, "batch_stats": state.disc_stats}
            logits_real, mut = self.disc.apply(variables, x, mutable=["batch_stats"])
            logits_fake, _ = self.disc.apply(
                {"params": dparams, "batch_stats": mut["batch_stats"]},
                jax.lax.stop_gradient(rec), mutable=["batch_stats"],
            )
            return gan_on * hinge_d_loss(logits_real, logits_fake), mut["batch_stats"]

        (d_loss, new_dstats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.disc_params)

        ae_updates, new_opt = self.tx.update(ae_grads, state.opt_state, state.params)
        d_updates, new_dopt = self.tx_d.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        logs["ae_loss"] = ae_loss
        logs["disc_loss"] = d_loss
        return (
            state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, ae_updates),
                disc_params=optax.apply_updates(state.disc_params, d_updates),
                disc_stats=new_dstats,
                opt_state=new_opt,
                disc_opt_state=new_dopt,
            ),
            logs,
        )

    def train_step(self, state: VAETrainState, batch: Dict[str, np.ndarray], rng):
        return self._step(state, put_batch(batch, self.mesh), rng)

    # -- validation -------------------------------------------------------

    def _eval_impl(self, params, batch, rng):
        x = batch["image"]
        rec, moments = self._reconstruct(params, x, rng)
        logs = {"rec_loss": jnp.mean(jnp.abs(rec - x)),
                "kl": jnp.mean(DiagonalGaussian(moments).kl())}
        if self.lpips_params is not None and self.perceptual_weight > 0:
            logs["lpips"] = jnp.mean(lpips_distance(self.lpips_params, x, rec))
        return logs

    def eval_loss(self, state: VAETrainState, batch, rng) -> Dict[str, float]:
        """Validation losses (reference logs val/rec_loss as the monitor,
        autoencoder.py:404-440 + AE config monitor key)."""
        logs = self._eval(state.params, put_batch(batch, self.mesh), rng)
        return {k: float(v) for k, v in logs.items()}

    def reconstruct(self, state: VAETrainState, images, rng) -> np.ndarray:
        """(N, H, W, 3) -> VAE reconstructions (sampled posterior)."""
        rec, _ = self._reconstruct(state.params, jnp.asarray(images), rng)
        return np.asarray(rec)

    # -- checkpoint -------------------------------------------------------

    def state_payload(self, state: VAETrainState) -> Dict[str, Any]:
        return {
            "params": state.params,
            "disc_params": state.disc_params,
            "disc_stats": state.disc_stats,
            "opt_state": state.opt_state,
            "disc_opt_state": state.disc_opt_state,
            "step": int(state.step),
        }

    def save(self, state: VAETrainState, path: str) -> str:
        from .checkpoint import save_checkpoint

        return save_checkpoint(path, self.state_payload(state),
                               backend=self.ckpt_backend)

    def restore(self, state: VAETrainState, path: str) -> VAETrainState:
        from .checkpoint import restore_checkpoint

        target = self.state_payload(state)
        target["step"] = 0
        payload = restore_checkpoint(path, target)
        return state.replace(
            params=payload["params"],
            disc_params=payload["disc_params"],
            disc_stats=payload["disc_stats"],
            opt_state=payload["opt_state"],
            disc_opt_state=payload["disc_opt_state"],
            step=jnp.asarray(payload["step"], jnp.int32),
        )
