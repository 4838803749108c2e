#!/usr/bin/env python
"""Latent-diffusion slice generation CLI (reference gen_slices/main.py).

Train:    python main.py --base configs/objaverse-ldm-kl-8.yaml -t
Sample:   python main.py --base configs/objaverse-ldm-kl-8-infer.yaml \
              -r logs/<run>            # writes images_testing_sampled/
VAE rec:  python main.py --base configs/autoencoder_kl_f8_infer.yaml \
              -r logs/<run> --mode rec # writes images_reconstructed/

YAML configs use the reference's target/params convention; reference class
paths are aliased to the TPU implementations (slice3d_tpu.utils.registry).
"""

from __future__ import annotations

import argparse
import datetime
import os
import time

import numpy as np
import yaml

import jax

from slice3d_tpu.data.ldm_data import LDMSliceDataset
from slice3d_tpu.data.pipeline import BatchLoader
from slice3d_tpu.diffusion.latent import LatentDiffusion
from slice3d_tpu.train.checkpoint import latest_checkpoint, wait_pending
from slice3d_tpu.train.train_ldm import LDMTrainer
from slice3d_tpu.utils.montage import slices_to_montage, save_image, to_uint8


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="*", default=[])
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-r", "--resume", type=str, default="")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("--gpus", type=str, default="")  # accepted for CLI compat
    p.add_argument("--scale_lr", type=str, default="True")
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--mode", type=str, default="", choices=["", "sample", "rec"])
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--ckpt_every", type=int, default=2000)
    p.add_argument("--log_images_every", type=int, default=2000)
    p.add_argument("--val_every", type=int, default=2000)
    p.add_argument("--ddim_steps", type=int, default=200)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "dpm", "plms", "ancestral"],
                   help="dpm = DPM-Solver++(2M): DDIM-200-class quality "
                        "in ~20-30 steps (pair with --ddim_steps 20); "
                        "plms = pseudo linear multistep (eta 0, reference "
                        "plms.py); ancestral = full-T DDPM p_sample_loop")
    p.add_argument("--log_progressive_rows", action="store_true",
                   help="also log full-T progressive-denoise and forward-"
                        "diffusion rows at --log_images_every (reference "
                        "ImageLogger plot_progressive/diffusion_rows)")
    p.add_argument("--log_every_t", type=int, default=200,
                   help="ddpm-step stride for the progressive/diffusion rows")
    p.add_argument("--guidance_scale", type=float, default=1.0,
                   help="classifier-free guidance scale for sampling "
                        "(1.0 = off, reference ddim.py:168-175)")
    p.add_argument("--ckpt_backend", type=str, default="msgpack",
                   choices=["msgpack", "orbax", "orbax_async"])
    p.add_argument("--ddim_eta", type=float, default=1.0)
    return p


def deep_merge(a, b):
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def apply_dotlist(cfg, items):
    for item in items:
        if "=" not in item:
            continue
        key, val = item.split("=", 1)
        try:
            val = yaml.safe_load(val)
        except Exception:
            pass
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return cfg


def load_config(bases, dotlist):
    cfg = {}
    for b in bases:
        with open(b) as f:
            cfg = deep_merge(cfg, yaml.safe_load(f))
    return apply_dotlist(cfg, dotlist)


def make_writer(logdir):
    """TensorBoard writer; no-op fallback when tensorboardX is absent
    (it is not a declared dependency of the package)."""
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(os.path.join(logdir, "tensorboard"))
    except ImportError:
        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def close(self):
                pass

        print("tensorboardX not installed; scalar logging disabled")
        return _Null()


def validate_full(eval_fn, val_loader):
    """Mean metrics over the WHOLE validation split (reference semantics:
    Lightning validates every val batch, gen_slices/main.py:670-675)."""
    sums, n = {}, 0
    for vb in val_loader:
        logs = eval_fn(vb)
        for k, v in logs.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}


def is_autoencoder_target(cfg) -> bool:
    target = str((cfg.get("model") or {}).get("target", ""))
    return "autoencoder" in target.lower()


def build_module_and_trainer(cfg, scale_lr: bool,
                             ckpt_backend: str = "msgpack"):
    mp = (cfg.get("model") or {}).get("params") or {}
    unet = (mp.get("unet_config") or {}).get("params") or {}
    dd = ((mp.get("first_stage_config") or {}).get("params") or {}).get("ddconfig") or {}
    data_p = (cfg.get("data") or {}).get("params") or {}
    bs = int(data_p.get("batch_size", 8))

    img_size = 128
    for split in ("train", "validation", "test"):
        sp = (data_p.get(split) or {}).get("params") or {}
        if "size" in sp:
            img_size = int(sp["size"])
            break

    vae_mult = tuple(dd.get("ch_mult", (1, 2, 4, 4)))
    downscale = 2 ** (len(vae_mult) - 1)
    module = LatentDiffusion(
        timesteps=int(mp.get("timesteps", 1000)),
        linear_start=float(mp.get("linear_start", 0.0015)),
        linear_end=float(mp.get("linear_end", 0.0155)),
        loss_type=str(mp.get("loss_type", "l1")),
        vae_ch=int(dd.get("ch", 128)),
        vae_mult=vae_mult,
        vae_nres=int(dd.get("num_res_blocks", 2)),
        unet_channels=int(unet.get("model_channels", 192)),
        unet_mult=tuple(unet.get("channel_mult", (1, 2, 2, 4, 4))),
        unet_nres=int(unet.get("num_res_blocks", 2)),
        unet_attention_ds=tuple(
            unet.get("attention_resolutions", (1, 2, 4, 8))),
        latent_size=img_size // downscale,
    )
    accumulate = int(((cfg.get("lightning") or {}).get("trainer") or {})
                     .get("accumulate_grad_batches", 1))
    trainer = LDMTrainer(
        img_size=img_size,
        batch_size=bs,
        base_lr=float(cfg.get("model", {}).get("base_learning_rate", 5e-5)),
        scale_lr=scale_lr,
        accumulate=accumulate,
        timesteps=module.timesteps,
        linear_start=module.linear_start,
        linear_end=module.linear_end,
        loss_type=module.loss_type,
        module=module,
        # use_scheduler <=> a scheduler_config block is present
        # (reference ddpm.py:562-565, 1431-1441)
        scheduler_config=mp.get("scheduler_config"),
        learn_logvar=bool(mp.get("learn_logvar", False)),
        scale_by_std=bool(mp.get("scale_by_std", True)),
        use_ema=bool(mp.get("use_ema", True)),
        ckpt_backend=ckpt_backend,
    )
    return module, trainer, img_size, bs


def build_dataset(cfg, split, img_size, data_root):
    data_p = (cfg.get("data") or {}).get("params") or {}
    sp = (data_p.get(split) or {}).get("params") or {}
    root = data_root or sp.get("root") or "./data/objaverse"
    ldm_split = {"train": "train", "validation": "validation", "test": "test"}[split]
    return LDMSliceDataset(root=root, split=ldm_split, size=img_size,
                           n_views=int(sp.get("n_views", 12)))


def write_sample_outputs(logdir, batch_idx, batch, gen):
    out_dir = os.path.join(logdir, "images_testing_sampled")
    os.makedirs(out_dir, exist_ok=True)
    for case in range(gen.shape[0]):
        save_image(to_uint8(batch["img_ipt_view"][case]),
                   os.path.join(out_dir, f"{batch_idx}_{case}_ipt.png"))
        save_image(to_uint8(slices_to_montage(gen[case])),
                   os.path.join(out_dir, f"{batch_idx}_{case}.png"))


def write_rec_outputs(logdir, batch_idx, rec):
    out_dir = os.path.join(logdir, "images_reconstructed")
    os.makedirs(out_dir, exist_ok=True)
    for case in range(rec.shape[0]):
        save_image(to_uint8(slices_to_montage(rec[case])),
                   os.path.join(out_dir, f"{batch_idx}_{case}.png"))


def run_vae_finetune(cfg, args):
    """AE finetune route (reference trains the AE through the same
    launcher: gen_slices/main.py:542 instantiating
    ldm.models.autoencoder.AutoencoderKL with LPIPSWithDiscriminator,
    autoencoder.py:442-451)."""
    from slice3d_tpu.train.checkpoint import TopKCheckpointer
    from slice3d_tpu.train.train_vae import VAEFinetuneTrainer

    mp = (cfg.get("model") or {}).get("params") or {}
    dd = mp.get("ddconfig") or {}
    lossp = (mp.get("lossconfig") or {}).get("params") or {}
    data_p = (cfg.get("data") or {}).get("params") or {}
    bs = int(data_p.get("batch_size", 2))
    img_size = 128
    for split in ("train", "validation", "test"):
        sp = (data_p.get(split) or {}).get("params") or {}
        if "size" in sp:
            img_size = int(sp["size"])
            break

    lpips_params = None
    lpips_ckpt = lossp.get("lpips_ckpt", "")
    if lpips_ckpt and os.path.exists(lpips_ckpt):
        import torch

        from slice3d_tpu.convert.torch_import import lpips_model

        sd = torch.load(lpips_ckpt, map_location="cpu", weights_only=False)
        lpips_params = lpips_model(sd.get("state_dict", sd))

    trainer = VAEFinetuneTrainer(
        img_size=img_size,
        lr=float(cfg.get("model", {}).get("base_learning_rate", 4.5e-6)),
        kl_weight=float(lossp.get("kl_weight", 1e-6)),
        disc_start=int(lossp.get("disc_start", 50001)),
        disc_weight=float(lossp.get("disc_weight", 0.5)),
        disc_n_layers=(int(lossp["disc_num_layers"])
                       if "disc_num_layers" in lossp else None),
        vae_ch=int(dd.get("ch", 128)),
        vae_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        vae_nres=int(dd.get("num_res_blocks", 2)),
        lpips_params=lpips_params,
        ckpt_backend=args.ckpt_backend,
    )
    state = trainer.init_state(args.seed)

    # start from a pretrained kl-f8 torch checkpoint when given
    ckpt_path = str(mp.get("ckpt_path") or "")
    if ckpt_path and os.path.exists(ckpt_path):
        import torch

        from slice3d_tpu.convert.torch_import import autoencoder_kl

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        vae_vars = autoencoder_kl(
            sd.get("state_dict", sd),
            ch=int(dd.get("ch", 128)),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=int(dd.get("num_res_blocks", 2)),
        )
        state = state.replace(params=vae_vars["params"])
        print(f"initialized VAE from {ckpt_path}")

    logdir = None
    if args.resume:
        if os.path.isfile(args.resume):
            ckpt = args.resume
            logdir = os.path.dirname(os.path.dirname(args.resume))
        else:
            logdir = args.resume.rstrip("/")
            ckpt = latest_checkpoint(os.path.join(logdir, "checkpoints"))
        if ckpt:
            state = trainer.restore(state, ckpt)
            print(f"restored from {ckpt} (step {int(state.step)})")
    if logdir is None:
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        cfg_name = args.name or (
            os.path.splitext(os.path.basename(args.base[0]))[0]
            if args.base else "vae_finetune")
        logdir = os.path.join(args.logdir, f"{now}_{cfg_name}")
    ckpt_dir = os.path.join(logdir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(os.path.join(logdir, "configs"), exist_ok=True)
    with open(os.path.join(logdir, "configs", "merged.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)

    ds = build_dataset(cfg, "train", img_size, args.data_root)
    loader = BatchLoader(ds, bs, shuffle=True, num_workers=4)
    try:
        val_ds = build_dataset(cfg, "validation", img_size, args.data_root)
        val_loader = BatchLoader(val_ds, bs, shuffle=False,
                                 drop_last=False, num_workers=2)
    except (FileNotFoundError, KeyError):
        val_loader = None

    writer = make_writer(logdir)
    topk = TopKCheckpointer(ckpt_dir, monitor="val/rec_loss", k=3,
                            backend=args.ckpt_backend)
    rng = jax.random.PRNGKey(args.seed)

    def flatten_stack(batch):
        # (B, 13, H, W, 3) slice stacks -> (13B, H, W, 3) images: the AE
        # trains on individual images (reference autoencoder.py:325-331)
        x = batch["image"]
        return {"image": x.reshape(-1, *x.shape[2:])}

    t0 = time.time()
    step = int(state.step)
    try:
        while True:
            for batch in loader:
                rng, sub = jax.random.split(rng)
                state, logs = trainer.train_step(state, flatten_stack(batch), sub)
                step = int(state.step)
                if step % 50 == 0:
                    print(f"step {step}: rec {float(logs['rec_loss']):.5f} "
                          f"kl {float(logs['kl']):.3f} "
                          f"disc {float(logs['disc_loss']):.5f} "
                          f"({time.time() - t0:.0f}s)")
                    for k in ("rec_loss", "kl", "g_loss", "d_weight",
                              "ae_loss", "disc_loss"):
                        writer.add_scalar(f"train/{k}", float(logs[k]), step)
                if step % args.ckpt_every == 0:
                    trainer.save(state, os.path.join(ckpt_dir, "last.ckpt"))
                if (val_loader is not None and args.val_every > 0
                        and step % args.val_every == 0):
                    v = validate_full(
                        lambda vb: trainer.eval_loss(
                            state, flatten_stack(vb), jax.random.PRNGKey(0)),
                        val_loader)
                    print(f"step {step}: val/rec_loss {v['rec_loss']:.5f}")
                    for k, val in v.items():
                        writer.add_scalar(f"val/{k}", val, step)
                    kept = topk.update(v["rec_loss"], step,
                                       trainer.state_payload(state))
                    if kept:
                        print(f"saved top-k checkpoint {kept}")
                if args.log_images_every > 0 and step % args.log_images_every == 0:
                    img_dir = os.path.join(logdir, "images", "train")
                    os.makedirs(img_dir, exist_ok=True)
                    rec = trainer.reconstruct(
                        state, batch["image"][0], jax.random.PRNGKey(0))
                    save_image(to_uint8(slices_to_montage(batch["image"][0, :12])),
                               os.path.join(img_dir, f"inputs_gs-{step:06}.png"))
                    save_image(to_uint8(slices_to_montage(rec[:12])),
                               os.path.join(img_dir, f"reconstruction_gs-{step:06}.png"))
                if args.max_steps > 0 and step >= args.max_steps:
                    trainer.save(state, os.path.join(ckpt_dir, "last.ckpt"))
                    wait_pending()
                    return
    except (Exception, KeyboardInterrupt):
        trainer.save(state, os.path.join(ckpt_dir, "last.ckpt"))
        wait_pending()
        print(f"saved emergency checkpoint at step {step}")
        raise


def main(argv=None):
    from slice3d_tpu.utils.cache import enable_compilation_cache

    from slice3d_tpu.parallel import init_distributed

    # join a multi-host cluster when SLICE3D_COORDINATOR/
    # NUM_PROCESSES/PROCESS_ID are set; MUST run before anything
    # initializes the XLA backend
    init_distributed()
    enable_compilation_cache()
    args, unknown = get_parser().parse_known_args(argv)
    cfg = load_config(args.base, unknown)
    scale_lr = str(args.scale_lr).lower() != "false"

    if args.train and is_autoencoder_target(cfg):
        return run_vae_finetune(cfg, args)

    module, trainer, img_size, bs = build_module_and_trainer(
        cfg, scale_lr, ckpt_backend=args.ckpt_backend)
    state = trainer.init_state(args.seed)

    # resume: -r may be a logdir or a ckpt file
    logdir = None
    if args.resume:
        if os.path.isfile(args.resume):
            ckpt = args.resume
            logdir = os.path.dirname(os.path.dirname(args.resume))
        else:
            logdir = args.resume.rstrip("/")
            ckpt = latest_checkpoint(os.path.join(logdir, "checkpoints"))
        if ckpt:
            state = trainer.restore(state, ckpt)
            print(f"restored from {ckpt} (step {int(state.step)})")

    if logdir is None:
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        cfg_name = (
            args.name
            or (os.path.splitext(os.path.basename(args.base[0]))[0] if args.base else "run")
        )
        logdir = os.path.join(args.logdir, f"{now}_{cfg_name}")
    ckpt_dir = os.path.join(logdir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(os.path.join(logdir, "configs"), exist_ok=True)
    with open(os.path.join(logdir, "configs", "merged.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)

    if args.train:
        # SIGUSR1 -> emergency checkpoint; any exception also checkpoints
        # (reference main.py:704-729 melk/divein semantics).
        import signal

        want_ckpt = {"flag": False}
        try:
            signal.signal(signal.SIGUSR1, lambda *_: want_ckpt.update(flag=True))
        except (ValueError, OSError):
            pass

        ds = build_dataset(cfg, "train", img_size, args.data_root)
        loader = BatchLoader(ds, bs, shuffle=True, num_workers=4)
        try:
            val_ds = build_dataset(cfg, "validation", img_size, args.data_root)
            val_loader = BatchLoader(val_ds, bs, shuffle=False,
                                     drop_last=False, num_workers=2)
        except (FileNotFoundError, KeyError):
            val_loader = None
        from slice3d_tpu.train.checkpoint import TopKCheckpointer

        writer = make_writer(logdir)
        topk = TopKCheckpointer(ckpt_dir, monitor="val/loss_simple_ema",
                                k=3, backend=args.ckpt_backend)
        rng = jax.random.PRNGKey(args.seed)
        t0 = time.time()
        step = int(state.step)
        try:
            while True:
                for batch in loader:
                    if int(state.step) == 0:
                        state = trainer.maybe_set_scale(state, batch)
                    rng, sub = jax.random.split(rng)
                    state, logs = trainer.train_step(state, batch, sub)
                    step = int(state.step)
                    if step % 50 == 0:
                        print(f"step {step}: loss {float(logs['loss']):.5f} "
                              f"simple {float(logs['loss_simple']):.5f} "
                              f"({time.time() - t0:.0f}s)")
                        # scalar parity: train/loss_simple, train/loss_vlb,
                        # lr_abs (reference ddpm.py:358-365 + LR monitor)
                        for k in ("loss", "loss_simple", "loss_vlb"):
                            writer.add_scalar(f"train/{k}", float(logs[k]), step)
                        writer.add_scalar("lr_abs", trainer.current_lr(step), step)
                    if step % args.ckpt_every == 0 or want_ckpt["flag"]:
                        want_ckpt["flag"] = False
                        trainer.save(state, os.path.join(ckpt_dir, "last.ckpt"))
                    if (val_loader is not None and args.val_every > 0
                            and step % args.val_every == 0):
                        # whole val split, like Lightning's val loop
                        # (reference gen_slices/main.py:670-675)
                        v = validate_full(
                            lambda vb: trainer.eval_loss(
                                state, vb, jax.random.PRNGKey(0),
                                use_ema=False),
                            val_loader)
                        ve = validate_full(
                            lambda vb: trainer.eval_loss(
                                state, vb, jax.random.PRNGKey(0),
                                use_ema=True),
                            val_loader)
                        print(f"step {step}: val/loss_simple "
                              f"{v['loss_simple']:.5f} ema {ve['loss_simple']:.5f}")
                        writer.add_scalar("val/loss_simple", v["loss_simple"], step)
                        writer.add_scalar("val/loss_simple_ema",
                                          ve["loss_simple"], step)
                        # save_last + top-3 on the monitor metric
                        # (reference main.py:576-597)
                        kept = topk.update(
                            ve["loss_simple"], step, trainer.state_payload(state))
                        if kept:
                            print(f"saved top-k checkpoint {kept}")
                    if args.log_images_every > 0 and step % args.log_images_every == 0:
                        # ImageLogger parity (reference main.py:289-399):
                        # inputs + VAE reconstruction + DDIM-sampled montage
                        img_dir = os.path.join(logdir, "images", "train")
                        os.makedirs(img_dir, exist_ok=True)
                        rec = trainer.reconstruct_slices(state, batch)
                        save_image(to_uint8(slices_to_montage(batch["image"][0, :12])),
                                   os.path.join(img_dir, f"inputs_gs-{step:06}.png"))
                        save_image(to_uint8(slices_to_montage(rec[0])),
                                   os.path.join(img_dir, f"reconstruction_gs-{step:06}.png"))
                        gen = trainer.sample_slices(
                            state, batch, ddim_steps=args.ddim_steps,
                            eta=args.ddim_eta, rng=jax.random.PRNGKey(step))
                        save_image(to_uint8(slices_to_montage(gen[0])),
                                   os.path.join(img_dir, f"samples_gs-{step:06}.png"))
                        if args.log_progressive_rows:
                            # plot_progressive_rows + plot_diffusion_rows
                            # (reference ddpm.py:1354-1418): full-T ancestral
                            # denoise row and forward-noising row, one montage
                            # column per logged step
                            _, prog = trainer.sample_progressive(
                                state, batch, log_every_t=args.log_every_t,
                                rng=jax.random.PRNGKey(step))
                            row = np.concatenate(list(prog[:, 0]), axis=2)
                            save_image(to_uint8(slices_to_montage(row)),
                                       os.path.join(img_dir,
                                                    f"progressive_row_gs-{step:06}.png"))
                            diff = trainer.diffusion_row(
                                state, batch, log_every_t=args.log_every_t,
                                rng=jax.random.PRNGKey(step))
                            drow = np.concatenate(list(diff[:, 0]), axis=2)
                            save_image(to_uint8(slices_to_montage(drow)),
                                       os.path.join(img_dir,
                                                    f"diffusion_row_gs-{step:06}.png"))
                    if args.max_steps > 0 and step >= args.max_steps:
                        trainer.save(state, os.path.join(ckpt_dir, "last.ckpt"))
                        wait_pending()
                        return
        except (Exception, KeyboardInterrupt):
            trainer.save(state, os.path.join(ckpt_dir, "last.ckpt"))
            wait_pending()
            print(f"saved emergency checkpoint at step {step}")
            raise
    else:
        mode = args.mode or "sample"
        split = "test"
        ds = build_dataset(cfg, split, img_size, args.data_root)
        if mode == "rec":
            ds.split = "trainval_rec"
            ds.__post_init__()
        loader = BatchLoader(ds, bs, shuffle=False, drop_last=False, num_workers=4)
        for batch_idx, batch in enumerate(loader):
            if mode == "rec":
                rec = trainer.reconstruct_slices(state, batch)
                write_rec_outputs(logdir, batch_idx, rec)
            else:
                gen = trainer.sample_slices(
                    state, batch, ddim_steps=args.ddim_steps, eta=args.ddim_eta,
                    sampler=args.sampler, guidance_scale=args.guidance_scale,
                    rng=jax.random.PRNGKey(args.seed + batch_idx),
                )
                write_sample_outputs(logdir, batch_idx, batch, gen)
            print(f"batch {batch_idx} done")


if __name__ == "__main__":
    main()
