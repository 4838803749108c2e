#!/usr/bin/env python
"""Convert reference torch checkpoints to native msgpack checkpoints.

Supports the reg_slices ``{model, opt, n_epoch, n_iter}`` format and bare
state dicts, for all model families:

  python tools/convert_ckpt.py --kind slicenet --src ref.ckpt --dst out.ckpt
  python tools/convert_ckpt.py --kind gtslice  --src ref.ckpt --dst out.ckpt
  python tools/convert_ckpt.py --kind disn     --src ref.ckpt --dst out.ckpt
  python tools/convert_ckpt.py --kind camnet   --src ref.ckpt --dst out.ckpt
  python tools/convert_ckpt.py --kind vae      --src kl-f8.ckpt --dst out.ckpt
  python tools/convert_ckpt.py --kind ldm_unet --src ldm.ckpt  --dst out.ckpt
  python tools/convert_ckpt.py --kind vgg19    --src vgg19.pth --dst out.ckpt

The output loads with slice3d_tpu.train.checkpoint.restore_checkpoint and
the --name_ckpt CLI flags.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["slicenet", "gtslice", "disn", "camnet", "vae",
                            "ldm_unet", "cond_encoder", "vgg16bn", "vgg19"])
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--prefix", default="",
                   help="state-dict key prefix (e.g. first_stage_model for a "
                        "VAE inside an LDM checkpoint)")
    args = p.parse_args()

    import torch

    from slice3d_tpu.convert import torch_import as ti
    from slice3d_tpu.train.checkpoint import save_checkpoint

    payload = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = payload.get("model", payload.get("state_dict", payload)) \
        if isinstance(payload, dict) else payload
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    fn = {
        "slicenet": lambda: ti.slicenet_model(sd),
        "gtslice": lambda: ti.gtslice_model(sd),
        "disn": lambda: ti.disn_model(sd),
        "camnet": lambda: ti.camnet_model(sd),
        "vae": lambda: ti.autoencoder_kl(sd, args.prefix),
        "ldm_unet": lambda: ti.ldm_unet(sd, args.prefix or "model.diffusion_model"),
        "cond_encoder": lambda: ti.cond_image_encoder(sd, args.prefix or "cond_stage_model"),
        "vgg16bn": lambda: ti.vgg16bn_backbone(sd, args.prefix or "features"),
        "vgg19": lambda: ti.vgg19_features(sd, args.prefix or "features"),
    }[args.kind]
    variables = fn()

    state = {
        "variables": variables,
        "n_epoch": payload.get("n_epoch", 0) if isinstance(payload, dict) else 0,
        "n_iter": payload.get("n_iter", 0) if isinstance(payload, dict) else 0,
    }
    save_checkpoint(args.dst, state)
    print(f"wrote {args.dst} ({args.kind})")


if __name__ == "__main__":
    main()
