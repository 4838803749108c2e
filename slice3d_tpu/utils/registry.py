"""target/params config instantiation (gen_slices ldm/util.py:78-93 style).

YAML configs name classes by dotted path under ``target:`` with kwargs in
``params:``.  Reference class paths (``ldm.models.diffusion.ddpm.
LatentDiffusion`` etc.) are aliased onto our TPU-native implementations so
the reference's config files work unchanged.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, Mapping

__all__ = ["instantiate_from_config", "resolve_target", "ALIASES"]

ALIASES: Dict[str, str] = {
    # reference (gen_slices) -> slice3d_tpu
    "ldm.models.diffusion.ddpm.LatentDiffusion":
        "slice3d_tpu.diffusion.latent.LatentDiffusion",
    "ldm.models.autoencoder.AutoencoderKL":
        "slice3d_tpu.models.vae.AutoencoderKL",
    "ldm.modules.diffusionmodules.openaimodel.UNetModel":
        "slice3d_tpu.models.ldm_unet.LDMUNet",
    "ldm.modules.encoders.modules.ImageEncoderVGG16BN":
        "slice3d_tpu.models.cond_encoder.CondImageEncoder",
    "ldm.data.objaverse.ObjaverseTrain": "slice3d_tpu.data.ldm_data.LDMSliceDataset",
    "ldm.data.objaverse.ObjaverseValidation": "slice3d_tpu.data.ldm_data.LDMSliceDataset",
    "ldm.data.objaverse.ObjaverseTest": "slice3d_tpu.data.ldm_data.LDMSliceDataset",
    "ldm.data.objaverse.ObjaverseTrainValRec": "slice3d_tpu.data.ldm_data.LDMSliceDataset",
    "ldm.data.custom_sin_img.CustomSinImgTrain": "slice3d_tpu.data.ldm_data.LDMSliceDataset",
    "ldm.data.custom_sin_img.CustomSinImgValidation": "slice3d_tpu.data.ldm_data.LDMSliceDataset",
    "ldm.data.custom_sin_img.CustomSinImgTest": "slice3d_tpu.data.ldm_data.LDMSliceDataset",
    # placeholder loss configs (reference kl-f8 yaml sets lossconfig to
    # torch.nn.Identity): an explicit no-op, not a silent builtins alias
    "torch.nn.Identity": "slice3d_tpu.utils.registry.NoOp",
}


class NoOp:
    """Explicit no-op target for placeholder config entries.

    Aliased from the reference's ``torch.nn.Identity`` placeholder
    lossconfig, so calling it passes its first argument through
    (identity semantics) rather than silently returning None.
    """

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        return args[0] if args else None

# Reference param names that have no meaning in the TPU build (device/layout
# details handled elsewhere) — dropped with a note instead of erroring.
_IGNORED_PARAMS = {
    "ckpt_path", "monitor", "lossconfig", "ddconfig", "first_stage_config",
    "cond_stage_config", "unet_config", "image_size", "channels",
    "cond_stage_trainable", "conditioning_key", "first_stage_key",
    "cond_stage_key", "scale_by_std", "num_timesteps_cond", "log_every_t",
    "use_scale_shift_norm", "resblock_updown", "attention_resolutions",
    "num_heads", "use_ema",
}


def resolve_target(target: str) -> Any:
    target = ALIASES.get(target, target)
    module, name = target.rsplit(".", 1)
    return getattr(importlib.import_module(module), name)


def instantiate_from_config(config: Mapping, **extra):
    if "target" not in config:
        raise KeyError("config has no 'target' key")
    cls = resolve_target(config["target"])
    params = dict(config.get("params") or {})
    import inspect

    try:
        sig = inspect.signature(cls)
        accepted = set(sig.parameters)
        dropped = {k: v for k, v in params.items() if k not in accepted}
        params = {k: v for k, v in params.items() if k in accepted}
        if dropped:
            keys = set(dropped) - _IGNORED_PARAMS
            if keys:
                print(f"[registry] dropping unsupported params for {cls.__name__}: {sorted(keys)}")
    except (TypeError, ValueError):
        pass
    params.update(extra)
    return cls(**params)
