"""Convert torch/torchvision checkpoints into slice3d_tpu param pytrees.

The reference stack builds on torchvision vgg16_bn / vgg19 backbones and
saves ``{model, opt, n_epoch, n_iter}`` checkpoints (reg_slices/train.py:174)
or Lightning state dicts.  These helpers map such state dicts (torch tensors
or numpy arrays) onto our flax module trees.

Layout conventions:
  * torch Conv2d weight  (O, I, kH, kW)  -> flax kernel (kH, kW, I, O)
  * torch Linear weight  (O, I)          -> flax kernel (I, O)
  * torch ConvTranspose2d weight (I, O, kH, kW) -> flax (kH, kW, O, I) with
    ``transpose_kernel=True`` (spatially un-flipped).
  * Linears consuming torch-flattened NCHW activations are channel-permuted
    so they act on our NHWC flatten order.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "to_numpy",
    "conv_kernel",
    "linear_params",
    "conv_params",
    "bn_params",
    "nchw_flat_linear_params",
    "vgg16bn_backbone",
    "vgg19_features",
]


def to_numpy(sd: Mapping) -> Dict[str, np.ndarray]:
    """Convert a (possibly torch-tensor-valued) state dict to numpy."""
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _key(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def conv_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    p = {"kernel": conv_kernel(np.asarray(sd[_key(prefix, "weight")]))}
    if _key(prefix, "bias") in sd:
        p["bias"] = np.asarray(sd[_key(prefix, "bias")])
    return p


def linear_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[_key(prefix, "weight")]).T),
        "bias": np.asarray(sd[_key(prefix, "bias")]),
    }


def nchw_flat_linear_params(
    sd: Mapping, prefix: str, chw: Tuple[int, int, int]
) -> Dict[str, np.ndarray]:
    """Linear over a torch ``flatten(NCHW)`` input, re-ordered for NHWC."""
    c, h, w = chw
    weight = np.asarray(sd[_key(prefix, "weight")])  # (O, C*H*W)
    o = weight.shape[0]
    weight = weight.reshape(o, c, h, w).transpose(0, 2, 3, 1).reshape(o, h * w * c)
    return {"kernel": np.ascontiguousarray(weight.T), "bias": np.asarray(sd[_key(prefix, "bias")])}


def bn_params(sd: Mapping, prefix: str):
    params = {"scale": np.asarray(sd[_key(prefix, "weight")]), "bias": np.asarray(sd[_key(prefix, "bias")])}
    stats = {
        "mean": np.asarray(sd[_key(prefix, "running_mean")]),
        "var": np.asarray(sd[_key(prefix, "running_var")]),
    }
    return params, stats


# torchvision `features` indices of the conv layers.
_VGG16BN_CONV_IDX = [0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37, 40]
_VGG19_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30]


def vgg16bn_backbone(sd: Mapping, prefix: str = "features") -> Dict:
    """Map torchvision vgg16_bn features onto VGG16BNBackbone variables.

    Returns a dict with 'params' and 'batch_stats' subtrees.
    """
    sd = to_numpy(sd)
    params, stats = {}, {}
    for i, fi in enumerate(_VGG16BN_CONV_IDX):
        params[f"conv{i}"] = conv_params(sd, _key(prefix, str(fi)))
        p, s = bn_params(sd, _key(prefix, str(fi + 1)))
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return {"params": params, "batch_stats": stats}


def layer_norm_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[_key(prefix, "weight")]),
        "bias": np.asarray(sd[_key(prefix, "bias")]),
    }


def transformer_encoder(sd: Mapping, prefix: str, num_layers: int = 3) -> Dict:
    """Map torch nn.TransformerEncoder onto our TransformerEncoder params.

    Expects torch defaults (batch_first, post-LN, fused in_proj).
    """
    sd = to_numpy(sd)
    params = {}
    for i in range(num_layers):
        lp = _key(prefix, f"layers.{i}")
        params[f"layer{i}"] = {
            "qkv": {
                "kernel": np.ascontiguousarray(np.asarray(sd[f"{lp}.self_attn.in_proj_weight"]).T),
                "bias": np.asarray(sd[f"{lp}.self_attn.in_proj_bias"]),
            },
            "out_proj": linear_params(sd, f"{lp}.self_attn.out_proj"),
            "ff1": linear_params(sd, f"{lp}.linear1"),
            "ff2": linear_params(sd, f"{lp}.linear2"),
            "norm1": layer_norm_params(sd, f"{lp}.norm1"),
            "norm2": layer_norm_params(sd, f"{lp}.norm2"),
        }
    return params


def conv_transpose_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch ConvTranspose2d (I, O, kH, kW) -> flax transpose_kernel layout."""
    w = np.asarray(sd[_key(prefix, "weight")])
    p = {"kernel": np.transpose(w, (2, 3, 1, 0))}  # (kH, kW, O, I)
    if _key(prefix, "bias") in sd:
        p["bias"] = np.asarray(sd[_key(prefix, "bias")])
    return p


# Reference VGG16BNFeats / UNet encoder slice names -> (block, index).
# torch Sequential slicing PRESERVES the original child indices, so the
# reference's sliced blocks (vgg16bn_feats.py:31-36, unet_custom.py:15-20)
# keep torchvision's absolute `features` numbering.  Entries are
# (conv_i, conv_block, conv_abs_idx, bn_block, bn_abs_idx) where blocks are
# the six slices [:4],[4:11],[11:21],[21:31],[31:41],[41:44].
_REF_VGG_SLICES = [
    (0, 0, 0, 0, 1),
    (1, 0, 3, 1, 4),
    (2, 1, 7, 1, 8),
    (3, 1, 10, 2, 11),
    (4, 2, 14, 2, 15),
    (5, 2, 17, 2, 18),
    (6, 2, 20, 3, 21),
    (7, 3, 24, 3, 25),
    (8, 3, 27, 3, 28),
    (9, 3, 30, 4, 31),
    (10, 4, 34, 4, 35),
    (11, 4, 37, 4, 38),
    (12, 4, 40, 5, 41),
]


def vgg16bn_backbone_from_ref(sd: Mapping, block_names) -> Dict:
    """Convert a reference-style sliced VGG16-BN encoder.

    ``block_names``: the six sequential block prefixes, e.g.
    ``["img_encoder.conv1_2", ..., "img_encoder.conv_last"]`` for the
    GT-slice model or ``["slices_generator.down1", ...,
    "slices_generator.down5_"]`` for the slice U-Net.
    """
    sd = to_numpy(sd)
    params, stats = {}, {}
    for ci, cb, cidx, bb, bidx in _REF_VGG_SLICES:
        params[f"conv{ci}"] = conv_params(sd, f"{block_names[cb]}.{cidx}")
        p, s = bn_params(sd, f"{block_names[bb]}.{bidx}")
        params[f"bn{ci}"] = p
        stats[f"bn{ci}"] = s
    return {"params": params, "batch_stats": stats}


def _mlp_from_sequential(sd: Mapping, prefix: str, linear_indices) -> Dict:
    return {
        f"fc{i}": linear_params(sd, f"{prefix}.{li}") for i, li in enumerate(linear_indices)
    }


def gtslice_model(sd: Mapping) -> Dict:
    """Reference Slices3DGTModel state dict -> GTSliceModel variables."""
    sd = to_numpy(sd)
    blocks = [f"img_encoder.{b}" for b in
              ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3", "conv_last")]
    enc = vgg16bn_backbone_from_ref(sd, blocks)
    head = {
        "pts_mlp": _mlp_from_sequential(sd, "pts_feat_extractor", (0, 2, 4)),
        "fc_local": _mlp_from_sequential(sd, "fc_local", (0, 2)),
        "att_decoder": transformer_encoder(sd, "att_decoder", num_layers=3),
        "fc_out": linear_params(sd, "fc_out.0"),
    }
    return {
        "params": {"img_encoder": enc["params"], "head": head},
        "batch_stats": {"img_encoder": enc["batch_stats"]},
    }


def slicenet_model(sd: Mapping) -> Dict:
    """Reference Slices3DRegModel state dict -> SliceNetModel variables."""
    sd = to_numpy(sd)
    g = "slices_generator"
    blocks = [f"{g}.down{i}" for i in (1, 2, 3, 4, 5)] + [f"{g}.down5_"]
    enc = vgg16bn_backbone_from_ref(sd, blocks)

    unet_params: Dict = {"encoder": enc["params"]}
    unet_stats: Dict = {"encoder": enc["batch_stats"]}
    unet_params["emds"] = {"embedding": np.asarray(sd[f"{g}.emds.weight"])}
    unet_params["trans_c"] = conv_params(sd, f"{g}.trans_c")
    for i in (1, 2, 3, 4):
        unet_params[f"trans_up{i}"] = conv_params(sd, f"{g}.trans_up{i}")
        up_params, up_stats = {}, {}
        up_params["up"] = conv_transpose_params(sd, f"{g}.up{i}.up")
        conv_p, conv_s = {}, {}
        for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
            conv_p[f"conv{j}"] = conv_params(sd, f"{g}.up{i}.conv.double_conv.{ci}")
            p, s = bn_params(sd, f"{g}.up{i}.conv.double_conv.{bi}")
            conv_p[f"bn{j}"] = p
            conv_s[f"bn{j}"] = s
        up_params["conv"] = conv_p
        up_stats["conv"] = conv_s
        unet_params[f"up{i}"] = up_params
        unet_stats[f"up{i}"] = up_stats
    unet_params["outc"] = conv_params(sd, f"{g}.outc.conv")

    head = {
        "fc_p": linear_params(sd, "fc_p"),
        "fc_s": linear_params(sd, "fc_s"),
        "att_decoder": transformer_encoder(sd, "att_decoder", num_layers=3),
        "fc_out": linear_params(sd, "fc_out.0"),
    }
    return {
        "params": {"slices_generator": unet_params, "head": head},
        "batch_stats": {"slices_generator": unet_stats},
    }


def group_norm_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[_key(prefix, "weight")]),
        "bias": np.asarray(sd[_key(prefix, "bias")]),
    }


def _resnet_block(sd: Mapping, p: str, has_shortcut: bool) -> Dict:
    out = {
        "norm1": group_norm_params(sd, f"{p}.norm1"),
        "conv1": conv_params(sd, f"{p}.conv1"),
        "norm2": group_norm_params(sd, f"{p}.norm2"),
        "conv2": conv_params(sd, f"{p}.conv2"),
    }
    if has_shortcut:
        out["nin_shortcut"] = conv_params(sd, f"{p}.nin_shortcut")
    return out


def _attn_block(sd: Mapping, p: str) -> Dict:
    return {
        "norm": group_norm_params(sd, f"{p}.norm"),
        "q": conv_params(sd, f"{p}.q"),
        "k": conv_params(sd, f"{p}.k"),
        "v": conv_params(sd, f"{p}.v"),
        "proj_out": conv_params(sd, f"{p}.proj_out"),
    }


def autoencoder_kl(
    sd: Mapping,
    prefix: str = "",
    ch: int = 128,
    ch_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
) -> Dict:
    """CompVis AutoencoderKL state dict -> our AutoencoderKL params.

    Accepts both bare VAE checkpoints (encoder./decoder./quant_conv.) and
    LatentDiffusion checkpoints (pass prefix='first_stage_model').
    """
    sd = to_numpy(sd)
    enc: Dict = {"conv_in": conv_params(sd, _key(prefix, "encoder.conv_in"))}
    in_ch = ch
    for i, mult in enumerate(ch_mult):
        out_ch = ch * mult
        for j in range(num_res_blocks):
            p = _key(prefix, f"encoder.down.{i}.block.{j}")
            enc[f"down{i}_block{j}"] = _resnet_block(sd, p, in_ch != out_ch)
            in_ch = out_ch
        if i + 1 < len(ch_mult):
            enc[f"down{i}_downsample"] = {
                "conv": conv_params(sd, _key(prefix, f"encoder.down.{i}.downsample.conv"))
            }
    enc["mid_block1"] = _resnet_block(sd, _key(prefix, "encoder.mid.block_1"), False)
    enc["mid_attn"] = _attn_block(sd, _key(prefix, "encoder.mid.attn_1"))
    enc["mid_block2"] = _resnet_block(sd, _key(prefix, "encoder.mid.block_2"), False)
    enc["norm_out"] = group_norm_params(sd, _key(prefix, "encoder.norm_out"))
    enc["conv_out"] = conv_params(sd, _key(prefix, "encoder.conv_out"))

    dec: Dict = {"conv_in": conv_params(sd, _key(prefix, "decoder.conv_in"))}
    dec["mid_block1"] = _resnet_block(sd, _key(prefix, "decoder.mid.block_1"), False)
    dec["mid_attn"] = _attn_block(sd, _key(prefix, "decoder.mid.attn_1"))
    dec["mid_block2"] = _resnet_block(sd, _key(prefix, "decoder.mid.block_2"), False)
    in_ch = ch * ch_mult[-1]
    for i in reversed(range(len(ch_mult))):
        out_ch = ch * ch_mult[i]
        for j in range(num_res_blocks + 1):
            p = _key(prefix, f"decoder.up.{i}.block.{j}")
            dec[f"up{i}_block{j}"] = _resnet_block(sd, p, in_ch != out_ch)
            in_ch = out_ch
        if i > 0:
            dec[f"up{i}_upsample"] = {
                "conv": conv_params(sd, _key(prefix, f"decoder.up.{i}.upsample.conv"))
            }
    dec["norm_out"] = group_norm_params(sd, _key(prefix, "decoder.norm_out"))
    dec["conv_out"] = conv_params(sd, _key(prefix, "decoder.conv_out"))

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": conv_params(sd, _key(prefix, "quant_conv")),
            "post_quant_conv": conv_params(sd, _key(prefix, "post_quant_conv")),
        }
    }


def _conv1d_as_dense(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv1d(kernel=1) weight (O, I, 1) -> Dense kernel (I, O)."""
    w = np.asarray(sd[_key(prefix, "weight")])
    return {
        "kernel": np.ascontiguousarray(w[:, :, 0].T),
        "bias": np.asarray(sd[_key(prefix, "bias")]),
    }


def _adm_resblock(sd: Mapping, p: str, has_skip: bool) -> Dict:
    out = {
        "in_norm": group_norm_params(sd, f"{p}.in_layers.0"),
        "in_conv": conv_params(sd, f"{p}.in_layers.2"),
        "emb_proj": linear_params(sd, f"{p}.emb_layers.1"),
        "out_norm": group_norm_params(sd, f"{p}.out_layers.0"),
        "out_conv": conv_params(sd, f"{p}.out_layers.3"),
    }
    if has_skip:
        out["skip"] = conv_params(sd, f"{p}.skip_connection")
    return out


def _adm_attn(sd: Mapping, p: str) -> Dict:
    return {
        "norm": group_norm_params(sd, f"{p}.norm"),
        "qkv": _conv1d_as_dense(sd, f"{p}.qkv"),
        "proj_out": _conv1d_as_dense(sd, f"{p}.proj_out"),
    }


def ldm_unet(
    sd: Mapping,
    prefix: str = "model.diffusion_model",
    model_channels: int = 192,
    channel_mult=(1, 2, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_ds=(1, 2, 4, 8),
) -> Dict:
    """Reference UNetModel state dict -> LDMUNet params.

    The ADM QKVAttentionLegacy layout (heads-major interleave) matches our
    head reshape, so qkv weights convert as plain dense kernels.
    """
    sd = to_numpy(sd)
    params: Dict = {
        "time_embed_0": linear_params(sd, _key(prefix, "time_embed.0")),
        "time_embed_2": linear_params(sd, _key(prefix, "time_embed.2")),
        "input_0_0": conv_params(sd, _key(prefix, "input_blocks.0.0")),
        "out_norm": group_norm_params(sd, _key(prefix, "out.0")),
        "out_conv": conv_params(sd, _key(prefix, "out.2")),
    }

    block_id = 1
    ds = 1
    ch = model_channels
    for level, mult in enumerate(channel_mult):
        out_ch = model_channels * mult
        for _ in range(num_res_blocks):
            p = _key(prefix, f"input_blocks.{block_id}")
            params[f"input_{block_id}_0"] = _adm_resblock(sd, f"{p}.0", ch != out_ch)
            if ds in attention_ds:
                params[f"input_{block_id}_1"] = _adm_attn(sd, f"{p}.1")
            ch = out_ch
            block_id += 1
        if level + 1 < len(channel_mult):
            p = _key(prefix, f"input_blocks.{block_id}")
            params[f"input_{block_id}_0"] = _adm_resblock(sd, f"{p}.0", False)
            block_id += 1
            ds *= 2

    params["middle_0"] = _adm_resblock(sd, _key(prefix, "middle_block.0"), False)
    params["middle_1"] = _adm_attn(sd, _key(prefix, "middle_block.1"))
    params["middle_2"] = _adm_resblock(sd, _key(prefix, "middle_block.2"), False)

    block_id = 0
    for level in reversed(range(len(channel_mult))):
        out_ch = model_channels * channel_mult[level]
        for i in range(num_res_blocks + 1):
            p = _key(prefix, f"output_blocks.{block_id}")
            params[f"output_{block_id}_0"] = _adm_resblock(sd, f"{p}.0", True)
            li = 1
            if ds in attention_ds:
                params[f"output_{block_id}_{li}"] = _adm_attn(sd, f"{p}.{li}")
                li += 1
            if level > 0 and i == num_res_blocks:
                params[f"output_{block_id}_{li}"] = _adm_resblock(sd, f"{p}.{li}", False)
                ds //= 2
            block_id += 1
    return {"params": params}


def disn_model(sd: Mapping) -> Dict:
    """Reference DISNModel state dict -> DISNModel variables.

    The global head follows vgg16bn_feats_for_disn.py's dropout MLP
    (classifier Sequential with Linears at 0/3/6).
    """
    sd = to_numpy(sd)
    blocks = [f"img_encoder.{b}" for b in
              ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3", "conv_last")]
    enc = vgg16bn_backbone_from_ref(sd, blocks)
    params: Dict = {
        "img_encoder": enc["params"],
        "pts_feat_extractor": _mlp_from_sequential(sd, "pts_feat_extractor", (0, 2, 4)),
        "fc_local": _mlp_from_sequential(sd, "fc_local", (0, 2, 4)),
        "fc_global": _mlp_from_sequential(sd, "fc_global", (0, 2, 4)),
    }
    if "img_encoder.classifier.0.weight" in sd:
        # dropout-MLP head: Linear(8192,1024) @0, Linear(1024,1024) @3,
        # Linear(1024, D) @6 — the first consumes a torch-flattened NCHW map
        gh = {
            "fc0": nchw_flat_linear_params(sd, "img_encoder.classifier.0", (512, 4, 4)),
            "fc1": linear_params(sd, "img_encoder.classifier.3"),
            "fc2": linear_params(sd, "img_encoder.classifier.6"),
        }
        params["global_head"] = gh
    return {"params": params, "batch_stats": {"img_encoder": enc["batch_stats"]}}


def camnet_model(sd: Mapping) -> Dict:
    """Reference CameraNet state dict -> CameraNet variables.

    The torch trunk is `global_features` = the full vgg16_bn features
    Sequential, so keys carry torchvision's absolute indices.
    """
    sd = to_numpy(sd)
    enc = vgg16bn_backbone(sd, "global_features.0")
    params: Dict = {
        "backbone": enc["params"],
        "fc": nchw_flat_linear_params(sd, "fc", (512, 4, 4)),
        "branch_ortho6d": {
            "fc0": linear_params(sd, "branch_ortho6d.0.0"),
            "fc1": linear_params(sd, "branch_ortho6d.1.0"),
            "fc2": linear_params(sd, "branch_ortho6d.2.0"),
        },
        "branch_dist": {
            "fc0": linear_params(sd, "branch_dist.0.0"),
            "fc1": linear_params(sd, "branch_dist.1.0"),
            "fc2": linear_params(sd, "branch_dist.2.0"),
        },
    }
    return {"params": params, "batch_stats": {"backbone": enc["batch_stats"]}}


def cond_image_encoder(sd: Mapping, prefix: str = "cond_stage_model") -> Dict:
    """Reference ImageEncoderVGG16BN -> CondImageEncoder variables."""
    sd = to_numpy(sd)
    blocks = [
        _key(prefix, b)
        for b in ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3", "conv_last")
    ]
    enc = vgg16bn_backbone_from_ref(sd, blocks)
    params: Dict = {"backbone": enc["params"]}
    for i, t in enumerate(("trans1_2", "trans2_2", "trans3_3", "trans4_3", "trans5_3")):
        params[f"trans{i}"] = conv_params(sd, _key(prefix, t))
    return {"params": params, "batch_stats": {"backbone": enc["batch_stats"]}}


def vgg19_features(sd: Mapping, prefix: str = "features") -> Dict:
    """Map torchvision vgg19 features onto VGG19Features params."""
    sd = to_numpy(sd)
    params = {}
    for i, fi in enumerate(_VGG19_CONV_IDX):
        params[f"conv{i}"] = conv_params(sd, _key(prefix, str(fi)))
    return {"params": params}


# torch vgg16 (no BN) conv indices within the `features` Sequential, and the
# same convs' indices inside the taming lpips `vgg16` slice wrapper (which
# keeps the original numbering: net.slice1.0, net.slice1.2, net.slice2.5...)
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_LPIPS_SLICE_OF_CONV = (1, 1, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 5)


def lpips_model(sd: Mapping) -> Dict:
    """taming/richzhang LPIPS (vgg) state dict -> LPIPS module params.

    Expects keys ``net.slice{k}.{i}.weight`` for the VGG16 convs and
    ``lin{k}.model.1.weight`` for the five 1x1 lin heads (reference
    contperceptual.py:17 -> taming lpips.LPIPS).
    """
    sd = to_numpy(sd)
    net = {}
    for i, (fi, sl) in enumerate(zip(_VGG16_CONV_IDX, _LPIPS_SLICE_OF_CONV)):
        net[f"conv{i}"] = conv_params(sd, f"net.slice{sl}.{fi}")
    params = {"net": net}
    for k in range(5):
        params[f"lin{k}"] = {
            "kernel": conv_kernel(np.asarray(sd[f"lin{k}.model.1.weight"]))
        }
    return {"params": params}
