"""Minimal torch reference models for parity tests.

torchvision is not installed in this environment, so the standard VGG
feature stacks are reconstructed here from their public configuration
(Simonyan & Zisserman, config D/E).  State-dict key numbering matches
torchvision's ``features`` Sequential, so the production converters apply.
"""

import torch
import torch.nn as nn

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def make_features(cfg, batch_norm):
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            if batch_norm:
                layers.append(nn.BatchNorm2d(v))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return nn.Sequential(*layers)


def vgg16_bn_features():
    return make_features(VGG16_CFG, batch_norm=True)


def vgg19_features():
    return make_features(VGG19_CFG, batch_norm=False)


class TorchRefVGGEncoder(nn.Module):
    """VGG16-BN multi-scale tap encoder with reference-style slicing/naming
    (img_encoder.conv1_2 .. conv_last), used to validate checkpoint import.
    The unused global classifier head is omitted."""

    def __init__(self):
        super().__init__()
        feats = vgg16_bn_features()
        self.conv1_2 = feats[:4]
        self.conv2_2 = feats[4:11]
        self.conv3_3 = feats[11:21]
        self.conv4_3 = feats[21:31]
        self.conv5_3 = feats[31:41]
        self.conv_last = feats[41:44]

    def forward(self, img):
        t1 = self.conv1_2(img)
        t2 = self.conv2_2(t1.clone())
        t3 = self.conv3_3(t2.clone())
        t4 = self.conv4_3(t3.clone())
        t5 = self.conv5_3(t4.clone())
        return [t1, t2, t3, t4, t5]


def project_coord(coords, trans_mat_tp):
    homo = torch.cat([coords, torch.ones_like(coords[..., :1])], dim=-1)
    uvw = torch.bmm(homo, trans_mat_tp)
    xy = uvw[..., :2] / uvw[..., 2:]
    return torch.clamp(2 * (xy - 0.5), -1, 1)


def sample_planes(planes, coords):
    # planes: (N, C, H, W), coords: (N, M, 2) in [-1, 1]
    out = torch.nn.functional.grid_sample(
        planes, coords.unsqueeze(1), mode="bilinear",
        padding_mode="zeros", align_corners=True,
    )  # (N, C, 1, M)
    return out.squeeze(2).permute(0, 2, 1)  # (N, M, C)


class TorchGTSliceRef(nn.Module):
    """Torch twin of the GT-slices-to-3D model for numeric parity tests.

    State-dict naming matches the reference checkpoints so
    torch_import.gtslice_model() applies directly.
    """

    def __init__(self, n_slices=12):
        super().__init__()
        self.n_slices = n_slices
        self.img_encoder = TorchRefVGGEncoder()
        layer = nn.TransformerEncoderLayer(d_model=128, nhead=4, batch_first=True)
        self.att_decoder = nn.TransformerEncoder(layer, num_layers=3)
        self.fc_out = nn.Sequential(nn.Linear(128, 1))
        self.pts_feat_extractor = nn.Sequential(
            nn.Linear(3, 32), nn.ReLU(), nn.Linear(32, 64), nn.ReLU(),
            nn.Linear(64, 128), nn.ReLU(),
        )
        self.fc_local = nn.Sequential(
            nn.Linear(1472, 128), nn.ReLU(), nn.Linear(128, 128), nn.ReLU(),
        )

    def forward(self, img_slices, qry_rot, trans_mat_tp):
        # img_slices: (B, S, 3, H, W); qry_rot: (B, M, 3) camera-aligned
        b, s = img_slices.shape[:2]
        m = qry_rot.shape[1]
        flat = img_slices.reshape(b * s, *img_slices.shape[2:])
        taps = self.img_encoder(flat)

        uv = project_coord(qry_rot, trans_mat_tp)
        uv = uv.unsqueeze(1).expand(-1, s, -1, -1).reshape(b * s, m, 2)
        local = torch.cat([sample_planes(t, uv) for t in taps], dim=2)
        local = local.view(b, s, m, 1472).permute(0, 2, 1, 3)  # (B, M, S, C)

        feat_q = self.pts_feat_extractor(qry_rot)  # (B, M, 128)
        feat_s = self.fc_local(local)  # (B, M, S, 128)
        tokens = torch.cat([feat_q.unsqueeze(2), feat_s], dim=2)
        tokens = tokens.reshape(b * m, s + 1, 128)
        out = self.att_decoder(tokens)[:, 0, :]
        return self.fc_out(out).view(b, m)


def randomize_bn_stats(module, seed=0):
    """Give BN layers non-trivial running stats so parity tests catch
    mean/var mix-ups (fresh BN stats are 0/1 which would hide bugs)."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return module
