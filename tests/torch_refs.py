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


# ---------------------------------------------------------------------------
# Compact torch twin of the CompVis kl-f8 VAE (state-dict compatible with
# the reference AutoencoderKL) for converter/numeric parity tests.


class TRes(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.has_short = cin != cout
        if self.has_short:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = torch.nn.functional.silu(self.norm1(x))
        h = self.conv1(h)
        h = torch.nn.functional.silu(self.norm2(h))
        h = self.conv2(h)
        if self.has_short:
            x = self.nin_shortcut(x)
        return x + h


class TAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        hn = self.norm(x)
        q = self.q(hn).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(hn).reshape(b, c, h * w)
        v = self.v(hn).reshape(b, c, h * w)
        att = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)
        out = torch.bmm(v, att.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(out)


class _Holder(nn.Module):
    pass


class TVAEEncoder(nn.Module):
    def __init__(self, ch=32, ch_mult=(1, 2), nres=1, z=4):
        super().__init__()
        self.conv_in = nn.Conv2d(3, ch, 3, padding=1)
        self.down = nn.ModuleList()
        cin = ch
        for i, m in enumerate(ch_mult):
            lvl = _Holder()
            lvl.block = nn.ModuleList()
            for _ in range(nres):
                lvl.block.append(TRes(cin, ch * m))
                cin = ch * m
            if i + 1 < len(ch_mult):
                lvl.downsample = _Holder()
                lvl.downsample.conv = nn.Conv2d(cin, cin, 3, stride=2)
            self.down.append(lvl)
        self.mid = _Holder()
        self.mid.block_1 = TRes(cin, cin)
        self.mid.attn_1 = TAttn(cin)
        self.mid.block_2 = TRes(cin, cin)
        self.norm_out = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv_out = nn.Conv2d(cin, 2 * z, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for i, lvl in enumerate(self.down):
            for blk in lvl.block:
                h = blk(h)
            if hasattr(lvl, "downsample"):
                h = torch.nn.functional.pad(h, (0, 1, 0, 1))
                h = lvl.downsample.conv(h)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        h = torch.nn.functional.silu(self.norm_out(h))
        return self.conv_out(h)


class TVAEDecoder(nn.Module):
    def __init__(self, ch=32, ch_mult=(1, 2), nres=1, z=4):
        super().__init__()
        cin = ch * ch_mult[-1]
        self.conv_in = nn.Conv2d(z, cin, 3, padding=1)
        self.mid = _Holder()
        self.mid.block_1 = TRes(cin, cin)
        self.mid.attn_1 = TAttn(cin)
        self.mid.block_2 = TRes(cin, cin)
        self.up = nn.ModuleList([_Holder() for _ in ch_mult])
        for i in reversed(range(len(ch_mult))):
            lvl = self.up[i]
            lvl.block = nn.ModuleList()
            cout = ch * ch_mult[i]
            for _ in range(nres + 1):
                lvl.block.append(TRes(cin, cout))
                cin = cout
            if i > 0:
                lvl.upsample = _Holder()
                lvl.upsample.conv = nn.Conv2d(cout, cout, 3, padding=1)
        self.norm_out = nn.GroupNorm(32, ch * ch_mult[0], eps=1e-6)
        self.conv_out = nn.Conv2d(ch * ch_mult[0], 3, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for i in reversed(range(len(self.up))):
            lvl = self.up[i]
            for blk in lvl.block:
                h = blk(h)
            if hasattr(lvl, "upsample"):
                h = torch.nn.functional.interpolate(h, scale_factor=2, mode="nearest")
                h = lvl.upsample.conv(h)
        h = torch.nn.functional.silu(self.norm_out(h))
        return self.conv_out(h)


class TVAE(nn.Module):
    def __init__(self, ch=32, ch_mult=(1, 2), nres=1, z=4):
        super().__init__()
        self.encoder = TVAEEncoder(ch, ch_mult, nres, z)
        self.decoder = TVAEDecoder(ch, ch_mult, nres, z)
        self.quant_conv = nn.Conv2d(2 * z, 2 * z, 1)
        self.post_quant_conv = nn.Conv2d(z, z, 1)


# ---------------------------------------------------------------------------
# Compact torch twin of the ADM UNet (state-dict compatible with the
# reference openaimodel.UNetModel) for converter parity tests.


import math as _math


def t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-_math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TADMRes(nn.Module):
    """ADM ResBlock: scale-shift norm, optional up/down, zero-init out conv."""

    def __init__(self, cin, cout, emb_dim, updown=0):
        super().__init__()
        self.updown = updown
        self.in_layers = nn.Sequential(
            nn.GroupNorm(32, cin), nn.SiLU(), nn.Conv2d(cin, cout, 3, padding=1)
        )
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb_dim, 2 * cout))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(32, cout), nn.SiLU(), nn.Identity(),
            nn.Conv2d(cout, cout, 3, padding=1),
        )
        self.has_skip = cin != cout
        if self.has_skip:
            self.skip_connection = nn.Conv2d(cin, cout, 1)

    def forward(self, x, emb):
        h = self.in_layers[1](self.in_layers[0](x))
        if self.updown == -1:
            h = torch.nn.functional.avg_pool2d(h, 2)
            x = torch.nn.functional.avg_pool2d(x, 2)
        elif self.updown == 1:
            h = torch.nn.functional.interpolate(h, scale_factor=2, mode="nearest")
            x = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest")
        h = self.in_layers[2](h)
        eo = self.emb_layers(emb)[:, :, None, None]
        scale, shift = eo.chunk(2, dim=1)
        h = self.out_layers[0](h) * (1 + scale) + shift
        h = self.out_layers[3](self.out_layers[1](h))
        if self.has_skip:
            x = self.skip_connection(x)
        return x + h


class TADMAttn(nn.Module):
    """Legacy qkv attention: heads-major channel interleave."""

    def __init__(self, ch, n_heads):
        super().__init__()
        self.n_heads = n_heads
        self.norm = nn.GroupNorm(32, ch)
        self.qkv = nn.Conv1d(ch, 3 * ch, 1)
        self.proj_out = nn.Conv1d(ch, ch, 1)

    def forward(self, x):
        b, c, hh, ww = x.shape
        t = hh * ww
        qkv = self.qkv(self.norm(x).reshape(b, c, t))
        ch = c // self.n_heads
        q, k, v = qkv.reshape(b * self.n_heads, 3 * ch, t).split(ch, dim=1)
        scale = 1.0 / _math.sqrt(_math.sqrt(ch))
        w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        w = torch.softmax(w, dim=-1)
        a = torch.einsum("bts,bcs->bct", w, v).reshape(b, c, t)
        return x + self.proj_out(a).reshape(b, c, hh, ww)


class TADMUNet(nn.Module):
    def __init__(self, in_ch=8, out_ch=4, mc=32, mult=(1, 2), nres=1,
                 attn_ds=(1, 2), n_heads=4):
        super().__init__()
        self.mc = mc
        emb = 4 * mc
        self.time_embed = nn.Sequential(
            nn.Linear(mc, emb), nn.SiLU(), nn.Linear(emb, emb)
        )
        self.input_blocks = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(in_ch, mc, 3, padding=1))]
        )
        self._in_meta = []  # mirror structure for forward
        ch = mc
        ds = 1
        chans = [mc]
        for level, m in enumerate(mult):
            co = mc * m
            for _ in range(nres):
                layers = [TADMRes(ch, co, emb)]
                if ds in attn_ds:
                    layers.append(TADMAttn(co, n_heads))
                self.input_blocks.append(nn.Sequential(*layers))
                ch = co
                chans.append(ch)
            if level + 1 < len(mult):
                self.input_blocks.append(nn.Sequential(TADMRes(ch, co, emb, updown=-1)))
                ds *= 2
                chans.append(ch)
        self.middle_block = nn.Sequential(
            TADMRes(ch, ch, emb), TADMAttn(ch, n_heads), TADMRes(ch, ch, emb)
        )
        self.output_blocks = nn.ModuleList()
        for level in reversed(range(len(mult))):
            co = mc * mult[level]
            for i in range(nres + 1):
                layers = [TADMRes(ch + chans.pop(), co, emb)]
                ch = co
                if ds in attn_ds:
                    layers.append(TADMAttn(co, n_heads))
                if level > 0 and i == nres:
                    layers.append(TADMRes(co, co, emb, updown=1))
                    ds //= 2
                self.output_blocks.append(nn.Sequential(*layers))
        self.out = nn.Sequential(
            nn.GroupNorm(32, mc * mult[0]), nn.SiLU(),
            nn.Conv2d(mc * mult[0], out_ch, 3, padding=1),
        )

    def forward(self, x, t):
        emb = self.time_embed(t_timestep_embedding(t, self.mc))
        hs = []
        h = x
        for block in self.input_blocks:
            for layer in block:
                h = layer(h, emb) if isinstance(layer, TADMRes) else layer(h)
            hs.append(h)
        for layer in self.middle_block:
            h = layer(h, emb) if isinstance(layer, TADMRes) else layer(h)
        for block in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            for layer in block:
                h = layer(h, emb) if isinstance(layer, TADMRes) else layer(h)
        return self.out(h)


def randomize_bn_stats(module, seed=0):
    """Give BN layers non-trivial running stats so parity tests catch
    mean/var mix-ups (fresh BN stats are 0/1 which would hide bugs)."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return module


# ---------------------------------------------------------------------------
# Torch twin of the full SliceNet regression model (reference
# reg_slices/src/models.py:12-94 + src/unet_custom.py:4-69 +
# src/unet_parts.py:8-84), state-dict compatible with
# torch_import.slicenet_model.  The VGG perceptual loss term is omitted
# (covered by its own parity test).


class TDoubleConvU(nn.Module):
    """unet_parts.DoubleConv: (conv3x3 no-bias -> BN -> ReLU) x 2."""

    def __init__(self, cin, cout):
        super().__init__()
        self.double_conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.double_conv(x)


class TUpU(nn.Module):
    """unet_parts.Up with bilinear=False."""

    def __init__(self, cin, cout):
        super().__init__()
        self.up = nn.ConvTranspose2d(cin, cin // 2, kernel_size=2, stride=2)
        self.conv = TDoubleConvU(cin, cout)

    def forward(self, x1, x2):
        x1 = self.up(x1)
        return self.conv(torch.cat([x2, x1], dim=1))


class TOutConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel_size=1)
        self.act = nn.Tanh()

    def forward(self, x):
        return self.act(self.conv(x))


class TorchSliceUNetRef(nn.Module):
    """unet_custom.UNet twin (reference key naming under slices_generator)."""

    def __init__(self, n_slices=12, dim_embed=128):
        super().__init__()
        self.n_slices = n_slices
        self.dim_embed = dim_embed
        feats = vgg16_bn_features()
        self.down1 = feats[:4]
        self.down2 = feats[4:11]
        self.down3 = feats[11:21]
        self.down4 = feats[21:31]
        self.down5 = feats[31:41]
        self.down5_ = feats[41:44]
        self.trans_c = nn.Conv2d(512 + dim_embed, 512, 1)
        self.up1 = TUpU(512, 256)
        self.trans_up1 = nn.Conv2d(512, 256, 1)
        self.up2 = TUpU(256, 128)
        self.trans_up2 = nn.Conv2d(256, 128, 1)
        self.up3 = TUpU(128, 64)
        self.trans_up3 = nn.Conv2d(128, 64, 1)
        self.up4 = TUpU(64, 32)
        self.trans_up4 = nn.Conv2d(64, 32, 1)
        self.outc = TOutConv(32, 3)
        self.emds = nn.Embedding(n_slices, dim_embed)

    def expand_bs(self, x):
        b, c, h, w = x.shape
        return (x.view(b, 1, c, h, w).expand(-1, self.n_slices, -1, -1, -1)
                .reshape(b * self.n_slices, c, h, w))

    def forward(self, x):
        x1 = self.down1(x)
        x2 = self.down2(x1.clone())
        x3 = self.down3(x2.clone())
        x4 = self.down4(x3.clone())
        x5 = self.down5(x4.clone())
        _ = self.down5_(x5.clone())  # computed in the reference, unused

        b, _, h5, w5 = x5.shape
        embs = (self.emds.weight.view(1, self.n_slices, self.dim_embed, 1, 1)
                .expand(b, -1, -1, h5, w5)
                .reshape(b * self.n_slices, self.dim_embed, h5, w5))
        latent = self.trans_c(torch.cat([self.expand_bs(x5), embs], 1))
        feats = [latent]
        h = self.up1(latent, self.trans_up1(self.expand_bs(x4)))
        feats.append(h)
        h = self.up2(h, self.trans_up2(self.expand_bs(x3)))
        feats.append(h)
        h = self.up3(h, self.trans_up3(self.expand_bs(x2)))
        feats.append(h)
        h = self.up4(h, self.trans_up4(self.expand_bs(x1)))
        feats.append(h)
        return feats, self.outc(h)


class TorchSliceNetRef(nn.Module):
    """Slices3DRegModel twin: returns (sdf (B, M), slices (B*S, 3, H, W))."""

    def __init__(self, n_slices=12):
        super().__init__()
        self.n_slices = n_slices
        self.slices_generator = TorchSliceUNetRef(n_slices)
        layer = nn.TransformerEncoderLayer(d_model=128, nhead=4, batch_first=True)
        self.att_decoder = nn.TransformerEncoder(layer, num_layers=3)
        self.fc_p = nn.Linear(3, 128)
        self.fc_s = nn.Linear(992, 128)
        self.fc_out = nn.Sequential(nn.Linear(128, 1))

    def forward(self, img_input, qry_rot, trans_mat_tp):
        b = img_input.shape[0]
        m = qry_rot.shape[1]
        s = self.n_slices
        feats, slices_rec = self.slices_generator(img_input)

        uv = project_coord(qry_rot, trans_mat_tp)
        uv = uv.view(b, 1, m, 2).expand(-1, s, -1, -1).reshape(b * s, m, 2)
        local = torch.cat([sample_planes(f, uv) for f in feats], dim=2)
        local = (local.view(b, s, m, 992).permute(0, 2, 1, 3)
                 .reshape(b * m, s, 992))

        feat_q = self.fc_p(qry_rot).view(b * m, 1, 128)
        tokens = torch.cat([feat_q, self.fc_s(local)], dim=1)
        out = self.att_decoder(tokens).view(b, m, s + 1, 128)[:, :, 0, :]
        return self.fc_out(out).squeeze(-1), slices_rec


# ---------------------------------------------------------------------------
# Torch twin of the taming/richzhang LPIPS (vgg variant), state-dict
# compatible with torch_import.lpips_model.


class TLPIPSVGG16(nn.Module):
    """vgg16 slice wrapper keeping torchvision feature indices."""

    def __init__(self):
        super().__init__()
        feats = make_features(VGG16_CFG, batch_norm=False)
        bounds = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
        for k, (a, b) in enumerate(bounds):
            sl = nn.Sequential()
            for i in range(a, b):
                sl.add_module(str(i), feats[i])
            setattr(self, f"slice{k + 1}", sl)

    def forward(self, x):
        outs = []
        for k in range(5):
            x = getattr(self, f"slice{k + 1}")(x)
            outs.append(x.clone())
        return outs


class TNetLin(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.model = nn.Sequential(nn.Dropout(), nn.Conv2d(cin, 1, 1, bias=False))


class TLPIPS(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None])
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450])[None, :, None, None])
        self.net = TLPIPSVGG16()
        for k, c in enumerate([64, 128, 256, 512, 512]):
            setattr(self, f"lin{k}", TNetLin(c))

    @staticmethod
    def _normalize(t, eps=1e-10):
        n = torch.sqrt(torch.sum(t * t, dim=1, keepdim=True))
        return t / (n + eps)

    def forward(self, x, y):
        x = (x - self.shift) / self.scale
        y = (y - self.shift) / self.scale
        tx, ty = self.net(x), self.net(y)
        val = 0
        for k in range(5):
            d = (self._normalize(tx[k]) - self._normalize(ty[k])) ** 2
            val = val + getattr(self, f"lin{k}").model(d).mean(dim=(2, 3), keepdim=True)
        return val  # (B, 1, 1, 1)
