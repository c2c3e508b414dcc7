"""Torch reference modules for parity testing.

These are *independent* torch implementations of the reference
architectures (built from torch built-ins following the published
behavioral contract), used as numeric oracles. They are not imports or
copies of the reference repo's code.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchTime2Vec(nn.Module):
    def __init__(self, d_model):
        super().__init__()
        self.w0 = nn.Parameter(torch.randn(1))
        self.b0 = nn.Parameter(torch.zeros(1))
        self.w = nn.Parameter(torch.randn(d_model - 1))
        self.b = nn.Parameter(torch.zeros(d_model - 1))

    def forward(self, t):
        v0 = (self.w0 * t + self.b0).unsqueeze(-1)
        vp = torch.sin(t.unsqueeze(-1) * self.w + self.b)
        return torch.cat([v0, vp], dim=-1)


class TorchBaselineCLS(nn.Module):
    """Photometry transformer: in_proj + Time2Vec + CLS + post-LN encoder."""

    def __init__(self, d_model=128, n_heads=8, n_layers=4, num_classes=5, dropout=0.4,
                 classification=True):
        super().__init__()
        self.in_proj = nn.Linear(7, d_model)
        self.cls_tok = nn.Parameter(torch.zeros(1, 1, d_model))
        self.time2vec = TorchTime2Vec(d_model)
        layer = nn.TransformerEncoderLayer(d_model, n_heads, d_model * 4, dropout, batch_first=True)
        self.encoder = nn.TransformerEncoder(layer, n_layers)
        self.norm = nn.LayerNorm(d_model)
        self.classification = classification
        if classification:
            self.fc = nn.Linear(d_model, num_classes)

    def encode(self, x, pad_mask):
        B = x.shape[0]
        h = self.in_proj(x) + self.time2vec(x[..., 0])
        h = torch.cat([self.cls_tok.expand(B, -1, -1), h], dim=1)
        pad = F.pad(pad_mask, (1, 0), value=False)
        return self.encoder(h, src_key_padding_mask=pad)

    def forward(self, x, pad_mask):
        z = self.encode(x, pad_mask)
        out = self.norm(z[:, 0])
        return self.fc(out) if self.classification else out


class TorchMPT(nn.Module):
    """Masked-event pretrainer sharing the BaselineCLS trunk."""

    def __init__(self, d_model=128, n_heads=8, n_layers=4, dropout=0.4):
        super().__init__()
        self.in_proj = nn.Linear(7, d_model)
        self.cls_tok = nn.Parameter(torch.zeros(1, 1, d_model))
        self.time2vec = TorchTime2Vec(d_model)
        layer = nn.TransformerEncoderLayer(d_model, n_heads, d_model * 4, dropout, batch_first=True)
        self.encoder = nn.TransformerEncoder(layer, n_layers)
        self.head_flux = nn.Linear(d_model, 1)
        self.head_band = nn.Linear(d_model, 3)
        self.head_dt = nn.Linear(d_model, 1)

    def forward(self, x, pad_mask):
        B = x.shape[0]
        h = self.in_proj(x) + self.time2vec(x[..., 0])  # te dropout off in eval
        h = torch.cat([self.cls_tok.expand(B, -1, -1), h], dim=1)
        pad = F.pad(pad_mask, (1, 0), value=False)
        z = self.encoder(h, src_key_padding_mask=pad)[:, 1:]
        return self.head_flux(z), self.head_band(z), self.head_dt(z)


class TorchSpectraBlock(nn.Module):
    def __init__(self, in_c, out_c, kernel_sizes, do_pool):
        super().__init__()
        self.do_pool = do_pool
        self.convs = nn.ModuleList(
            [nn.Conv1d(in_c, out_c, kernel_size=k, padding=k // 2) for k in kernel_sizes]
        )
        self.norm = nn.LayerNorm(out_c * len(kernel_sizes))
        if do_pool:
            self.downsample = nn.Conv1d(out_c * len(kernel_sizes), out_c, kernel_size=1)
            self.pool = nn.MaxPool1d(4)

    def forward(self, x):  # x: (B, C, L)
        x = torch.cat([c(x) for c in self.convs], dim=1)
        x = self.norm(x.permute(0, 2, 1)).permute(0, 2, 1)
        x = F.gelu(x)
        if self.do_pool:
            x = self.pool(self.downsample(x))
        return x


class TorchSpectraNet(nn.Module):
    """Multi-kernel conv-bank spectra classifier (reference architecture).

    ``embedding=True`` stops after the head's GELU (fusion-mode hidden).
    """

    def __init__(self, channels, depths, kernels, num_classes, head_hidden=384,
                 embedding=False):
        super().__init__()
        self.embedding = embedding
        stages = []
        n = len(channels)
        for s in range(n):
            blocks = nn.ModuleList()
            for d in range(depths[s]):
                in_c = (channels[s - 1] if s > 0 else 1) if d == 0 else channels[s] * len(kernels[s])
                blocks.append(
                    TorchSpectraBlock(in_c, channels[s], kernels[s],
                                      do_pool=(s < n - 1) and d == depths[s] - 1)
                )
            stages.append(blocks)
        self.stages = nn.ModuleList(stages)
        flat = channels[-1] * len(kernels[-1])
        self.classifier = nn.Sequential(
            nn.Linear(flat, head_hidden),
            nn.LayerNorm(head_hidden),
            nn.GELU(),
            nn.Dropout(0.5),
            nn.Linear(head_hidden, num_classes),
        )

    def forward(self, x):  # x: (B, L)
        x = x.unsqueeze(1)
        for blocks in self.stages:
            for b in blocks:
                x = b(x)
        x = F.adaptive_max_pool1d(x, 1).squeeze(-1)
        if self.embedding:
            return self.classifier[2](self.classifier[1](self.classifier[0](x)))
        return self.classifier(x)


class TorchAppleCider(nn.Module):
    """Full 4-modality fusion oracle: encoders -> proj -> L2 -> avg/concat -> fc."""

    def __init__(self, photometry, spectra, img_meta, spectra_hidden, hidden_dim=5,
                 fusion="avg", num_classes=5):
        super().__init__()
        self.photometry_encoder = photometry
        self.spectra_encoder = spectra
        self.img_meta_encoder = img_meta
        d_model = photometry.in_proj.out_features
        self.photometry_proj = nn.Linear(d_model, hidden_dim)
        self.spectra_proj = nn.Linear(spectra_hidden, hidden_dim)
        self.img_metadata_proj = nn.Linear(img_meta.moe_out, hidden_dim)
        self.fusion = fusion
        in_features = hidden_dim * 3 if fusion == "concat" else hidden_dim
        self.fc = nn.Linear(in_features, num_classes)

    def forward(self, photometry, photo_mask, metadata, images, spectra):
        p = self.photometry_proj(self.photometry_encoder(photometry, photo_mask))
        s = self.spectra_proj(self.spectra_encoder(spectra))
        im = self.img_metadata_proj(self.img_meta_encoder(metadata, images))
        p = p / p.norm(dim=-1, keepdim=True)
        s = s / s.norm(dim=-1, keepdim=True)
        im = im / im.norm(dim=-1, keepdim=True)
        if self.fusion == "concat":
            emb = torch.cat([p, im, s], dim=1)
        else:
            emb = (p + im + s) / 3.0
        return self.fc(emb)


class TorchConvNeXtBlock(nn.Module):
    def __init__(self, dim, ls_init=1e-6):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, kernel_size=7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(ls_init * torch.ones(dim))

    def forward(self, x):  # NCHW
        inp = x
        x = self.dwconv(x).permute(0, 2, 3, 1)  # NHWC
        x = self.norm(x)
        x = self.pwconv2(F.gelu(self.pwconv1(x)))
        x = (self.gamma * x).permute(0, 3, 1, 2)
        return inp + x


class TorchConvNeXt(nn.Module):
    """ConvNeXt feature extractor oracle (published architecture)."""

    def __init__(self, depths=(2, 2), dims=(16, 32), in_chans=3):
        super().__init__()
        self.stem_conv = nn.Conv2d(in_chans, dims[0], kernel_size=4, stride=4)
        self.stem_norm = nn.LayerNorm(dims[0], eps=1e-6)
        self.stages = nn.ModuleList()
        self.downsamples = nn.ModuleList()
        for s in range(len(depths)):
            if s > 0:
                self.downsamples.append(
                    nn.ModuleDict(
                        {
                            "norm": nn.LayerNorm(dims[s - 1], eps=1e-6),
                            "conv": nn.Conv2d(dims[s - 1], dims[s], kernel_size=2, stride=2),
                        }
                    )
                )
            self.stages.append(nn.ModuleList([TorchConvNeXtBlock(dims[s]) for _ in range(depths[s])]))
        self.head_norm = nn.LayerNorm(dims[-1], eps=1e-6)

    def forward(self, x):  # NCHW in
        x = self.stem_conv(x)
        x = self.stem_norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for s, blocks in enumerate(self.stages):
            if s > 0:
                ds = self.downsamples[s - 1]
                x = ds["norm"](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = ds["conv"](x)
            for b in blocks:
                x = b(x)
        x = x.mean(dim=(2, 3))
        return self.head_norm(x)


class TorchResidualTower(nn.Module):
    """Gated-residual MLP tower (reference ResidualTowerBlock semantics)."""

    def __init__(self, in_dim, hidden, out_dim, dropout=0.25):
        super().__init__()
        self.start = nn.Linear(in_dim, hidden)
        self.gate_norm = nn.LayerNorm(hidden)
        self.gate_fc = nn.Linear(hidden, out_dim)
        self.main_norm = nn.LayerNorm(hidden)
        self.main_fc = nn.Linear(hidden, out_dim)
        self.drop = nn.Dropout(dropout)
        self.skip = nn.Linear(in_dim, out_dim) if in_dim != out_dim else nn.Identity()

    def forward(self, x):
        h = F.gelu(self.start(x))
        g = torch.sigmoid(self.gate_fc(self.drop(self.gate_norm(h))))
        m = self.main_fc(self.drop(self.main_norm(h)))
        return m * g + self.skip(x)


class TorchSplitHeadImageTower(nn.Module):
    def __init__(self, outdims, depths=(1, 1), dims=(8, 16)):
        super().__init__()
        self.backbone = TorchConvNeXt(depths=depths, dims=dims, in_chans=3)
        f = dims[-1]
        self.main_norm = nn.LayerNorm(f)
        self.main_fc1 = nn.Linear(f, f // 2)
        self.main_fc2 = nn.Linear(f // 2, f)
        self.main_fc3 = nn.Linear(f, outdims)
        self.aux_norm = nn.LayerNorm(f)
        self.aux_fc = nn.Linear(f, outdims)
        self.drop = nn.Dropout(0.4)

    def forward(self, x):
        feats = self.backbone(x)
        m = self.main_norm(F.gelu(feats))
        m = self.main_fc3(self.main_fc2(self.drop(F.relu(self.main_fc1(m)))))
        a = torch.tanh(self.aux_fc(self.aux_norm(feats)))
        return m * a


class TorchAstroMiNN(nn.Module):
    """Image+metadata MoE oracle with the masked-loop top-2 dispatch."""

    SLICES = {
        "nst1_tower": [0, 2],
        "nst2_tower": [1, 3],
        "spatial_tower": [2, 3, 4],
        "psf_tower": [5, 14],
        "mag_tower": [6, 9, 10, 13, 15, 17, 18],
        "coord_tower": [7, 8],
        "mega_tower": list(range(19)),
        "lc_tower": [6, 9, 10, 13, 15, 17, 18, 19, 20, 21, 22, 23],
    }

    def __init__(self, th=16, to=32, fo=32, fusion_hidden=128, num_experts=4,
                 moe_out=5, backbone_dims=(8, 16), backbone_depths=(1, 1)):
        super().__init__()
        S = self.SLICES
        self.nst1_tower = TorchResidualTower(len(S["nst1_tower"]), th, fo)
        self.nst2_tower = TorchResidualTower(len(S["nst2_tower"]), th, fo)
        self.spatial_tower = TorchResidualTower(len(S["spatial_tower"]), th, to)
        self.psf_tower = TorchResidualTower(len(S["psf_tower"]), th, to)
        self.mag_tower = TorchResidualTower(len(S["mag_tower"]), th * 2, to)
        self.coord_tower = TorchResidualTower(len(S["coord_tower"]), th, fo)
        self.mega_tower = TorchResidualTower(len(S["mega_tower"]), 128, to)
        self.lc_tower = TorchResidualTower(len(S["lc_tower"]), th * 3, to)
        self.image_tower = TorchSplitHeadImageTower(to, depths=backbone_depths, dims=backbone_dims)
        fusion_dims = 6 * to + 3 * fo
        self.router_fc1 = nn.Linear(fusion_dims, fusion_dims // 2)
        self.router_fc2 = nn.Linear(fusion_dims // 2, num_experts)
        self.router_drop = nn.Dropout(0.3)
        self.experts = nn.ModuleList(
            [TorchResidualTower(fusion_dims, fusion_hidden, moe_out) for _ in range(num_experts)]
        )
        self.moe_out = moe_out

    def forward(self, metadata, image):
        S = self.SLICES
        feats = torch.cat(
            [
                self.nst1_tower(metadata[:, S["nst1_tower"]]),
                self.nst2_tower(metadata[:, S["nst2_tower"]]),
                self.spatial_tower(metadata[:, S["spatial_tower"]]),
                self.psf_tower(metadata[:, S["psf_tower"]]),
                self.mag_tower(metadata[:, S["mag_tower"]]),
                self.coord_tower(metadata[:, S["coord_tower"]]),
                self.mega_tower(metadata[:, S["mega_tower"]]),
                self.image_tower(image),
                self.lc_tower(metadata[:, S["lc_tower"]]),
            ],
            dim=1,
        )
        w = torch.sigmoid(self.router_fc2(self.router_drop(torch.tanh(self.router_fc1(feats)))))
        out = torch.zeros(metadata.shape[0], self.moe_out)
        topk_w, topk_i = torch.topk(w, k=2, dim=-1)
        for e_idx, expert in enumerate(self.experts):
            mask = (topk_i == e_idx).any(dim=-1)
            if mask.any():
                weights = topk_w[mask, (topk_i[mask] == e_idx).nonzero()[:, 1]]
                out[mask] += weights.unsqueeze(-1) * expert(feats[mask])
        return out


def state_dict_numpy(model: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}
