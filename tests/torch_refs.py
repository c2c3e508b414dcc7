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
    """Multi-kernel conv-bank spectra classifier (reference architecture)."""

    def __init__(self, channels, depths, kernels, num_classes, head_hidden=384):
        super().__init__()
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
        return self.classifier(x)


def state_dict_numpy(model: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}
