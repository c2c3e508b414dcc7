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


def state_dict_numpy(model: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}
