"""Generate timm-ConvNeXt golden files for the offline parity chain.

The AstroMiNN/fusion parity tests stub ``timm.create_model`` with the
repo's own TorchConvNeXt oracle (this image has no timm); the oracle <->
flax link is fully tested, but the timm <-> oracle link cannot be. This
script closes it: run it **on any machine that has timm** (reference dep,
``/root/reference/src/applecider/models/astrominn.py`` imports it), then
drop the produced .npz files into ``tests/goldens/`` — the
``tests/test_timm_goldens.py`` hook picks them up automatically.

    python scripts/make_timm_goldens.py [--pretrained] [--out tests/goldens]

Generation self-verifies: the timm state_dict is renamed to the oracle's
key layout and loaded strictly into TorchConvNeXt, and the oracle's output
must match timm's to 1e-4 *before* anything is written — a wrong rename
map cannot produce a bogus golden.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tests"))

from torch_refs import TorchConvNeXt  # noqa: E402

DEPTHS, DIMS = (3, 3, 9, 3), (96, 192, 384, 768)


def rename_timm_convnext_sd(sd: dict) -> dict:
    """timm convnext_tiny state_dict keys -> tests/torch_refs.TorchConvNeXt.

    timm layout: ``stem.0/1``, ``stages.S.blocks.B.{conv_dw,norm,mlp.fc1,
    mlp.fc2,gamma}``, ``stages.S.downsample.{0,1}`` (norm, conv), ``head.norm``.
    Oracle layout: ``stem_conv/stem_norm``, ``stages.S.B.{dwconv,norm,
    pwconv1,pwconv2,gamma}``, ``downsamples.{S-1}.{norm,conv}``, ``head_norm``.
    """
    out = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("stem.0.", "stem_conv.").replace("stem.1.", "stem_norm.")
        m = re.match(r"stages\.(\d+)\.downsample\.(\d+)\.(.*)", nk)
        if m:
            s, i, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            nk = f"downsamples.{s - 1}.{'norm' if i == 0 else 'conv'}.{rest}"
        nk = re.sub(r"stages\.(\d+)\.blocks\.(\d+)\.", r"stages.\1.\2.", nk)
        nk = nk.replace(".conv_dw.", ".dwconv.")
        nk = nk.replace(".mlp.fc1.", ".pwconv1.").replace(".mlp.fc2.", ".pwconv2.")
        nk = nk.replace("head.norm.", "head_norm.").replace("norm_pre.", "head_norm.")
        if nk.startswith("head."):
            continue  # fc is Identity at num_classes=0; drop any leftovers
        out[nk] = v
    return out


def make_golden(in_chans: int, pretrained: bool, seed: int = 0) -> dict:
    import timm

    torch.manual_seed(seed)
    model = timm.create_model(
        "convnext_tiny", pretrained=pretrained, in_chans=in_chans, num_classes=0
    )
    model.eval()
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, in_chans, 63, 63)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    renamed = rename_timm_convnext_sd(sd)

    oracle = TorchConvNeXt(depths=DEPTHS, dims=DIMS, in_chans=in_chans)
    oracle.load_state_dict({k: torch.tensor(v) for k, v in renamed.items()}, strict=True)
    oracle.eval()
    with torch.no_grad():
        got = oracle(torch.tensor(x)).numpy()
    diff = float(np.max(np.abs(got - want)))
    assert diff < 1e-4, f"oracle does not reproduce timm: max |delta| = {diff:.2e}"
    print(f"in_chans={in_chans}: oracle == timm at {diff:.2e}")

    payload = {"input": x, "output": want}
    payload.update({f"sd:{k}": v for k, v in renamed.items()})
    return payload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", action="store_true",
                    help="use pretrained timm weights (downloads)")
    ap.add_argument("--out", default=str(REPO / "tests" / "goldens"))
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for in_chans in (3, 4):  # AstroMiNN uses 3, XastroMiNN uses 4
        payload = make_golden(in_chans, args.pretrained)
        path = out / f"convnext_tiny_in{in_chans}.npz"
        np.savez_compressed(path, **payload)
        print(f"wrote {path} ({path.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
