"""Import a reference (PyTorch) checkpoint into this framework.

Migration path for users switching from skyportal/applecider: load a
``torch.save``'d state_dict of any reference model family, convert it with
``applecider_tpu.utils.torch_port`` (auto-detecting the real reference
Sequential-index layouts and renaming them to the canonical layout), shape-
check against a freshly-initialized flax tree from the given config, and
write an orbax checkpoint the Trainer/runtime can restore.

    python -m applecider_tpu.utils.import_checkpoint \
        --model SpectraNet --ckpt ref_spectranet.pt --out /runs/imported \
        [--config overrides.toml]

Supported models: BaselineCLS, MPT, SpectraNet, SpectraNetTriPool, AstroMiNN.
(The 4-modality fusion model is composed of these; see
``torch_port.fusion_params`` for whole-fusion state_dicts.)
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from applecider_tpu.config import load_config
from applecider_tpu.utils import torch_port


def _load_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def convert(sd: dict, model: str, config) -> tuple[dict, dict]:
    """state_dict -> (flax params, extra collections e.g. batch_stats)."""
    keys = set(sd)
    if model == "BaselineCLS":
        n_layers = int(config["model"]["BaselineCLS"]["n_layers"])
        return torch_port.baseline_cls_params(sd, n_layers), {}
    if model == "MPT":
        n_layers = int(config["model"]["BaselineCLS"]["n_layers"])
        return torch_port.mpt_params(sd, n_layers), {}
    if model == "SpectraNet":
        mc = config["model"]["SpectraNet"]
        if any(k.startswith("stage1.") for k in keys):  # real reference layout
            sd = torch_port.rename_reference_spectranet_sd(sd)
        return torch_port.spectranet_params(
            sd, list(mc["depths"]), [len(k) for k in mc["kernel_sizes_per_stage"]]
        ), {}
    if model == "SpectraNetTriPool":
        mc = dict(config["model"].get("SpectraNetTriPool", {}))
        depths = list(mc.get("depths", [1] * 5))
        # derive the norm layout from the checkpoint itself: BN stages carry
        # running_mean keys (config defaults could silently disagree)
        use_ln = [
            f"stage{s + 1}.0.norm.running_mean" not in sd for s in range(len(depths))
        ]
        params, stats = torch_port.spectranet_tripool_params(sd, depths, use_ln)
        return params, ({"batch_stats": stats} if stats else {})
    if model == "AstroMiNN":
        if any(k.startswith("fusion_experts.") for k in keys):  # real layout
            sd = torch_port.rename_reference_astrominn_sd(sd)
        mc = config["model"]["AstroMiNN"]
        return torch_port.astrominn_params(
            sd, tuple(mc.get("backbone_depths", (3, 3, 9, 3)))
        ), {}
    if model in ("AppleCider", "Fusion"):
        pc = config["model"]["BaselineCLS"]
        ac = config["model"]["AstroMiNN"]
        params, stats = torch_port.fusion_reference_params(
            sd,
            photometry_layers=int(pc["n_layers"]),
            astrominn_backbone_depths=tuple(ac.get("backbone_depths", (3, 3, 9, 3))),
            num_experts=int(ac.get("num_mlp_experts", 4)),
        )
        return params, ({"batch_stats": stats} if stats else {})
    raise SystemExit(f"unknown --model {model!r}")


def _shape_tree(tree) -> dict:
    import jax

    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def main(argv=None) -> Path:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", required=True)
    ap.add_argument("--ckpt", required=True, help="torch .pt state_dict path")
    ap.add_argument("--out", required=True, help="orbax checkpoint dir to write")
    ap.add_argument("--config", default=None, help="optional TOML overlay")
    ap.add_argument("--skip-shape-check", action="store_true")
    args = ap.parse_args(argv)

    config = load_config(args.config)

    sd = _load_state_dict(args.ckpt)
    try:
        params, extras = convert(sd, args.model, config)
    except KeyError as e:
        sample = ", ".join(sorted(sd)[:5])
        raise SystemExit(
            f"checkpoint does not look like a {args.model} state_dict "
            f"(missing key {e}); its keys start with: {sample} ..."
        ) from e
    params = {k: v for k, v in params.items()}

    if not args.skip_shape_check:
        import jax

        from applecider_tpu.registry import get_model

        task = get_model(args.model)(config)
        probe = _probe_batch(args.model, config)
        want = _shape_tree(task.init(jax.random.PRNGKey(0), probe)["params"])
        got = _shape_tree(params)
        if want != got:
            import difflib

            a = sorted(f"{p}: {s}" for p, s in _flat(want))
            b = sorted(f"{p}: {s}" for p, s in _flat(got))
            diff = "\n".join(difflib.unified_diff(a, b, "expected", "imported", lineterm=""))
            raise SystemExit(f"shape mismatch between config and checkpoint:\n{diff}")

    if "batch_stats" in extras:
        stages = sorted(extras["batch_stats"])
        print(
            "NOTE: checkpoint carries BatchNorm running stats for "
            f"{stages}. To run it: set model.SpectraNetTriPool.use_ln_stages "
            "to match the reference layout (false for BN stages) and assign "
            "task.batch_stats from the restored checkpoint's 'batch_stats'."
        )

    import orbax.checkpoint as ocp

    out = Path(args.out).absolute()
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params, **extras}
    ckptr.save(out, payload, force=True)
    ckptr.wait_until_finished()
    print(f"imported {args.model} checkpoint -> {out} "
          f"({sum(np.size(v) for _, v in _flat(params))} params)")
    return out


def _flat(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat(v, f"{prefix}/{k}")
    else:
        yield prefix, tree


def _probe_batch(model: str, config):
    rng = np.random.default_rng(0)
    if model in ("BaselineCLS", "MPT"):
        L = int(config["model"]["BaselineCLS"].get("max_len", 257))
        return (rng.normal(size=(2, L, 7)).astype(np.float32),
                np.zeros((2, L), bool), np.zeros(2, np.int64))
    if model in ("SpectraNet", "SpectraNetTriPool"):
        return (rng.normal(size=(2, 3481)).astype(np.float32),
                np.zeros(2, np.int32), np.zeros(2, np.float32))
    if model == "AstroMiNN":
        return (rng.normal(size=(2, 24)).astype(np.float32),
                rng.normal(size=(2, 63, 63, 3)).astype(np.float32),
                np.zeros(2, np.int64))
    if model in ("AppleCider", "Fusion"):
        L = int(config["model"]["BaselineCLS"].get("max_len", 257))
        chans = int(config["model"]["AppleCider"].get("image_channels", 3))
        return (rng.normal(size=(2, L, 7)).astype(np.float32),
                np.zeros((2, L), bool),
                rng.normal(size=(2, 24)).astype(np.float32),
                rng.normal(size=(2, 63, 63, chans)).astype(np.float32),
                rng.normal(size=(2, 3481)).astype(np.float32),
                np.zeros(2, np.int64))
    raise SystemExit(f"unknown --model {model!r}")


if __name__ == "__main__":
    main()
