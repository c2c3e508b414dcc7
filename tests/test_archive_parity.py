"""Numeric parity against the REAL reference modules (not oracles).

Imports the reference's own torch model files from /root/reference —
``_archive/AppleCider/models/BaselineCLS.py``, ``SpectraNet.py`` and
``src/applecider/models/astrominn.py`` — ports their randomly-initialized
state_dicts with ``applecider_tpu.utils.torch_port`` and asserts logits
match our flax modules to 1e-4 at FULL reference scale (BaselineCLS
d=128/8h/4L, SpectraNet 5 stages with 1021-tap kernels through the FFT
path, AstroMiNN ConvNeXt-tiny (3,3,9,3)).

Environment shims (the reference hardcodes CUDA and imports unavailable
packages):
* ``torch.device``/``torch.zeros`` are patched to CPU during reference
  module construction/forward;
* ``timm`` is absent from this image, so ``timm.create_model`` is stubbed
  with our independently-written TorchConvNeXt oracle (itself
  parity-tested against the flax ConvNeXt in test_convnext.py) — the
  backbone's timm-vs-oracle equivalence is the one link this test cannot
  check on this image;
* ``hyrax.models.hyrax_model`` is stubbed as an identity decorator.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from contextlib import contextmanager
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from applecider_tpu.utils import torch_port  # noqa: E402
from tests.torch_refs import TorchConvNeXt, state_dict_numpy  # noqa: E402

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")


@contextmanager
def cpu_patched_torch():
    """Patch torch.device / torch.zeros so 'cuda' literals land on CPU."""
    orig_device, orig_zeros = torch.device, torch.zeros

    def device(*args, **kw):
        args = tuple(
            "cpu" if isinstance(a, str) and a.startswith("cuda") else a for a in args
        )
        return orig_device(*args, **kw)

    def zeros(*args, **kw):
        d = kw.get("device")
        if isinstance(d, str) and d.startswith("cuda"):
            kw["device"] = "cpu"
        elif isinstance(d, orig_device) and d.type == "cuda":
            kw["device"] = "cpu"
        return orig_zeros(*args, **kw)

    torch.device, torch.zeros = device, zeros
    try:
        yield
    finally:
        torch.device, torch.zeros = orig_device, orig_zeros


def _import_ref(relpath: str, name: str) -> types.ModuleType:
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def stub_modules():
    """timm + hyrax + applecider package stubs for importing src modules."""
    created = []

    def ensure(name: str, mod: types.ModuleType):
        if name not in sys.modules:
            sys.modules[name] = mod
            created.append(name)

    timm = types.ModuleType("timm")

    def create_model(model_name, pretrained=False, in_chans=3, num_classes=0, **kw):
        assert model_name == "convnext_tiny"
        m = TorchConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), in_chans=in_chans)
        m.num_features = 768
        return m

    timm.create_model = create_model
    ensure("timm", timm)

    hyrax = types.ModuleType("hyrax")
    hyrax_models = types.ModuleType("hyrax.models")
    hyrax_models.hyrax_model = lambda cls: cls
    hyrax.models = hyrax_models
    ensure("hyrax", hyrax)
    ensure("hyrax.models", hyrax_models)
    yield
    for name in created:
        sys.modules.pop(name, None)


def _assert_close(ours, theirs, tol=1e-4, what=""):
    ours, theirs = np.asarray(ours), np.asarray(theirs)
    diff = float(np.max(np.abs(ours - theirs)))
    assert diff < tol, f"{what}: max |Δ| = {diff:.2e} >= {tol}"


# --------------------------------------------------------------- BaselineCLS
def test_baseline_cls_vs_archive_full_scale(rng):
    """_archive/AppleCider/models/BaselineCLS.py:32-89 at d=128/8h/4L."""
    mod = _import_ref("_archive/AppleCider/models/BaselineCLS.py", "ref_baseline_cls")
    with cpu_patched_torch():
        ref = mod.BaselineCLS(
            d_model=128, n_heads=8, n_layers=4, num_classes=5, dropout=0.4, mode="photo"
        ).eval()
        x = rng.normal(size=(4, 257, 7)).astype(np.float32)
        pad = np.zeros((4, 257), bool)
        pad[:, 180:] = True  # realistic padding tail
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(pad)).numpy()

    from applecider_tpu.models.baseline_cls import BaselineCLSModule

    params = jax.tree.map(
        np.asarray,
        torch_port.baseline_cls_params(state_dict_numpy(ref), n_layers=4),
    )
    module = BaselineCLSModule(d_model=128, n_heads=8, n_layers=4, num_classes=5, dropout=0.4)
    got = module.apply({"params": params}, x, pad, deterministic=True)
    _assert_close(got, want, what="BaselineCLS full-scale logits")


def test_baseline_cls_embedding_mode_vs_archive(rng):
    """mode!='photo' returns the normalized CLS embedding (fusion input)."""
    mod = _import_ref("_archive/AppleCider/models/BaselineCLS.py", "ref_baseline_cls2")
    with cpu_patched_torch():
        ref = mod.BaselineCLS(
            d_model=64, n_heads=4, n_layers=2, num_classes=5, dropout=0.1, mode="fusion"
        ).eval()
        x = rng.normal(size=(3, 64, 7)).astype(np.float32)
        pad = np.zeros((3, 64), bool)
        pad[:, 40:] = True
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(pad)).numpy()

    from applecider_tpu.models.baseline_cls import BaselineCLSModule

    params = jax.tree.map(
        np.asarray,
        torch_port.baseline_cls_params(state_dict_numpy(ref), n_layers=2, classification=False),
    )
    module = BaselineCLSModule(
        d_model=64, n_heads=4, n_layers=2, num_classes=5, dropout=0.1, classification=False
    )
    got = module.apply({"params": params}, x, pad, deterministic=True)
    _assert_close(got, want, what="BaselineCLS embedding mode")


# ---------------------------------------------------------------- SpectraNet
def test_spectranet_vs_archive_full_scale(rng):
    """_archive/AppleCider/models/SpectraNet.py:9-114: 5 stages, kernels up
    to 1021 taps, channels 64->1024 — flax FFT conv path vs torch direct."""
    mod = _import_ref("_archive/AppleCider/models/SpectraNet.py", "ref_spectranet")
    classes = [f"c{i}" for i in range(9)]
    ref = mod.build_spec_model({"class_order": classes}).eval()

    x = rng.normal(size=(2, 3481)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).unsqueeze(1)).numpy()

    from applecider_tpu.models.spectranet import SpectraNetModule

    sd = torch_port.rename_reference_spectranet_sd(state_dict_numpy(ref))
    params = jax.tree.map(
        np.asarray,
        torch_port.spectranet_params(sd, depths=[1] * 5, n_kernels_per_stage=[3] * 5),
    )
    module = SpectraNetModule(num_classes=9, conv_mode="fft")
    got = module.apply({"params": params}, x, deterministic=True)
    _assert_close(got, want, what="SpectraNet full-scale logits (FFT path)")


# ------------------------------------------------------- tri-pool SpectraNet
def _extract_callable(relpath: str, func_name: str):
    """Exec just one top-level function from a reference script that cannot
    be imported whole (module-level cuda/optuna side effects)."""
    import ast

    src = (REF / relpath).read_text()
    # notebook-exported scripts carry ipython magics; strip them
    src = "\n".join(
        line for line in src.splitlines() if not line.lstrip().startswith("%")
    )
    tree = ast.parse(src)
    node = next(n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == func_name)
    ns = {"torch": torch, "nn": torch.nn, "F": torch.nn.functional}
    exec(compile(ast.Module(body=[node], type_ignores=[]), relpath, "exec"), ns)
    return ns[func_name]


def test_spectranet_tripool_vs_brew_cider():
    """brew_cider.py:585-708: skip-connected conv banks + max/avg/min
    tri-pooling, BN stages 1-4 (frozen running stats) + LN stage 5."""
    build = _extract_callable("_archive/notebooks/brew_cider.py", "build_spec_model")
    ref = build({"mode": "spectra", "classes": [f"c{i}" for i in range(9)]}).eval()

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 4096)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).unsqueeze(1)).numpy()

    from applecider_tpu.models.spectranet import SpectraNetTriPoolModule

    use_ln = (False, False, False, False, True)
    params, stats = torch_port.spectranet_tripool_params(
        state_dict_numpy(ref), depths=[1] * 5, use_ln_stages=use_ln
    )
    params = jax.tree.map(np.asarray, params)
    module = SpectraNetTriPoolModule(num_classes=9, use_ln_stages=use_ln, conv_mode="fft")
    got = module.apply({"params": params, "batch_stats": stats}, x, deterministic=True)
    assert got.shape == (2, 9)
    _assert_close(got, want, what="tri-pool SpectraNet logits")


# -------------------------------------------------- full brew_cider fusion
def _extract_nodes(relpath: str, names: list[str], ns: dict) -> dict:
    """Exec selected top-level defs/classes from a reference script."""
    import ast

    src = (REF / relpath).read_text()
    src = "\n".join(
        line for line in src.splitlines() if not line.lstrip().startswith("%")
    )
    tree = ast.parse(src)
    picked = [
        n for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.ClassDef)) and n.name in names
    ]
    assert {n.name for n in picked} == set(names)
    exec(compile(ast.Module(body=picked, type_ignores=[]), relpath, "exec"), ns)
    return ns


def test_full_fusion_vs_real_brew_cider(rng):
    """The paper's fusion model, assembled from the reference's own code
    (brew_cider.py AppleCider = archive BaselineCLS + tri-pool SpectraNet +
    XastroMiNN), ported whole into the flax fusion at 1e-4.

    SplitHeadConvNeXt/ResidualTowerBlock come from the archive module
    (timm stubbed by the parity-tested oracle) because brew_cider imports
    them from an unavailable package path."""
    # building blocks from the archive module
    timm = types.ModuleType("timm")

    def create_model(model_name, pretrained=False, in_chans=3, num_classes=0, **kw):
        m = TorchConvNeXt(depths=(1, 1), dims=(8, 16), in_chans=in_chans)
        m.num_features = 16
        return m

    timm.create_model = create_model
    saved_timm, had = sys.modules.get("timm"), "timm" in sys.modules
    sys.modules["timm"] = timm
    try:
        arch = _import_ref("_archive/AppleCider/models/AstroMiNN.py", "ref_am_blocks")
        ns = {
            "torch": torch, "nn": torch.nn, "F": torch.nn.functional,
            "device": torch.device("cpu"),
            "ResidualTowerBlock": arch.ResidualTowerBlock,
            "SplitHeadConvNeXt": arch.SplitHeadConvNeXt,
        }
        _extract_nodes(
            "_archive/notebooks/brew_cider.py",
            ["Time2Vec", "BaselineCLS", "build_spec_model", "XastroMiNN", "AppleCider"],
            ns,
        )
        config = {
            "mode": "all", "num_classes": 5, "max_len": 64,
            "p_d_model": 32, "p_n_heads": 4, "p_n_layers": 1, "p_dropout": 0.0,
            "hidden_dim": 8, "fusion": "concat",
        }
        with cpu_patched_torch():
            ref = ns["AppleCider"](config).eval()
            B, L = 2, 48
            photometry = rng.normal(size=(B, L, 7)).astype(np.float32)
            pad = np.zeros((B, L), bool)
            pad[:, 30:] = True
            metadata = rng.normal(size=(B, 24)).astype(np.float32)
            images = rng.normal(size=(B, 4, 63, 63)).astype(np.float32)
            spectra = rng.normal(size=(B, 4096)).astype(np.float32)
            with torch.no_grad():
                want = ref(
                    torch.from_numpy(photometry), torch.from_numpy(pad),
                    torch.from_numpy(metadata), torch.from_numpy(images),
                    torch.from_numpy(spectra).unsqueeze(1),
                ).numpy()
    finally:
        if had:
            sys.modules["timm"] = saved_timm
        else:
            sys.modules.pop("timm", None)

    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.fusion import AppleCiderTask

    cfg = load_defaults()
    cfg.set("train.compute_dtype", "float32")
    cfg.set("model.BaselineCLS.d_model", 32)
    cfg.set("model.BaselineCLS.n_heads", 4)
    cfg.set("model.BaselineCLS.n_layers", 1)
    cfg.set("model.BaselineCLS.dropout", 0.0)
    cfg.set("model.AppleCider.spectra_encoder", "tripool")
    cfg.set("model.AppleCider.hidden_dim", 8)
    cfg.set("model.AppleCider.fusion", "concat")
    cfg.set("model.SpectraNetTriPool.use_ln_stages",
            [False, False, False, False, True])
    cfg.set("model.AstroMiNN.backbone_depths", [1, 1])
    cfg.set("model.AstroMiNN.backbone_dims", [8, 16])
    task = AppleCiderTask(cfg)

    params, stats = torch_port.fusion_reference_params(
        state_dict_numpy(ref), photometry_layers=1,
        astrominn_backbone_depths=(1, 1),
    )
    params = jax.tree.map(np.asarray, params)
    task.batch_stats = stats
    got = task.module.apply(
        {"params": params, **({"batch_stats": stats} if stats else {})},
        photometry, pad, metadata,
        np.transpose(images, (0, 2, 3, 1)), spectra,
        deterministic=True,
    )
    _assert_close(got, want, what="brew_cider full-fusion logits")

    # and the imported model must SERVE: the stream pipeline threads the
    # frozen BN stats (regression: it used to apply {'params'} only and
    # crash on the missing batch_stats collection)
    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch

    assert stats, "expected BN running stats for the reference layout"
    task.batch_stats = stats
    pipe = AlertStreamPipeline(
        task, wave_grid=np.linspace(4500.0, 7980.0, 4096).astype(np.float32)
    )
    raw_alert = {
        "photo_t": np.sort(rng.uniform(0, 30, 12)).astype(np.float32),
        "photo_flux": rng.lognormal(2.0, 1.0, 12).astype(np.float32),
        "photo_err": rng.uniform(0.5, 2.0, 12).astype(np.float32),
        "photo_band": rng.integers(0, 3, 12).astype(np.int32),
        "image": rng.normal(size=(63, 63, 4)).astype(np.float32),
        "meta19": rng.normal(size=19).astype(np.float32),
    }
    probs = np.asarray(pipe(params, pack_alert_batch([raw_alert], max_photo=L)))
    assert probs.shape == (1, 5) and np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


# ----------------------------------------------------------------- AstroMiNN
def _load_ref_astrominn_config() -> dict:
    import tomllib

    with open(REF / "src/applecider/default_config.toml", "rb") as f:
        cfg = tomllib.load(f)
    cfg["model"]["AstroMiNN"]["use_probabilities"] = False
    return cfg


def test_xastrominn_4channel_vs_archive(rng):
    """_archive/AppleCider/models/AstroMiNN.py:1575-1728 (XastroMiNN,
    in_chans=4): the 4-channel image-tower variant. Flax's ConvNeXt infers
    stem input channels, so the same module serves 3- and 4-channel stacks."""
    import tests.torch_refs as tr

    timm = types.ModuleType("timm")

    def create_model(model_name, pretrained=False, in_chans=3, num_classes=0, **kw):
        m = tr.TorchConvNeXt(depths=(1, 1), dims=(8, 16), in_chans=in_chans)
        m.num_features = 16
        return m

    timm.create_model = create_model
    had_timm = "timm" in sys.modules
    saved = sys.modules.get("timm")
    sys.modules["timm"] = timm
    try:
        mod = _import_ref("_archive/AppleCider/models/AstroMiNN.py", "ref_xastrominn")
        mod.device = torch.device("cpu")  # module-level cuda global
        ref = mod.XastroMiNN().eval()
        metadata = rng.normal(size=(4, 24)).astype(np.float32)
        image = rng.normal(size=(4, 4, 63, 63)).astype(np.float32)  # 4 channels
        with cpu_patched_torch():  # forward hardcodes torch.zeros(..., device="cuda")
            with torch.no_grad():
                want = ref(torch.from_numpy(metadata), torch.from_numpy(image)).numpy()
    finally:
        if had_timm:
            sys.modules["timm"] = saved
        else:
            sys.modules.pop("timm", None)

    from applecider_tpu.models.astrominn import AstroMiNNModule

    sd = torch_port.rename_reference_astrominn_sd(state_dict_numpy(ref))
    params = jax.tree.map(np.asarray, torch_port.astrominn_params(sd, backbone_depths=(1, 1)))
    module = AstroMiNNModule(backbone_depths=(1, 1), backbone_dims=(8, 16))
    got = module.apply(
        {"params": params}, metadata, np.transpose(image, (0, 2, 3, 1)), deterministic=True
    )
    _assert_close(got, want, what="XastroMiNN 4-channel MoE logits")


@pytest.mark.slow
def test_astrominn_vs_src_full_scale(rng, stub_modules):
    """src/applecider/models/astrominn.py:67-348 with ConvNeXt-tiny backbone
    (timm stubbed by the parity-tested torch oracle)."""
    mod = _import_ref("src/applecider/models/astrominn.py", "ref_astrominn")
    cfg = _load_ref_astrominn_config()
    # no cuda patching needed: the src module is device-agnostic in forward
    ref = mod.AstroMiNN(config=cfg).eval()
    metadata = rng.normal(size=(4, 24)).astype(np.float32)
    image = rng.normal(size=(4, 3, 63, 63)).astype(np.float32)
    with torch.no_grad():
        want = ref((torch.from_numpy(metadata), torch.from_numpy(image), None)).numpy()

    from applecider_tpu.models.astrominn import AstroMiNNModule

    sd = torch_port.rename_reference_astrominn_sd(state_dict_numpy(ref))
    params = jax.tree.map(
        np.asarray, torch_port.astrominn_params(sd, backbone_depths=(3, 3, 9, 3))
    )
    module = AstroMiNNModule()  # defaults = full reference scale
    got = module.apply(
        {"params": params}, metadata, np.transpose(image, (0, 2, 3, 1)), deterministic=True
    )
    _assert_close(got, want, what="AstroMiNN full-scale MoE logits")


def test_import_checkpoint_cli_roundtrip(tmp_path, rng):
    """The migration CLI end-to-end: real archive BaselineCLS .pt ->
    orbax -> restored flax logits match torch."""
    mod = _import_ref("_archive/AppleCider/models/BaselineCLS.py", "ref_bcls_cli")
    with cpu_patched_torch():
        ref = mod.BaselineCLS(
            d_model=128, n_heads=8, n_layers=4, num_classes=5, dropout=0.4, mode="photo"
        ).eval()
        ckpt = tmp_path / "ref.pt"
        torch.save(ref.state_dict(), ckpt)

        from applecider_tpu.utils.import_checkpoint import main as import_main

        out = import_main([
            "--model", "BaselineCLS", "--ckpt", str(ckpt),
            "--out", str(tmp_path / "orbax"),
        ])

        import orbax.checkpoint as ocp

        from applecider_tpu.config import load_defaults
        from applecider_tpu.models.baseline_cls import BaselineCLSTask

        cfg = load_defaults()
        cfg.set("train.compute_dtype", "float32")
        task = BaselineCLSTask(cfg)
        x = rng.normal(size=(2, 257, 7)).astype(np.float32)
        pad = np.zeros((2, 257), bool)
        batch = (x, pad, np.zeros(2, np.int64))
        target = {"params": task.init(jax.random.PRNGKey(0), batch)["params"]}
        restored = ocp.StandardCheckpointer().restore(out, target)
        got = task.module.apply({"params": restored["params"]}, x, pad, deterministic=True)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(pad)).numpy()
    _assert_close(got, want, what="imported-checkpoint logits")

    # wrong-family checkpoint -> clear SystemExit naming the problem
    with pytest.raises(SystemExit, match="does not look like a SpectraNet"):
        import_main([
            "--model", "SpectraNet", "--ckpt", str(tmp_path / "ref.pt"),
            "--out", str(tmp_path / "x"),
        ])
