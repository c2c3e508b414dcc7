import textwrap

from applecider_tpu.config import Config, load_config, load_defaults


def test_defaults_load():
    cfg = load_defaults()
    assert cfg["model"]["BaselineCLS"]["d_model"] == 128
    assert cfg["model"]["SpectraNet"]["channels"] == [64, 128, 256, 512, 1024]
    assert cfg["model"]["AstroMiNN"]["num_mlp_experts"] == 4


def test_dotted_set_get():
    cfg = load_defaults()
    cfg.set("model.AstroMiNN.use_probabilities", True)
    assert cfg["model"]["AstroMiNN"]["use_probabilities"] is True
    assert cfg.get_path("model.AstroMiNN.use_probabilities") is True
    # hyrax-compatible alias
    cfg.set_config("train.epochs", 3)
    assert cfg["train"]["epochs"] == 3


def test_quoted_path_segments():
    cfg = load_defaults()
    path = 'data_set."applecider_tpu.datasets.photo_dataset.PhotoEventsDataset".horizon'
    assert cfg.get_path(path) == 100.0
    cfg.set(path, 10.0)
    assert cfg.get_path(path) == 10.0


def test_overlay_merge(tmp_path):
    overlay = tmp_path / "run.toml"
    overlay.write_text(
        textwrap.dedent(
            """
            [model.BaselineCLS]
            d_model = 64

            [train]
            epochs = 2
            """
        )
    )
    cfg = load_config(overlay)
    assert cfg["model"]["BaselineCLS"]["d_model"] == 64
    # untouched siblings survive the merge
    assert cfg["model"]["BaselineCLS"]["n_heads"] == 8
    assert cfg["train"]["epochs"] == 2


def test_direct_dict_mutation():
    cfg = load_defaults()
    cfg["train"]["epochs"] = 99
    assert cfg.get_path("train.epochs") == 99


def test_section_missing_returns_empty():
    cfg = Config({})
    assert cfg.section("model_inputs", "train", "data") == {}
