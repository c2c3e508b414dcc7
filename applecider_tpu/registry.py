"""Model and dataset registries.

Replaces the Hyrax registration surface the reference relies on
(``@hyrax_model`` decorators and ``HyraxDataset`` subclass registration,
cf. reference ``src/applecider/models/astrominn.py:67`` and
``src/applecider/datasets/photo_dataset.py:11``): models and datasets
register under both their short class name and their full dotted path so
run configs can select them either way
(``name = "applecider_tpu.models.baseline_cls.BaselineCLS"``).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Type

_MODEL_REGISTRY: dict[str, Any] = {}
_DATASET_REGISTRY: dict[str, Type] = {}

# Modules scanned lazily on a registry miss, so `get_model("BaselineCLS")`
# works without the caller importing the model module first.
_MODEL_MODULES = [
    "applecider_tpu.models.baseline_cls",
    "applecider_tpu.models.mpt",
    "applecider_tpu.models.spectranet",
    "applecider_tpu.models.astrominn",
    "applecider_tpu.models.fusion",
    "applecider_tpu.models.zoo",
]
_DATASET_MODULES = [
    "applecider_tpu.datasets.photo_dataset",
    "applecider_tpu.datasets.image_metadata_dataset",
    "applecider_tpu.datasets.spectra_dataset",
    "applecider_tpu.datasets.fusion_dataset",
]


def _register(registry: dict, obj: Any, name: str | None) -> Any:
    key = name or obj.__name__
    registry[key] = obj
    registry[f"{obj.__module__}.{obj.__name__}"] = obj
    return obj


def register_model(cls: Any = None, *, name: str | None = None) -> Any:
    """Class decorator registering a model task under its name + dotted path."""
    if cls is None:
        return lambda c: _register(_MODEL_REGISTRY, c, name)
    return _register(_MODEL_REGISTRY, cls, name)


def register_dataset(cls: Any = None, *, name: str | None = None) -> Any:
    if cls is None:
        return lambda c: _register(_DATASET_REGISTRY, c, name)
    return _register(_DATASET_REGISTRY, cls, name)


def _resolve(registry: dict, name: str, modules: list[str]) -> Any:
    if name in registry:
        return registry[name]
    # Try importing the module part of a dotted path directly.
    if "." in name:
        module_name, _, cls_name = name.rpartition(".")
        try:
            mod = importlib.import_module(module_name)
            obj = getattr(mod, cls_name, None)
            if obj is not None:
                return registry.get(name, obj)
        except ImportError:
            pass
    # Fall back to scanning the known module list.
    for module_name in modules:
        try:
            importlib.import_module(module_name)
        except ImportError:
            continue
        if name in registry:
            return registry[name]
    raise KeyError(f"Unknown registry entry: {name!r}. Known: {sorted(k for k in registry if '.' not in k)}")


def get_model(name: str) -> Any:
    return _resolve(_MODEL_REGISTRY, name, _MODEL_MODULES)


def get_dataset_class(name: str) -> Type:
    return _resolve(_DATASET_REGISTRY, name, _DATASET_MODULES)


def builder_from_config(config, phase: str = "train") -> Callable:
    """Look up the dataset class bound to a run phase in the config.

    Mirrors the reference's ``[model_inputs.<phase>.data]`` binding
    (cf. ``docs/pre_executed/testing/baselinecls_example_config.toml``).
    """
    section = config.section("model_inputs", phase, "data")
    name = section.get("dataset_class")
    if not name:
        raise KeyError(f"No dataset_class bound for phase {phase!r} under [model_inputs.{phase}.data]")
    return get_dataset_class(name)
