"""Layered TOML configuration tree with dotted-path access.

Mirrors the reference's config surface (cf. reference
``src/applecider/default_config.toml`` and the Hyrax ``set_config`` API used
in ``docs/pre_executed/testing/baselineCLS_example.py:43-51``): package
defaults are loaded first, then a per-run TOML overlay is deep-merged on
top, and individual keys can be mutated programmatically either through
``cfg.set("model.AstroMiNN.use_probabilities", False)`` or plain dict access
``cfg["train"]["epochs"] = 10``.
"""

from __future__ import annotations

import copy
import tomllib
from pathlib import Path
from typing import Any, Mapping

_DEFAULT_CONFIG_PATH = Path(__file__).parent / "default_config.toml"


def _deep_merge(base: dict, overlay: Mapping) -> dict:
    """Recursively merge ``overlay`` into ``base`` (overlay wins). Returns base."""
    for key, value in overlay.items():
        if key in base and isinstance(base[key], dict) and isinstance(value, Mapping):
            _deep_merge(base[key], value)
        else:
            base[key] = copy.deepcopy(value) if isinstance(value, (dict, list)) else value
    return base


class Config(dict):
    """A nested dict with dotted-path helpers.

    Dotted paths treat quoted segments as single keys so dataset sections
    keyed by full class paths work:
    ``cfg.get_path('data_set."applecider_tpu.datasets.photo_dataset.PhotoEventsDataset".horizon')``.
    """

    @staticmethod
    def _split(path: str) -> list[str]:
        parts: list[str] = []
        buf = ""
        in_quote = False
        for ch in path:
            if ch == '"':
                in_quote = not in_quote
            elif ch == "." and not in_quote:
                parts.append(buf)
                buf = ""
            else:
                buf += ch
        parts.append(buf)
        return [p for p in parts if p]

    def get_path(self, path: str, default: Any = ...) -> Any:
        node: Any = self
        for part in self._split(path):
            if not isinstance(node, Mapping) or part not in node:
                if default is ...:
                    raise KeyError(path)
                return default
            node = node[part]
        return node

    def set(self, path: str, value: Any) -> None:
        """Set a dotted-path key, creating intermediate tables as needed."""
        parts = self._split(path)
        node: dict = self
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = {}
                node[part] = nxt
            node = nxt
        node[parts[-1]] = value

    # Hyrax-compatible alias (``h.set_config(key, value)``).
    set_config = set

    def merged_with(self, overlay: Mapping) -> "Config":
        merged = copy.deepcopy(dict(self))
        _deep_merge(merged, overlay)
        return Config(merged)

    def section(self, *keys: str, default: Any = None) -> "Config":
        """Fetch a nested section as a Config (empty if missing)."""
        node: Any = self
        for key in keys:
            if not isinstance(node, Mapping) or key not in node:
                return Config(default or {})
            node = node[key]
        return Config(node) if isinstance(node, Mapping) else node


def load_defaults() -> Config:
    with open(_DEFAULT_CONFIG_PATH, "rb") as f:
        return Config(tomllib.load(f))


def load_config(config_file: str | Path | None = None, overrides: Mapping | None = None) -> Config:
    """Load package defaults, overlay a per-run TOML file, then apply overrides."""
    cfg = load_defaults()
    if config_file is not None:
        with open(config_file, "rb") as f:
            user = tomllib.load(f)
        cfg = cfg.merged_with(user)
    if overrides:
        cfg = cfg.merged_with(overrides)
    return cfg
