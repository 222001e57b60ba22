"""Minimal YAML config system with Hydra-style ``_target_`` instantiation.

The reference is configured entirely through Hydra/OmegaConf YAML trees
(SURVEY.md section 5 item 6).  Neither library is a runtime dependency here;
this module provides the small subset the framework needs:

* ``Config``: a dict with attribute access and recursive wrapping.
* ``load_config`` / ``save_config``: YAML I/O.
* ``instantiate``: build an object from a config node whose ``_target_`` is
  a dotted class path, recursively instantiating nested ``_target_`` nodes.
* ``merge``: deep-merge override dicts (for CLI ``key=value`` overrides).
* ``parse_overrides``: parse ``a.b.c=value`` command-line overrides.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, List

import yaml


class Config(dict):
    """dict with attribute access; nested dicts are wrapped on the fly."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(v, dict) and not isinstance(v, Config):
            v = Config(v)
            self[name] = v
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_path(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def _wrap(obj):
    if isinstance(obj, dict):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def load_config(path) -> Config:
    with open(path) as f:
        data = yaml.safe_load(f)
    return _wrap(data or {})


def save_config(cfg: Dict, path) -> None:
    def _plain(obj):
        if isinstance(obj, dict):
            return {k: _plain(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [_plain(v) for v in obj]
        return obj

    with open(path, "w") as f:
        yaml.safe_dump(_plain(cfg), f, sort_keys=False)


def resolve_target(path: str) -> Any:
    mod_name, _, attr = path.rpartition(".")
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr)


def instantiate(node: Any, **overrides) -> Any:
    """Recursively instantiate a ``_target_`` config node.

    Compatible with the subset of hydra.utils.instantiate the reference
    relies on (nested sub-model configs, keyword overrides at call time).
    """
    if isinstance(node, dict) and "_target_" in node:
        cls = resolve_target(node["_target_"])
        kwargs = {
            k: instantiate(v)
            for k, v in node.items()
            if k != "_target_"
        }
        kwargs.update(overrides)
        return cls(**kwargs)
    if isinstance(node, dict):
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def merge(base: Dict, override: Dict) -> Config:
    """Deep-merge ``override`` into ``base`` (returns a new Config)."""
    out = Config({})
    for k, v in base.items():
        out[k] = _wrap(v)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = _wrap(v)
    return out


def _override_value(raw: str):
    """Type a CLI override like the Hydra grammar: ints, floats (incl.
    dotless exponents like ``1e-4``, which YAML 1.1 leaves as strings),
    true/false/null, and everything else verbatim (no on/off/yes/no
    boolean coercion)."""
    s = raw.strip()
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none", "~"):
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    # structured values (lists/dicts) still go through YAML; note '' in '[{'
    # is True (empty-substring), so `key=` must stay an empty string
    if s[:1] in ("[", "{"):
        return yaml.safe_load(s)
    return raw


def parse_overrides(args: List[str]) -> Config:
    """Parse ``a.b=value`` strings into a nested Config."""
    out: Dict = {}
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"override must look like key=value: {arg}")
        key, _, raw = arg.partition("=")
        value = _override_value(raw)
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return _wrap(out)
