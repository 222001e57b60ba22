"""Pretrained packed-model registry.

Parity target: /root/reference/nnsvs/pretrained/__init__.py:14-60 (a named
registry with remote URLs, cached download, and create_svs_engine).  This
environment has no network egress, so the registry resolves:

  1. local directories registered at runtime (register_model),
  2. entries in the ``ESVS_MODEL_ROOT`` directory (default ~/.cache),
  3. explicit paths.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

DEFAULT_CACHE_DIR = Path(
    os.environ.get(
        "ESVS_MODEL_ROOT", os.path.join(os.path.expanduser("~"), ".cache", "esvs_tpu")
    )
)

# name -> local path or (url, md5) once remote hosting exists
model_registry: Dict[str, str] = {}


def register_model(name: str, path) -> None:
    model_registry[name] = str(path)


def retrieve_pretrained_model(name: str) -> Path:
    """Resolve a model name to a packed-model directory."""
    if name in model_registry:
        p = Path(model_registry[name])
        if p.exists():
            return p
    cached = DEFAULT_CACHE_DIR / name
    if cached.exists():
        return cached
    direct = Path(name)
    if direct.exists():
        return direct
    raise ValueError(
        f"unknown pretrained model: {name}. Registered: "
        f"{sorted(model_registry)}; cache dir: {DEFAULT_CACHE_DIR}"
    )


def create_svs_engine(name: str, **kwargs):
    """Instantiate an SVS engine for a registry entry."""
    from ensemble_svs_with_interactions_tpu.svs import SPSVS

    return SPSVS(retrieve_pretrained_model(name), **kwargs)
