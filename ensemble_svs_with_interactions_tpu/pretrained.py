"""Pretrained packed-model registry with cached download.

Parity target: /root/reference/nnsvs/pretrained/__init__.py:14-60 (a named
registry with remote URLs, cached tarball download, and
create_svs_engine).  Named entries mirror the reference's published
models; downloaded torch checkpoints are converted to runnable flax packs
via the enunu2nnsvs porting path.  Resolution order:

  1. local directories registered at runtime (register_model),
  2. the ``ESVS_MODEL_ROOT`` cache directory (default ~/.cache/esvs_tpu),
  3. named registry entries (downloaded + ported when egress exists),
  4. explicit paths.
"""

from __future__ import annotations

import os
import tarfile
from pathlib import Path
from typing import Dict, Optional
from urllib.request import urlretrieve

DEFAULT_CACHE_DIR = Path(
    os.environ.get(
        "ESVS_MODEL_ROOT", os.path.join(os.path.expanduser("~"), ".cache", "esvs_tpu")
    )
)

# Named entries published by the reference project (torch packs that the
# porting pipeline converts on first use).  ``_target_`` selects the
# engine class.
_PKG = "ensemble_svs_with_interactions_tpu"
model_registry: Dict[str, dict] = {
    "r9y9/yoko_latest": {
        "url": "https://www.dropbox.com/s/k8mya65yt52m0ps/yoko_latest.tar.gz?dl=1",
        "_target_": f"{_PKG}.svs:SPSVS",
        "format": "torch",
    },
    "r9y9/20220322_yoko_timelag_mdn_duration_mdn_acoustic_resf0conv": {
        "url": "https://www.dropbox.com/s/olsfyqol9ryk5kx/"
        "20220322_yoko_timelag_mdn_duration_mdn_acoustic_resf0conv.tar.gz?dl=1",
        "_target_": f"{_PKG}.svs:SPSVS",
        "format": "torch",
    },
}


def register_model(name: str, path, target: Optional[str] = None) -> None:
    """Register a local packed-model directory under a name."""
    model_registry[name] = {
        "path": str(path),
        "_target_": target or f"{_PKG}.svs:SPSVS",
        "format": "flax",
    }


def get_available_model_ids():
    return sorted(model_registry)


def is_pretrained_model_ready(name: str) -> bool:
    """True when a registry entry resolves without any download — i.e. a
    registered local path exists or the converted pack is already cached
    (reference pretrained/__init__.py:73-77, adapted to the flax-pack
    cache layout: readiness = a config.yaml inside the resolved dir)."""
    entry = model_registry.get(name)
    if entry and entry.get("path"):
        p = Path(entry["path"])
        if (p / "config.yaml").exists():
            return True
    for cached in (
        DEFAULT_CACHE_DIR / name.replace("/", "_"),
        DEFAULT_CACHE_DIR / name,
    ):
        if (cached / "config.yaml").exists():
            return True
    return False


def _download_and_port(name: str, entry: dict) -> Path:
    """Download a reference torch pack and convert it to a flax pack.

    Every stage writes into a ``*.partial`` staging directory and renames
    it into place only on success, so an interrupted download/extract/
    convert can never leave a directory that later calls mistake for a
    complete cached model."""
    import shutil

    cache = DEFAULT_CACHE_DIR
    cache.mkdir(parents=True, exist_ok=True)
    safe = name.replace("/", "_")
    tar_path = cache / f"{safe}.tar.gz"
    raw_dir = cache / f"{safe}_torch"
    out_dir = cache / safe
    if not raw_dir.exists():
        staging = cache / f"{safe}_torch.partial"
        shutil.rmtree(staging, ignore_errors=True)
        try:
            # download to a per-process temp then rename: concurrent
            # processes must not interleave writes into one tar_path
            tar_tmp = cache / f"{safe}.tar.gz.tmp{os.getpid()}"
            urlretrieve(entry["url"], tar_tmp)  # requires network egress
            os.replace(tar_tmp, tar_path)
            staging.mkdir(parents=True)
            with tarfile.open(tar_path) as tf:
                # filter="data" rejects path-traversal members (CVE-2007-4559)
                tf.extractall(staging, filter="data")
            staging.rename(raw_dir)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            tar_tmp.unlink(missing_ok=True)
            tar_path.unlink(missing_ok=True)
            raise
    # locate the packed dir (the tarball may nest one directory)
    src = raw_dir
    if not (src / "config.yaml").exists():
        subdirs = [d for d in src.iterdir() if d.is_dir()]
        if len(subdirs) == 1:
            src = subdirs[0]
    from ensemble_svs_with_interactions_tpu.bin.enunu2nnsvs import (
        convert_nnsvs_pack,
    )

    out_staging = cache / f"{safe}.partial"
    shutil.rmtree(out_staging, ignore_errors=True)
    try:
        convert_nnsvs_pack(src, out_staging)
        out_staging.rename(out_dir)
    except BaseException:
        shutil.rmtree(out_staging, ignore_errors=True)
        raise
    return out_dir


def retrieve_pretrained_model(name: str) -> Path:
    """Resolve a model name to a packed-model directory (downloading and
    porting a registry entry when it is not cached yet)."""
    entry = model_registry.get(name)
    if entry and entry.get("path"):
        p = Path(entry["path"])
        if p.exists():
            return p
    cached = DEFAULT_CACHE_DIR / name.replace("/", "_")
    if cached.exists():
        return cached
    legacy_cached = DEFAULT_CACHE_DIR / name
    if legacy_cached.exists():
        return legacy_cached
    if entry and entry.get("url"):
        return _download_and_port(name, entry)
    direct = Path(name)
    if direct.exists():
        return direct
    raise ValueError(
        f"unknown pretrained model: {name}. Registered: "
        f"{get_available_model_ids()}; cache dir: {DEFAULT_CACHE_DIR}"
    )


def create_svs_engine(name: str, **kwargs):
    """Instantiate an SVS engine for a registry entry (reference
    pretrained/__init__.py:27-54)."""
    from ensemble_svs_with_interactions_tpu.utils.misc import dynamic_import

    entry = model_registry.get(name, {})
    target = entry.get("_target_", f"{_PKG}.svs:SPSVS")
    cls = dynamic_import(target.replace(":", "."))
    return cls(retrieve_pretrained_model(name), **kwargs)
