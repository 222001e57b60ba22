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


def _candidate_paths(name: str):
    """Local paths a name may resolve to, in resolution order (shared by
    ``is_pretrained_model_ready`` and ``retrieve_pretrained_model`` so the
    two can never disagree about what "resolves without a download" means).
    """
    entry = model_registry.get(name)
    cands = []
    if entry and entry.get("path"):
        cands.append(Path(entry["path"]))
    cands.append(DEFAULT_CACHE_DIR / name.replace("/", "_"))
    cands.append(DEFAULT_CACHE_DIR / name)
    cands.append(Path(name))
    return entry, cands


def _is_complete_pack(p: Path) -> bool:
    """A resolved dir counts only when the pack is complete (config.yaml
    present) — a torn cache dir must not satisfy either resolver."""
    return (p / "config.yaml").exists()


def is_pretrained_model_ready(name: str) -> bool:
    """True when a registry entry resolves without any download — i.e. a
    registered local path / cache dir / direct path holds a complete pack
    (reference pretrained/__init__.py:73-77, adapted to the flax-pack
    cache layout: readiness = a config.yaml inside the resolved dir)."""
    _, cands = _candidate_paths(name)
    return any(_is_complete_pack(p) for p in cands)


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
        if out_dir.exists():  # replace a torn dir left by an old failure
            shutil.rmtree(out_dir)
        out_staging.rename(out_dir)
    except BaseException:
        shutil.rmtree(out_staging, ignore_errors=True)
        raise
    return out_dir


def retrieve_pretrained_model(name: str) -> Path:
    """Resolve a model name to a packed-model directory (downloading and
    porting a registry entry when it is not cached yet)."""
    entry, cands = _candidate_paths(name)
    for p in cands:
        if _is_complete_pack(p):
            return p
    if entry and entry.get("url"):
        return _download_and_port(name, entry)
    # bare-existing dirs (no config.yaml) resolve last so an incomplete
    # pack surfaces a clear load error instead of masking a registry entry
    for p in cands:
        if p.exists():
            return p
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
