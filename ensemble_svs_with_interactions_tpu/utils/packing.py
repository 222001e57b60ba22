"""Packed-model directory writer.

The Python equivalent of the reference's recipes/_common/spsvs/pack_model.sh:
collects model configs, flax variables, scalers and the question set into a
single self-contained directory consumable by
:class:`ensemble_svs_with_interactions_tpu.svs.SPSVS`.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Dict, Optional

from flax import serialization

from ensemble_svs_with_interactions_tpu.utils.config import save_config
from ensemble_svs_with_interactions_tpu.utils.scalers import (
    MinMaxScaler,
    StandardScaler,
    save_scaler,
)


def save_model_phase(
    out_dir,
    phase: str,
    model_config: Dict,
    variables,
    in_scaler: Optional[MinMaxScaler] = None,
    out_scaler: Optional[StandardScaler] = None,
) -> None:
    """Write one phase (timelag/duration/acoustic/postfilter/vocoder)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_config(model_config, out_dir / f"{phase}_model.yaml")
    with open(out_dir / f"{phase}_model.params", "wb") as f:
        f.write(serialization.to_bytes(variables))
    # dispatch on scaler type so e.g. a StandardScaler vocoder input
    # scaler writes mean/var/scale (what svs.load_vocoder reads back)
    if in_scaler is not None:
        save_scaler(in_scaler, str(out_dir / f"in_{phase}_scaler"))
    if out_scaler is not None:
        save_scaler(out_scaler, str(out_dir / f"out_{phase}_scaler"))


def pack_model(
    out_dir,
    global_config: Dict,
    qst_path,
    phases: Dict[str, Dict],
) -> Path:
    """Write a complete packed-model directory.

    Args:
        out_dir: destination directory.
        global_config: top-level config (sample_rate, frame_period, ...).
        qst_path: path to the question set (.hed) to bundle.
        phases: mapping phase -> dict(model_config, variables, in_scaler,
            out_scaler).
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_config(global_config, out_dir / "config.yaml")
    shutil.copyfile(qst_path, out_dir / "qst.hed")
    for phase, parts in phases.items():
        save_model_phase(
            out_dir,
            phase,
            parts["model_config"],
            parts["variables"],
            parts.get("in_scaler"),
            parts.get("out_scaler"),
        )
    return out_dir
