"""Convert an ENUNU packed voicebank to this framework's packed layout.

Behavior parity with /root/reference/utils/enunu2nnsvs.py:80-140: copies
the question set and kana table, converts joblib scalers to the npy
convention (``{in,out}_{phase}_scaler_{mean,var,scale}.npy`` /
``_{min,scale}.npy``), copies per-phase ``model.yaml``s, and writes a
synthesis ``config.yaml``.

Torch checkpoints are NOT auto-ported: this framework's models are flax
modules with different parameter trees, so network weights must be
re-trained (or ported with a per-architecture mapping).  The tool copies
each checkpoint verbatim to ``{phase}_model.pth.orig`` and reports what
remains to be done.
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import numpy as np
import yaml


def scaler_to_npy(joblib_path: Path, out_dir: Path) -> str:
    """Duck-typed joblib scaler -> npy files; returns the kind converted."""
    import joblib

    scaler = joblib.load(joblib_path)
    stem = joblib_path.stem
    if hasattr(scaler, "mean_") and hasattr(scaler, "var_"):
        np.save(out_dir / f"{stem}_mean.npy", np.asarray(scaler.mean_))
        np.save(out_dir / f"{stem}_var.npy", np.asarray(scaler.var_))
        np.save(out_dir / f"{stem}_scale.npy", np.asarray(scaler.scale_))
        return "standard"
    if hasattr(scaler, "min_") and hasattr(scaler, "scale_"):
        np.save(out_dir / f"{stem}_min.npy", np.asarray(scaler.min_))
        np.save(out_dir / f"{stem}_scale.npy", np.asarray(scaler.scale_))
        return "minmax"
    raise ValueError(f"unknown scaler type in {joblib_path}: {type(scaler)}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("enunu_dir")
    ap.add_argument("out_dir")
    args = ap.parse_args(argv)
    enunu_dir, out_dir = Path(args.enunu_dir), Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    enuconfig = yaml.safe_load((enunu_dir / "enuconfig.yaml").read_text())

    shutil.copyfile(enunu_dir / enuconfig["question_path"], out_dir / "qst.hed")
    table = enunu_dir / enuconfig.get("table_path", "")
    if table.is_file():
        shutil.copyfile(table, out_dir / "kana2phonemes.table")

    model_dir = enunu_dir / enuconfig["model_dir"]
    pending = []
    for phase in ("timelag", "duration", "acoustic"):
        shutil.copyfile(
            model_dir / phase / "model.yaml", out_dir / f"{phase}_model.yaml"
        )
        ckpt = model_dir / phase / enuconfig[phase]["checkpoint"]
        if ckpt.exists():
            shutil.copyfile(ckpt, out_dir / f"{phase}_model.pth.orig")
            pending.append(phase)
        for inout in ("in", "out"):
            scaler_to_npy(
                enunu_dir / enuconfig["stats_dir"] / f"{inout}_{phase}_scaler.joblib",
                out_dir,
            )

    config = {
        "sample_rate": enuconfig["sample_rate"],
        "frame_period": 5,
        "log_f0_conditioning": enuconfig.get("log_f0_conditioning", True),
        "use_world_codec": False,
        "timelag": {
            "allowed_range": enuconfig["timelag"]["allowed_range"],
            "allowed_range_rest": enuconfig["timelag"]["allowed_range_rest"],
            "force_clip_input_features": True,
        },
        "duration": {"force_clip_input_features": True},
        "acoustic": {
            "subphone_features": "coarse_coding",
            "force_clip_input_features": True,
            "relative_f0": enuconfig["acoustic"].get("relative_f0", True),
        },
    }
    (out_dir / "config.yaml").write_text(yaml.safe_dump(config, sort_keys=False))

    print(f"converted configs + scalers -> {out_dir}")
    if pending:
        print(
            "NOTE: torch checkpoints copied as *_model.pth.orig for phases "
            f"{pending}; flax weights must be re-trained or ported per "
            "architecture before synthesis."
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
