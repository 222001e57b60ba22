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

    if args.multitrack:
        return _main_multitrack(args, engine, out_dir)

    lag_maes, dur_maes = [], []
    for score_path in sorted(Path(args.score_label_dir).glob("*.lab")):
        align_path = Path(args.align_label_dir) / score_path.name
        if not align_path.exists():
            continue
        score = hts.load(score_path)
        align = hts.load(align_path)

        # same per-phase clipping flags as synthesis, so evaluated timing
        # features match what SPSVS.svs() would feed the models
        lag, lag_frames = gen.predict_timelag(
            score.copy(),
            engine.timelag_model,
            engine.in_timelag_scaler,
            engine.out_timelag_scaler,
            engine.binary_dict,
            engine.numeric_dict,
            force_clip_input_features=engine._force_clip("timelag"),
            frame_period=engine.frame_period,
        )
        durations = gen.predict_duration(
            score.copy(),
            engine.duration_model,
            engine.in_duration_scaler,
            engine.out_duration_scaler,
            engine.binary_dict,
            engine.numeric_dict,
            force_clip_input_features=engine._force_clip("duration"),
            frame_period=engine.frame_period,
        )
        pred_dur = durations[0] if isinstance(durations, tuple) else durations

        # ground truth
        note_indices = hts.get_note_indices(score)
        frame_shift = int(engine.frame_period * 1e4)
        gt_lag = (
            np.asarray(align.start_times)[note_indices]
            - np.asarray(score.start_times)[note_indices]
        ) / frame_shift
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


def _main_multitrack(args, engine, out_dir):
    """Pairwise cross-conditioned timing dumps (reference
    nnsvs/bin/evaluate_timing_multitrack.py:1-211): every ordered
    same-segment singer pair (main, sub) predicts the MAIN track's
    timelag/duration through the joint models."""
    from ensemble_svs_with_interactions_tpu import gen_multitrack

    spk_names = [s for s in args.spk_names.split(",") if s]
    by_segment = {}
    # match the singer prefix against the declared names (longest first)
    # rather than a generic regex: singer names may themselves contain
    # underscores (e.g. lead_vocal_song0_seg1.lab)
    for path in sorted(Path(args.score_label_dir).glob("*.lab")):
        spk = next(
            (
                s
                for s in sorted(spk_names, key=len, reverse=True)
                if path.stem.startswith(s + "_")
            ),
            None,
        )
        if spk is not None:
            by_segment.setdefault(path.stem[len(spk) + 1 :], []).append(
                (spk, path)
            )
            continue
        m = re.match(r"^([A-Za-z0-9]+)_(.+)$", path.stem)
        if not m:
            continue
        by_segment.setdefault(m.group(2), []).append((m.group(1), path))

    lag_maes, dur_maes, n = [], [], 0
    for seg, entries in sorted(by_segment.items()):
        for i, (spk_m, path_m) in enumerate(entries):
            for j, (spk_s, path_s) in enumerate(entries):
                if i == j and len(entries) > 1:
                    continue
                score_m = hts.load(path_m)
                score_s = hts.load(path_s)
                spks = (
                    spk_names.index(spk_m) if spk_m in spk_names else 0,
                    spk_names.index(spk_s) if spk_s in spk_names else 0,
                )
                _, lag_frames, _ = gen_multitrack.predict_timelag_multitrack(
                    [score_m.copy(), score_s.copy()], spks,
                    engine.timelag_model, engine.in_timelag_scaler,
                    engine.out_timelag_scaler, engine.binary_dict,
                    engine.numeric_dict,
                    force_clip_input_features=engine._force_clip("timelag"),
                    frame_period=engine.frame_period,
                )
                durations = gen_multitrack.predict_duration_multitrack(
                    [score_m.copy(), score_s.copy()], spks,
                    engine.duration_model, engine.in_duration_scaler,
                    engine.out_duration_scaler, engine.binary_dict,
                    engine.numeric_dict,
                    force_clip_input_features=engine._force_clip("duration"),
                    frame_period=engine.frame_period,
                )
                pred_dur = (
                    durations[0] if isinstance(durations, tuple) else durations
                )
                name = f"{spk_m}_{seg}_with_{spk_s}"
                np.save(out_dir / "timelag" / f"{name}.npy", lag_frames)
                np.save(out_dir / "duration" / f"{name}.npy", pred_dur)

                align_path = Path(args.align_label_dir) / path_m.name
                if align_path.exists():
                    align = hts.load(align_path)
                    note_indices = hts.get_note_indices(score_m)
                    frame_shift = int(engine.frame_period * 1e4)
                    gt_lag = (
                        np.asarray(align.start_times)[note_indices]
                        - np.asarray(score_m.start_times)[note_indices]
                    ) / frame_shift
                    gt_dur = (
                        np.asarray(align.end_times)
                        - np.asarray(align.start_times)
                    ) / frame_shift
                    k = min(len(gt_lag), len(lag_frames))
                    lag_maes.append(
                        np.abs(lag_frames.reshape(-1)[:k] - gt_lag[:k]).mean()
                    )
                    m_ = min(len(gt_dur), len(pred_dur))
                    dur_maes.append(
                        np.abs(pred_dur.reshape(-1)[:m_] - gt_dur[:m_]).mean()
                    )
                n += 1
    if lag_maes:
        print(
            f"timelag MAE: {np.mean(lag_maes):.2f} frames, "
            f"duration MAE: {np.mean(dur_maes):.2f} frames "
            f"({n} pairs) -> {out_dir}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
