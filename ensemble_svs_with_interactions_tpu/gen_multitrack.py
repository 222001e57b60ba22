"""Multi-track generation pipeline: cross-singer timing and acoustics.

Parity targets: /root/reference/nnsvs/gen.py predict_timelag_multitrack
(:215-428, with the two-pointer note merge at :317-356),
predict_duration_multitrack (:551-720), predict_timing_multitrack
(:912-1005), predict_acoustic_multitrack (:1160-1310).

The note merge is shared with training
(data/multitrack.merge_tracks_by_notes); inference merges the two tracks'
note-level features into a common timeline, runs the joint model on
``concat(x_main, x_sub)``, and un-merges via the main-track presence mask.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu import gen
from ensemble_svs_with_interactions_tpu.base import PredictionType
from ensemble_svs_with_interactions_tpu.data.multitrack import (
    merge_tracks_by_notes,
)
from ensemble_svs_with_interactions_tpu.frontend import merlin as fe
from ensemble_svs_with_interactions_tpu.io import hts
from ensemble_svs_with_interactions_tpu.ops.pitch import interp1d


def _note_level_features(
    labels,
    binary_dict,
    numeric_dict,
    in_scaler,
    pitch_indices,
    log_f0_conditioning,
    force_clip,
    frame_shift,
):
    note_indices = hts.get_note_indices(labels)
    note_labels = labels[note_indices]
    feats = gen._prepare_linguistic_features(
        note_labels,
        binary_dict,
        numeric_dict,
        in_scaler,
        pitch_indices,
        False,
        None,
        log_f0_conditioning,
        force_clip,
        frame_shift,
    )
    times = np.asarray(note_labels.start_times)
    return feats, times, note_labels


def _merged_timing_inference(
    labels_list,
    spks_list,
    model: gen.ModelPack,
    in_scaler,
    out_scaler,
    binary_dict,
    numeric_dict,
    pitch_indices,
    log_f0_conditioning,
    force_clip,
    frame_shift,
):
    """Shared note-merge + joint MDN inference for timelag/duration.

    Returns (mu, sigma_sq, mask0, note_labels_main): mu/sigma over the MAIN
    track's note positions only.
    """
    feats0, times0, note_labels0 = _note_level_features(
        labels_list[0], binary_dict, numeric_dict, in_scaler, pitch_indices,
        log_f0_conditioning, force_clip, frame_shift,
    )
    feats1, times1, _ = _note_level_features(
        labels_list[1], binary_dict, numeric_dict, in_scaler, pitch_indices,
        log_f0_conditioning, force_clip, frame_shift,
    )
    dummy0 = np.zeros((len(feats0), 1), np.float32)
    dummy1 = np.zeros((len(feats1), 1), np.float32)
    mx0, _, mask0, mx1, _, _ = merge_tracks_by_notes(
        feats0, dummy0, times0, feats1, dummy1, times1
    )
    x = np.concatenate([mx0, mx1], axis=-1)
    spks = (
        jnp.asarray([spks_list[0]], jnp.int32),
        jnp.asarray([spks_list[1]], jnp.int32),
    )
    pred = model.inference(x, spks=spks)
    if model.prediction_type() == PredictionType.PROBABILISTIC:
        mu, sigma = pred
        if np.any(model.config.has_dynamic_features):
            # MLPG over the MERGED timeline, then un-merge
            # (reference gen.py:364-411)
            out = gen._denorm_and_mlpg((mu, sigma), out_scaler, model.config, True)
            return out[mask0], None, mask0, note_labels0
        sigma_sq = np.maximum(
            np.asarray(sigma) ** 2 * np.asarray(out_scaler.var_), 1e-14
        )
        mu = np.asarray(out_scaler.inverse_transform(np.asarray(mu)))
        return mu[mask0], sigma_sq[mask0], mask0, note_labels0
    out = gen._denorm_and_mlpg(pred, out_scaler, model.config, False)
    return out[mask0], None, mask0, note_labels0


def predict_timelag_multitrack(
    labels_list,
    spks_list,
    timelag_model: gen.ModelPack,
    timelag_in_scaler,
    timelag_out_scaler,
    binary_dict,
    numeric_dict,
    pitch_indices=None,
    log_f0_conditioning: bool = True,
    allowed_range: Sequence[int] = (-20, 20),
    allowed_range_rest: Sequence[int] = (-40, 40),
    force_clip_input_features: bool = True,  # reference shipped configs default true
    frame_period: float = 5,
):
    """Note-level time-lag for the main track, conditioned on both tracks."""
    hts_frame_shift = int(frame_period * 1e4)
    for labels in labels_list:
        labels.frame_shift = hts_frame_shift
        labels.round_()
    if pitch_indices is None:
        pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)

    mu, sigma_sq, mask0, note_labels = _merged_timing_inference(
        labels_list, spks_list, timelag_model, timelag_in_scaler,
        timelag_out_scaler, binary_dict, numeric_dict, pitch_indices,
        log_f0_conditioning, force_clip_input_features, hts_frame_shift,
    )
    pred = np.round(mu)
    for idx in range(len(pred)):
        rng = (
            allowed_range_rest
            if hts.is_silence_context(note_labels.contexts[idx])
            else allowed_range
        )
        pred[idx] = np.clip(pred[idx], rng[0], rng[1])
    return pred * hts_frame_shift, pred, mask0


def predict_duration_multitrack(
    labels_list,
    spks_list,
    duration_model: gen.ModelPack,
    duration_in_scaler,
    duration_out_scaler,
    binary_dict,
    numeric_dict,
    pitch_indices=None,
    log_f0_conditioning: bool = True,
    force_clip_input_features: bool = True,  # reference shipped configs default true
    frame_period: float = 5,
):
    """Phone-level durations for the main track (joint two-track model)."""
    hts_frame_shift = int(frame_period * 1e4)
    if pitch_indices is None:
        pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)

    # durations are phone-level: merge over phone start times
    feats0 = gen._prepare_linguistic_features(
        labels_list[0], binary_dict, numeric_dict, duration_in_scaler,
        pitch_indices, False, None, log_f0_conditioning,
        force_clip_input_features, hts_frame_shift,
    )
    feats1 = gen._prepare_linguistic_features(
        labels_list[1], binary_dict, numeric_dict, duration_in_scaler,
        pitch_indices, False, None, log_f0_conditioning,
        force_clip_input_features, hts_frame_shift,
    )
    times0 = np.asarray(labels_list[0].start_times)
    times1 = np.asarray(labels_list[1].start_times)
    d0 = np.zeros((len(feats0), 1), np.float32)
    d1 = np.zeros((len(feats1), 1), np.float32)
    mx0, _, mask0, mx1, _, _ = merge_tracks_by_notes(
        feats0, d0, times0, feats1, d1, times1
    )
    x = np.concatenate([mx0, mx1], axis=-1)
    spks = (
        jnp.asarray([spks_list[0]], jnp.int32),
        jnp.asarray([spks_list[1]], jnp.int32),
    )
    pred = duration_model.inference(x, spks=spks)
    if duration_model.prediction_type() == PredictionType.PROBABILISTIC:
        mu, sigma = pred
        sigma_sq = np.maximum(
            np.asarray(sigma) ** 2 * np.asarray(duration_out_scaler.var_), 1e-14
        )
        mu = np.asarray(duration_out_scaler.inverse_transform(np.asarray(mu)))
        return mu[mask0], sigma_sq[mask0]
    out = np.asarray(duration_out_scaler.inverse_transform(np.asarray(pred)))
    out = out[mask0]
    out[out <= 0] = 1
    return np.round(out)


def predict_timing_multitrack_batch(
    labels_list,
    spk_ids,
    pairs,
    binary_dict,
    numeric_dict,
    timelag_model: gen.ModelPack,
    timelag_in_scaler,
    timelag_out_scaler,
    duration_model: gen.ModelPack,
    duration_in_scaler,
    duration_out_scaler,
    log_f0_conditioning: bool = True,
    allowed_range=(-20, 20),
    allowed_range_rest=(-40, 40),
    force_clip_input_features: bool = True,
    force_clip_input_features_duration: bool = None,
    frame_period: float = 5,
):
    """Batched cross-conditioned timing for an N-part ensemble.

    Track ``i`` is the main track of pair ``(i, pairs[i])``; every pair runs
    through the joint timelag model (note level) and the joint duration
    model (phone level) as ONE (N, T, D) batch each — two device calls for
    the whole ensemble instead of 2N (reference synthesis_multitrack.py
    loops predict_timing_multitrack per pair).

    Returns a list of duration-modified label sequences, one per track.
    """
    hts_frame_shift = int(frame_period * 1e4)
    pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)
    N = len(labels_list)
    force_clip_duration = (
        force_clip_input_features
        if force_clip_input_features_duration is None
        else force_clip_input_features_duration
    )

    def _prep_track(labels):
        labels.frame_shift = hts_frame_shift
        labels.round_()
        nl = labels[hts.get_note_indices(labels)]
        tl_feats = gen._prepare_linguistic_features(
            nl, binary_dict, numeric_dict, timelag_in_scaler,
            pitch_indices, False, None, log_f0_conditioning,
            force_clip_input_features, hts_frame_shift,
        )
        du_feats = gen._prepare_linguistic_features(
            labels, binary_dict, numeric_dict, duration_in_scaler,
            pitch_indices, False, None, log_f0_conditioning,
            force_clip_duration, hts_frame_shift,
        )
        return nl, tl_feats, np.asarray(nl.start_times), du_feats, np.asarray(
            labels.start_times
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=N) as ex:
        prepped = list(ex.map(_prep_track, labels_list))
    note_labels = [p[0] for p in prepped]
    note_tl_feats = [p[1] for p in prepped]
    note_times = [p[2] for p in prepped]
    phone_du_feats = [p[3] for p in prepped]
    phone_times = [p[4] for p in prepped]

    def _merged_pairs(feats, times):
        xs, masks = [], []
        for i in range(N):
            j = pairs[i]
            d_i = np.zeros((len(feats[i]), 1), np.float32)
            d_j = np.zeros((len(feats[j]), 1), np.float32)
            mx0, _, mask0, mx1, _, _ = merge_tracks_by_notes(
                feats[i], d_i, times[i], feats[j], d_j, times[j]
            )
            xs.append(np.concatenate([mx0, mx1], axis=-1))
            masks.append(mask0)
        return xs, masks

    spks = (
        jnp.asarray([spk_ids[i] for i in range(N)], jnp.int32),
        jnp.asarray([spk_ids[pairs[i]] for i in range(N)], jnp.int32),
    )

    # dispatch both timing models before blocking: their device programs
    # overlap and the host pays one transfer round trip instead of two
    tl_xs, tl_masks = _merged_pairs(note_tl_feats, note_times)
    tl_future = timelag_model.inference_batch(tl_xs, spks=spks, block=False)
    du_xs, du_masks = _merged_pairs(phone_du_feats, phone_times)
    du_future = duration_model.inference_batch(du_xs, spks=spks, block=False)
    tl_preds = tl_future()
    du_preds = du_future()

    tl_prob = timelag_model.prediction_type() == PredictionType.PROBABILISTIC

    outs = []
    for i in range(N):
        # MLPG (when delta windows are modeled) runs over the MERGED
        # timeline before un-merging (reference gen.py:364-411)
        lag = gen._denorm_and_mlpg(
            tl_preds[i], timelag_out_scaler, timelag_model.config, tl_prob
        )
        lag = gen._clip_timelag(
            lag[tl_masks[i]], note_labels[i], allowed_range, allowed_range_rest
        )
        lag = lag * hts_frame_shift

        durations = gen._denorm_duration_pred(
            du_preds[i], duration_model, duration_out_scaler
        )
        if isinstance(durations, tuple):  # MDN: un-merge mu and sigma_sq
            durations = (durations[0][du_masks[i]], durations[1][du_masks[i]])
        else:
            durations = durations[du_masks[i]]
        outs.append(
            gen.postprocess_duration(labels_list[i], durations, lag, frame_period)[0]
        )
    return outs


def predict_timing_multitrack(
    labels_list,
    spks_list,
    binary_dict,
    numeric_dict,
    timelag_model: gen.ModelPack,
    timelag_in_scaler,
    timelag_out_scaler,
    duration_model: gen.ModelPack,
    duration_in_scaler,
    duration_out_scaler,
    log_f0_conditioning: bool = True,
    allowed_range=(-20, 20),
    allowed_range_rest=(-40, 40),
    force_clip_input_features: bool = True,
    force_clip_input_features_duration: bool = None,
    frame_period: float = 5,
):
    """timelag + duration + duration normalization on the main track.

    ``force_clip_input_features`` applies to the timelag phase;
    ``force_clip_input_features_duration`` defaults to the same value."""
    hts_frame_shift = int(frame_period * 1e4)
    for labels in labels_list:
        labels.frame_shift = hts_frame_shift
    pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)

    lag, lag_for_eval, mask = predict_timelag_multitrack(
        labels_list, spks_list, timelag_model, timelag_in_scaler,
        timelag_out_scaler, binary_dict, numeric_dict,
        pitch_indices=pitch_indices,
        log_f0_conditioning=log_f0_conditioning,
        allowed_range=allowed_range,
        allowed_range_rest=allowed_range_rest,
        force_clip_input_features=force_clip_input_features,
        frame_period=frame_period,
    )
    durations = predict_duration_multitrack(
        labels_list, spks_list, duration_model, duration_in_scaler,
        duration_out_scaler, binary_dict, numeric_dict,
        pitch_indices=pitch_indices,
        log_f0_conditioning=log_f0_conditioning,
        force_clip_input_features=(
            force_clip_input_features
            if force_clip_input_features_duration is None
            else force_clip_input_features_duration
        ),
        frame_period=frame_period,
    )
    duration_modified_labels, d_norms = gen.postprocess_duration(
        labels_list[0], durations, lag, frame_period
    )
    return duration_modified_labels, lag_for_eval, d_norms, mask


def predict_acoustic_multitrack(
    labels_list,
    spks_list,
    acoustic_model: gen.ModelPack,
    acoustic_in_scaler,
    acoustic_out_scaler,
    binary_dict,
    numeric_dict,
    subphone_features: str = "coarse_coding",
    pitch_indices=None,
    log_f0_conditioning: bool = True,
    force_clip_input_features: bool = True,  # reference shipped configs default true
    frame_period: float = 5,
    f0_shift_in_cent: float = 0,
):
    """Frame-level acoustic features for the main track, conditioned on the
    sub track.  Tracks are padded to a common frame count."""
    hts_frame_shift = int(frame_period * 1e4)
    if pitch_indices is None:
        pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)

    feats = []
    for labels in labels_list:
        f = gen._prepare_linguistic_features(
            labels, binary_dict, numeric_dict, acoustic_in_scaler,
            pitch_indices, True, subphone_features, log_f0_conditioning,
            force_clip_input_features, hts_frame_shift, f0_shift_in_cent,
        )
        feats.append(f)
    T = max(len(f) for f in feats)
    x0 = np.pad(feats[0], ((0, T - len(feats[0])), (0, 0)))
    x1 = np.pad(feats[1], ((0, T - len(feats[1])), (0, 0)))

    spks = (
        jnp.asarray([spks_list[0]], jnp.int32),
        jnp.asarray([spks_list[1]], jnp.int32),
    )
    # main-track-only inference where available (sub-track outputs are
    # discarded here — see multistream.inference_main, ~2x less compute)
    use_main = hasattr(acoustic_model.module, "inference_main")
    pred = acoustic_model.inference(
        x0, spks=spks, x_sub=x1,
        method="inference_main" if use_main else "inference",
    )
    is_prob = acoustic_model.prediction_type() in (
        PredictionType.PROBABILISTIC,
        PredictionType.MULTISTREAM_HYBRID,
    )
    if not use_main and isinstance(pred, tuple) and (
        acoustic_model.prediction_type() != PredictionType.PROBABILISTIC
    ):
        # full multitrack inference returns (out_main, out_sub) point
        # estimates; only PROBABILISTIC models return (mu, sigma)
        pred = pred[0]
    n = len(feats[0])
    if isinstance(pred, tuple):
        pred = tuple(np.asarray(p)[:n] for p in pred)
    else:
        pred = np.asarray(pred)[:n]
    # shared denorm + optional per-stream MLPG (reference gen.py:1249-1283:
    # PROBABILISTIC models solve MLPG with the predicted sigma)
    return gen._denorm_and_mlpg(
        pred, acoustic_out_scaler, acoustic_model.config, is_prob
    )
