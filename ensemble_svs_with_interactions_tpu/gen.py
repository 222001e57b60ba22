"""Score-to-waveform generation pipeline.

Re-design of the reference's nnsvs/gen.py (predict_timelag :53,
predict_duration :432, postprocess_duration :723, predict_acoustic :1008,
postprocess_acoustic :1313, gen_spsvs_static_features :1899,
gen_world_params :2022, predict_waveform :1531, postprocess_waveform :1699).

TPU design:
  * Host (NumPy): linguistic featurization, note bookkeeping, duration
    normalization loops — data-dependent control flow stays out of XLA.
  * Device (jit): model inference (frame counts padded to buckets so XLA
    compiles once per bucket), MLPG, WORLD synthesis.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.base import PredictionType
from ensemble_svs_with_interactions_tpu.frontend import merlin as fe
from ensemble_svs_with_interactions_tpu.io import hts
from ensemble_svs_with_interactions_tpu.ops import world
from ensemble_svs_with_interactions_tpu.ops.multistream import (
    get_static_stream_sizes,
    get_windows,
    multi_stream_mlpg,
    split_streams,
)
from ensemble_svs_with_interactions_tpu.ops.pitch import (
    bandpass_filter,
    gen_sine_vibrato,
    interp1d,
    lowpass_filter,
)
from ensemble_svs_with_interactions_tpu.ops.sptk import mc2sp, mcepalpha
from ensemble_svs_with_interactions_tpu.models.postfilters import variance_scaling
from ensemble_svs_with_interactions_tpu.utils.scalers import MinMaxScaler

# frame-count buckets bound XLA recompilation: frame-level models pad to
# multiples of 512 frames, note/phone-level models to multiples of 64
FRAME_BUCKET = 512
PHONE_BUCKET = 64


def _round_up(n: int, multiple: int) -> int:
    return int(math.ceil(n / multiple) * multiple)


def midi_to_hz(x: np.ndarray, idx: int, log_f0: bool = False) -> np.ndarray:
    """MIDI note column -> Hz (0 stays 0), optionally log."""
    z = np.zeros(len(x))
    nz = x[:, idx] > 0
    z[nz] = 440.0 * 2.0 ** ((x[nz, idx] - 69) / 12.0)
    if log_f0:
        z[nz] = np.log(z[nz])
    return z


@dataclass
class ModelPack:
    """A model + trained variables + stream config, with bucketed jit
    inference.  The functional analogue of the reference's
    (nn.Module, config, scalers) triples."""

    module: Any
    variables: dict
    config: Any  # needs stream_sizes, has_dynamic_features, num_windows
    bucket: int = FRAME_BUCKET
    # Optional jax.sharding.Mesh: ``inference_batch`` then pads the
    # ensemble batch to the mesh size and shards it over the first mesh
    # axis (SPMD data parallelism — XLA partitions the whole program, the
    # batched scans run one track-shard per chip).  None = single-device.
    mesh: Any = None

    def __post_init__(self):
        # On accelerators behind a slow device->host link, ship outputs as
        # float16 (normalized-space values, |x| < ~10: ~1e-3 relative error,
        # far below scaler quantization) — halves the dominant D2H cost.
        # CPU keeps float32 so tests stay bit-exact.
        self._half_transfer = jax.default_backend() != "cpu"

        def _infer(method, half, sub_from_index, variables, rng, *args, **kwargs):
            # f16-uploaded feature batches (halved H2D bytes over the
            # tunnel, see inference_batch._pack) are restored to f32 before
            # the model sees them
            args = [
                a.astype(jnp.float32)
                if isinstance(a, jax.Array) and a.dtype == jnp.float16
                else a
                for a in args
            ]
            if sub_from_index:
                # the sub-track batch is a permutation of the main batch:
                # gather it on DEVICE instead of uploading it again
                x, sub_idx, *rest = args
                args = [x, jnp.take(x, sub_idx, axis=0), *rest]
            # AR decoders use prenet dropout at inference (stochastic
            # sampling), diffusion models draw their sampling chain from
            # "diffusion", postfilters from "noise"; deterministic models
            # ignore the rngs
            k1, k2, k3 = jax.random.split(rng, 3)
            out = self.module.apply(
                variables,
                *args,
                method=method,
                rngs={"prenet": k1, "diffusion": k2, "noise": k3},
                **kwargs,
            )
            if half:
                # fp16 over the device->host link (host consumers only);
                # device-resident consumers get full f32
                out = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float16)
                    if a.dtype == jnp.float32
                    else a,
                    out,
                )
            return out

        jitted = jax.jit(_infer, static_argnums=(0, 1, 2))
        self._jit_infer = partial(jitted, "inference", self._half_transfer, False)
        self._jit_infer_raw = jitted
        self._rng = jax.random.PRNGKey(1234)
        # pin weights on device once — deserialized variables are numpy
        # arrays, and passing those to jit re-uploads the full parameter set
        # on every call (disastrous over a remote-device link).  Under a
        # mesh the parameters are replicated on every device so the
        # batch-sharded program needs no weight collectives.
        self.variables = jax.device_put(self.variables, self._replicated())

    def _replicated(self):
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(self.mesh, PartitionSpec())

    def _batch_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(self.mesh, PartitionSpec(self.mesh.axis_names[0]))

    def set_mesh(self, mesh) -> "ModelPack":
        """Switch SPMD data-parallel inference on (or off with None)."""
        self.mesh = mesh
        self.variables = jax.device_put(self.variables, self._replicated())
        return self

    def prediction_type(self):
        return self.module.prediction_type()

    def _lengths_kwarg_ok(self, method: str) -> bool:
        """True when the module method accepts ``lengths`` by keyword.

        Passing lengths positionally is a footgun: for a speaker-
        conditioned signature like ``inference(x, spks, lengths)`` called
        without spks, the lengths array would silently bind to ``spks``.
        """
        import inspect

        cache = getattr(self, "_lengths_kw_cache", None)
        if cache is None:
            cache = self._lengths_kw_cache = {}
        if method not in cache:
            fn = getattr(type(self.module), method, None)
            try:
                params = inspect.signature(fn).parameters if fn else {}
            except (TypeError, ValueError):
                params = {}
            cache[method] = "lengths" in params
        return cache[method]

    def inference_batch(
        self,
        xs,
        spks=None,
        xs_sub=None,
        sub_index=None,
        method="inference",
        block=True,
        device_out=False,
    ):
        """Batched inference over a list of (T_i, D) sequences.

        All sequences are padded to a common bucketed length and run as one
        (B, T, D) batch — on TPU this amortizes the scan-latency of
        LSTM/AR decoders across the whole ensemble.  ``xs_sub`` carries the
        per-item sub-track features for multitrack (cross-conditioned)
        models, which take ``(x_main, x_sub, spks, lengths)``; when the sub
        tracks are a permutation of ``xs`` (pairwise ensembles), pass
        ``sub_index`` (per-item index into ``xs``) instead — the sub batch
        is then gathered ON DEVICE, halving the feature upload (the
        host->device tunnel measures ~57 MB/s end-to-end, so a second
        (B, T, 86) batch costs ~160 ms at bench sizes).  ``method``
        selects an alternate inference entry point on the module (e.g.
        ``inference_main`` on multitrack models).

        With ``block=False`` the call only DISPATCHES the XLA program and
        returns a zero-arg callable producing the result — dispatching
        several model calls before blocking overlaps their device time and
        hides transfer latency (one round trip instead of N).

        With ``device_out=True`` the raw full-precision device batch is
        returned as ``(out, lengths)`` without any host transfer, for
        device-resident downstream stages (the fused postprocess+vocoder
        path).
        """

        B = len(xs)
        # SPMD: pad the batch to a multiple of the mesh size so the batch
        # axis shards evenly; padding rows are zeros with length 1 (masked
        # out everywhere) and are dropped again in _finalize (range(B)).
        n_shard = int(np.prod(self.mesh.devices.shape)) if self.mesh else 1
        B_pad = _round_up(B, n_shard)

        def _put(arr):
            if self.mesh is not None:
                return jax.device_put(arr, self._batch_sharding())
            return jnp.asarray(arr)

        def _pad_rows(a):
            """Pad a leading-B array/tuple-of-arrays to B_pad rows."""
            if isinstance(a, tuple):
                return tuple(_pad_rows(x) for x in a)
            a = np.asarray(a)
            if a.shape[0] == B_pad:
                return a
            pad = np.zeros((B_pad - a.shape[0],) + a.shape[1:], a.dtype)
            return np.concatenate([a, pad], axis=0)

        def _pack(seqs, T_pad):
            b = np.zeros((B_pad, T_pad, seqs[0].shape[1]), np.float32)
            for i, s in enumerate(seqs):
                b[i, : len(s)] = s
            if self._half_transfer:
                # accelerator behind the tunnel: ship features as f16
                # (restored to f32 in-jit) — normalized inputs lose ~5e-4
                # absolute, ~1.5 cents on the lf0 score column, far below
                # the 10-cent analysis accuracy bar; CPU stays f32 for
                # bit-exact tests
                return _put(b.astype(np.float16))
            return _put(b)

        all_seqs = list(xs) + (list(xs_sub) if xs_sub is not None else [])
        T_pad = _round_up(max(len(x) for x in all_seqs), self.bucket)
        lengths = np.asarray([len(x) for x in xs], np.int32)
        args = [_pack(xs, T_pad)]
        sub_from_index = False
        if sub_index is not None:
            args.append(_put(_pad_rows(np.asarray(sub_index, np.int32))))
            sub_from_index = True
        elif xs_sub is not None:
            args.append(_pack(xs_sub, T_pad))
        if spks is not None:
            if self.mesh is not None:
                spks = jax.tree_util.tree_map(
                    lambda a: _put(_pad_rows(np.asarray(a))), spks
                )
            args.append(spks)
        # padding rows get length 1: a zero-length sequence would make
        # mask-normalized reductions divide by zero inside some models
        lengths_full = np.where(
            np.arange(B_pad) < B, _pad_rows(lengths), 1
        ).astype(np.int32)
        if self._lengths_kwarg_ok(method):
            len_args, len_kw = (), {"lengths": _put(lengths_full)}
        else:
            len_args, len_kw = (_put(lengths_full),), {}
        if device_out:
            out = self._jit_infer_raw(
                method, False, sub_from_index, self.variables, self._rng,
                *args, *len_args, **len_kw,
            )
            return out, lengths
        out = self._jit_infer_raw(
            method, self._half_transfer, sub_from_index, self.variables,
            self._rng, *args, *len_args, **len_kw,
        )

        def _finalize():
            if isinstance(out, tuple):
                # one device_get for the whole tuple: per-array fetches pay
                # a full link round trip each (latency-bound at MDN sizes)
                host_all = jax.device_get(out)
                return [
                    tuple(o[i, : lengths[i]] for o in host_all)
                    for i in range(B)
                ]
            host = np.asarray(out)
            return [host[i, : lengths[i]] for i in range(B)]

        return _finalize() if block else _finalize

    def inference(
        self,
        x: np.ndarray,
        spks=None,
        x_sub: Optional[np.ndarray] = None,
        method: str = "inference",
    ):
        """Run inference on a single (T, D) sequence with bucket padding.
        ``method`` selects an alternate module entry point (e.g.
        ``inference_main`` on multitrack models)."""
        T = x.shape[0]
        T_long = max(T, 1, 0 if x_sub is None else x_sub.shape[0])
        T_pad = _round_up(T_long, self.bucket)
        xb = np.zeros((1, T_pad, x.shape[1]), np.float32)
        xb[0, :T] = x
        args = [jnp.asarray(xb)]
        if x_sub is not None:
            xsb = np.zeros((1, T_pad, x_sub.shape[1]), np.float32)
            xsb[0, : x_sub.shape[0]] = x_sub
            args.append(jnp.asarray(xsb))
        if spks is not None:
            args.append(spks)
        lengths = jnp.asarray([T])
        jit_infer = partial(self._jit_infer_raw, method, self._half_transfer, False)
        if self._lengths_kwarg_ok(method):
            out = jit_infer(self.variables, self._rng, *args, lengths=lengths)
        else:
            out = jit_infer(self.variables, self._rng, *args, lengths)
        if isinstance(out, tuple):
            return tuple(np.asarray(o)[0, :T] for o in out)
        return np.asarray(out)[0, :T]


def _prepare_linguistic_features(
    labels,
    binary_dict,
    numeric_dict,
    in_scaler,
    pitch_indices,
    add_frame_features: bool,
    subphone_features: Optional[str],
    log_f0_conditioning: bool,
    force_clip_input_features: bool,
    frame_shift: int,
    f0_shift_in_cent: float = 0.0,
    return_raw: bool = False,
) -> np.ndarray:
    raw = fe.linguistic_features(
        labels,
        binary_dict,
        numeric_dict,
        add_frame_features=add_frame_features,
        subphone_features=subphone_features,
        frame_shift=frame_shift,
    ).astype(np.float32, copy=False)
    feats = raw.copy() if return_raw else raw
    if log_f0_conditioning:
        for idx in pitch_indices:
            feats[:, idx] = interp1d(midi_to_hz(feats, idx, True))
            if f0_shift_in_cent != 0:
                feats[:, idx] += f0_shift_in_cent * np.log(2) / 1200
    feats = np.asarray(in_scaler.transform(feats), dtype=np.float32)
    if force_clip_input_features and isinstance(in_scaler, MinMaxScaler):
        # clip everything except the pitch columns: save/restore those
        # rather than gather+scatter the (much wider) complement
        lo, hi = in_scaler.feature_range
        saved_pitch = feats[:, pitch_indices].copy()
        np.clip(feats, lo, hi, out=feats)
        feats[:, pitch_indices] = saved_pitch
    if return_raw:
        return feats, raw
    return feats


def _denorm_and_mlpg(pred, out_scaler, config, is_probabilistic: bool):
    """Shared denormalization + optional per-stream MLPG.

    MULTISTREAM_HYBRID models whose sub-decoders are all deterministic
    return a plain point-estimate array from ``inference`` (the reference
    returns ``(mu, sigma)`` with sigma unused when no dynamic features are
    modeled, acoustic_models/util.py:100-137); treat a non-tuple as mu with
    scaler variance.
    """
    has_dyn = np.any(config.has_dynamic_features)
    if is_probabilistic and not isinstance(pred, tuple):
        is_probabilistic = False
    if is_probabilistic:
        mu, sigma = pred
        if has_dyn:
            sigma_sq = np.maximum(
                np.asarray(sigma) ** 2 * np.asarray(out_scaler.var_), 1e-14
            )
            mu = np.asarray(out_scaler.inverse_transform(mu))
            return multi_stream_mlpg(
                mu,
                sigma_sq,
                get_windows(config.num_windows),
                list(config.stream_sizes),
                list(config.has_dynamic_features),
            )
        return np.asarray(out_scaler.inverse_transform(mu))
    out = np.asarray(out_scaler.inverse_transform(pred))
    if has_dyn:
        out = multi_stream_mlpg(
            out,
            np.asarray(out_scaler.var_),
            get_windows(config.num_windows),
            list(config.stream_sizes),
            list(config.has_dynamic_features),
        )
    return out


# --------------------------------------------------------------------------
# Timing
# --------------------------------------------------------------------------


def _clip_timelag(lag, note_labels, allowed_range, allowed_range_rest):
    """Round the predicted per-note timelag (frames) and clip to the
    allowed range, with the wider rest range on silence-context notes
    (reference nnsvs/gen.py predict_timelag tail)."""
    lag = np.round(lag)
    for idx in range(len(lag)):
        rng = (
            allowed_range_rest
            if hts.is_silence_context(note_labels.contexts[idx])
            else allowed_range
        )
        lag[idx] = np.clip(lag[idx], rng[0], rng[1])
    return lag


def _denorm_duration_pred(pred, duration_model, duration_out_scaler):
    """Denormalize a duration prediction.

    MDN models return real-unit ``(mu, sigma_sq)`` for the variance-scaled
    note normalization in :func:`postprocess_duration`; deterministic
    models return rounded, floor-1 durations.
    """
    if duration_model.prediction_type() == PredictionType.PROBABILISTIC:
        mu, sigma = pred
        if np.any(duration_model.config.has_dynamic_features):
            raise RuntimeError("dynamic features are not supported for durations")
        sigma_sq = np.maximum(
            np.asarray(sigma) ** 2 * np.asarray(duration_out_scaler.var_), 1e-14
        )
        mu = np.asarray(duration_out_scaler.inverse_transform(mu))
        return mu, sigma_sq
    out = _denorm_and_mlpg(pred, duration_out_scaler, duration_model.config, False)
    out[out <= 0] = 1
    return np.round(out)


def predict_timelag(
    labels,
    timelag_model: ModelPack,
    timelag_in_scaler,
    timelag_out_scaler,
    binary_dict,
    numeric_dict,
    spk=None,
    pitch_indices=None,
    log_f0_conditioning: bool = True,
    allowed_range: Sequence[int] = (-20, 20),
    allowed_range_rest: Sequence[int] = (-40, 40),
    force_clip_input_features: bool = False,
    frame_period: float = 5,
):
    """Predict note-level time-lags.  Returns (lag_in_100ns, lag_in_frames)."""
    hts_frame_shift = int(frame_period * 1e4)
    labels.frame_shift = hts_frame_shift
    if pitch_indices is None:
        pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)
    labels.round_()

    note_indices = hts.get_note_indices(labels)
    note_labels = labels[note_indices]

    feats = _prepare_linguistic_features(
        note_labels,
        binary_dict,
        numeric_dict,
        timelag_in_scaler,
        pitch_indices,
        False,
        None,
        log_f0_conditioning,
        force_clip_input_features,
        hts_frame_shift,
    )

    pred = timelag_model.inference(feats, spks=spk)
    is_prob = timelag_model.prediction_type() == PredictionType.PROBABILISTIC
    pred_timelag = _denorm_and_mlpg(
        pred, timelag_out_scaler, timelag_model.config, is_prob
    )

    pred_timelag = _clip_timelag(
        pred_timelag, note_labels, allowed_range, allowed_range_rest
    )
    return pred_timelag * hts_frame_shift, pred_timelag


def predict_duration(
    labels,
    duration_model: ModelPack,
    duration_in_scaler,
    duration_out_scaler,
    binary_dict,
    numeric_dict,
    spk=None,
    pitch_indices=None,
    log_f0_conditioning: bool = True,
    force_clip_input_features: bool = False,
    frame_period: float = 5,
):
    """Predict phoneme durations.  MDN models return (mu, sigma_sq)."""
    hts_frame_shift = int(frame_period * 1e4)
    if pitch_indices is None:
        pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)

    feats = _prepare_linguistic_features(
        labels,
        binary_dict,
        numeric_dict,
        duration_in_scaler,
        pitch_indices,
        False,
        None,
        log_f0_conditioning,
        force_clip_input_features,
        hts_frame_shift,
    )

    pred = duration_model.inference(feats, spks=spk)
    return _denorm_duration_pred(pred, duration_model, duration_out_scaler)


def postprocess_duration(labels, pred_durations, lag, frame_period: float = 5):
    """Adjust note/phoneme timing from predicted lags and durations.

    Implements the note-level duration normalization of the reference
    (nnsvs/gen.py:723-816, following arXiv:2108.02776 eqs. 11-17): per-note
    lengths are corrected by the lag difference, MDN predictions use
    variance scaling (rho) with a uniform-scaling fallback on negative
    durations.  Host-side: per-note data-dependent loop.
    """
    hts_frame_shift = int(frame_period * 1e4)
    # round on a copy: the reference mutates the caller's labels in its
    # predict_* steps (gen.py:101 round_()); computing note lengths from
    # unrounded times here would differ from the reference pipeline by a
    # frame whenever label times are off the frame grid
    labels = labels.copy()
    labels.frame_shift = hts_frame_shift
    labels.round_()
    note_indices = hts.get_note_indices(labels)
    note_indices.append(len(labels))
    is_mdn = isinstance(pred_durations, tuple) and len(pred_durations) == 2

    output = hts.HTSLabels(frame_shift=labels.frame_shift)
    d_norms = []
    for i in range(1, len(note_indices)):
        p = labels[note_indices[i - 1] : note_indices[i]]
        L = int(np.asarray(fe.duration_features(p, frame_shift=hts_frame_shift)).reshape(-1)[0])
        if i < len(note_indices) - 1:
            L_hat = L - (lag[i - 1] - lag[i]) / hts_frame_shift
        else:
            L_hat = L - lag[i - 1] / hts_frame_shift
        L_hat = max(float(np.asarray(L_hat).reshape(-1)[0]), 1.0)

        starts = np.minimum(
            np.asarray(p.start_times) + int(np.asarray(lag[i - 1]).reshape(-1)[0]),
            np.asarray(p.end_times) - hts_frame_shift * len(p),
        )
        starts = np.maximum(starts, 0)
        if len(output) > 0:
            starts = np.maximum(starts, output.start_times[-1] + hts_frame_shift)
        p.start_times = [int(s) for s in starts]

        if is_mdn:
            mu = pred_durations[0][note_indices[i - 1] : note_indices[i]]
            sigma_sq = pred_durations[1][note_indices[i - 1] : note_indices[i]]
            rho = (L_hat - mu.sum()) / sigma_sq.sum()
            d_norm = mu + rho * sigma_sq
            if np.any(d_norm <= 0):
                d_norm = L_hat * mu / mu.sum()
        else:
            d_hat = pred_durations[note_indices[i - 1] : note_indices[i]]
            d_norm = L_hat * d_hat / d_hat.sum()

        d_norm = np.round(d_norm)
        d_norm[d_norm <= 0] = 1
        d_norms += np.cumsum(d_norm.reshape(-1)).tolist()

        # assign start/end times from the normalized durations
        s0 = int(p.start_times[0])
        offsets = np.concatenate([[0], np.cumsum(d_norm.reshape(-1))]).astype(np.int64)
        p.start_times = [s0 + int(o) * hts_frame_shift for o in offsets[:-1]]
        p.end_times = [s0 + int(o) * hts_frame_shift for o in offsets[1:]]

        if len(output) > 0:
            output.end_times[-1] = p.start_times[0]
        for entry in p:
            output.append(entry, strict=False)
    return output, np.asarray(d_norms)


def predict_timing_batch(
    labels_list,
    binary_dict,
    numeric_dict,
    timelag_model: ModelPack,
    timelag_in_scaler,
    timelag_out_scaler,
    duration_model: ModelPack,
    duration_in_scaler,
    duration_out_scaler,
    log_f0_conditioning: bool = True,
    allowed_range=(-20, 20),
    allowed_range_rest=(-40, 40),
    force_clip_input_features: bool = True,
    force_clip_input_features_duration: bool = None,
    frame_period: float = 5,
):
    """Batched timing prediction over N tracks: both timing models run as
    one (N, T, D) batch (two device calls total instead of 2N).

    ``force_clip_input_features`` applies to the timelag phase;
    ``force_clip_input_features_duration`` defaults to the same value."""
    hts_frame_shift = int(frame_period * 1e4)
    pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)
    if force_clip_input_features_duration is None:
        force_clip_input_features_duration = force_clip_input_features

    note_labels_list, note_feats, phone_feats = [], [], []
    for labels in labels_list:
        labels.frame_shift = hts_frame_shift
        labels.round_()
        note_labels = labels[hts.get_note_indices(labels)]
        note_labels_list.append(note_labels)
        note_feats.append(
            _prepare_linguistic_features(
                note_labels, binary_dict, numeric_dict, timelag_in_scaler,
                pitch_indices, False, None, log_f0_conditioning,
                force_clip_input_features, hts_frame_shift,
            )
        )
        phone_feats.append(
            _prepare_linguistic_features(
                labels, binary_dict, numeric_dict, duration_in_scaler,
                pitch_indices, False, None, log_f0_conditioning,
                force_clip_input_features_duration, hts_frame_shift,
            )
        )

    # dispatch both timing models before blocking (overlapped device time)
    lag_future = timelag_model.inference_batch(note_feats, block=False)
    dur_future = duration_model.inference_batch(phone_feats, block=False)
    lag_preds = lag_future()
    dur_preds = dur_future()

    outs = []
    for labels, note_labels, lag_pred, dur_pred in zip(
        labels_list, note_labels_list, lag_preds, dur_preds
    ):
        is_prob = (
            timelag_model.prediction_type() == PredictionType.PROBABILISTIC
        )
        lag = _denorm_and_mlpg(
            lag_pred, timelag_out_scaler, timelag_model.config, is_prob
        )
        lag = _clip_timelag(lag, note_labels, allowed_range, allowed_range_rest)
        lag = lag * hts_frame_shift

        durations = _denorm_duration_pred(
            dur_pred, duration_model, duration_out_scaler
        )
        outs.append(postprocess_duration(labels, durations, lag, frame_period)[0])
    return outs


def predict_timing(
    labels,
    binary_dict,
    numeric_dict,
    timelag_model: ModelPack,
    timelag_in_scaler,
    timelag_out_scaler,
    duration_model: ModelPack,
    duration_in_scaler,
    duration_out_scaler,
    spk=None,
    log_f0_conditioning: bool = True,
    allowed_range=(-20, 20),
    allowed_range_rest=(-40, 40),
    force_clip_input_features: bool = True,
    force_clip_input_features_duration: bool = None,
    frame_period: float = 5,
):
    """predict_timelag + predict_duration + postprocess_duration.

    ``force_clip_input_features`` applies to the timelag phase;
    ``force_clip_input_features_duration`` lets the duration phase carry
    its own flag (defaults to the timelag one — the reference reads each
    phase's config independently, svs.py:341,370)."""
    hts_frame_shift = int(frame_period * 1e4)
    labels.frame_shift = hts_frame_shift
    pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)

    lag, lag_for_eval = predict_timelag(
        labels,
        timelag_model,
        timelag_in_scaler,
        timelag_out_scaler,
        binary_dict,
        numeric_dict,
        spk=spk,
        pitch_indices=pitch_indices,
        log_f0_conditioning=log_f0_conditioning,
        allowed_range=allowed_range,
        allowed_range_rest=allowed_range_rest,
        force_clip_input_features=force_clip_input_features,
        frame_period=frame_period,
    )
    durations = predict_duration(
        labels,
        duration_model,
        duration_in_scaler,
        duration_out_scaler,
        binary_dict,
        numeric_dict,
        spk=spk,
        pitch_indices=pitch_indices,
        log_f0_conditioning=log_f0_conditioning,
        force_clip_input_features=(
            force_clip_input_features
            if force_clip_input_features_duration is None
            else force_clip_input_features_duration
        ),
        frame_period=frame_period,
    )
    duration_modified_labels, d_norms = postprocess_duration(
        labels, durations, lag, frame_period
    )
    return duration_modified_labels, lag_for_eval, d_norms


# --------------------------------------------------------------------------
# Acoustic
# --------------------------------------------------------------------------


def predict_acoustic(
    labels,
    acoustic_model: ModelPack,
    acoustic_in_scaler,
    acoustic_out_scaler,
    binary_dict,
    numeric_dict,
    subphone_features: str = "coarse_coding",
    pitch_indices=None,
    log_f0_conditioning: bool = True,
    force_clip_input_features: bool = False,
    frame_period: float = 5,
    f0_shift_in_cent: float = 0,
    spk=None,
):
    """Predict acoustic features (with MLPG when deltas are modeled)."""
    hts_frame_shift = int(frame_period * 1e4)
    if pitch_indices is None:
        pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)

    feats = _prepare_linguistic_features(
        labels,
        binary_dict,
        numeric_dict,
        acoustic_in_scaler,
        pitch_indices,
        True,
        subphone_features,
        log_f0_conditioning,
        force_clip_input_features,
        hts_frame_shift,
        f0_shift_in_cent,
    )

    pred = acoustic_model.inference(feats, spks=spk)
    is_prob = acoustic_model.prediction_type() in (
        PredictionType.PROBABILISTIC,
        PredictionType.MULTISTREAM_HYBRID,
    )
    return _denorm_and_mlpg(pred, acoustic_out_scaler, acoustic_model.config, is_prob)


def correct_vuv_by_phone(vuv, binary_dict, linguistic_features):
    """Force V/UV using C-VUV_Voiced / C-VUV_Unvoiced / silence hed flags
    (reference nnsvs/gen.py:1843-1896)."""
    vuv = vuv.copy()
    voiced_idx = -1
    unvoiced_indices = []
    sil_indices = []
    for k, (name, _) in binary_dict.items():
        if "C-VUV_Voiced" in name and voiced_idx < 0:
            voiced_idx = k
        if "C-VUV_Unvoiced" in name:
            unvoiced_indices.append(k)
        if "C-Phone_sil" in name or "C-Phone_pau" in name or "C-Phone_br" in name:
            sil_indices.append(k)
    if voiced_idx > 0:
        vuv[linguistic_features[:, voiced_idx : voiced_idx + 1] > 0] = 1.0
    for idx in unvoiced_indices:
        vuv[linguistic_features[:, idx : idx + 1] > 0] = 0.0
    for idx in sil_indices:
        vuv[linguistic_features[:, idx : idx + 1] > 0] = 0.0
    return vuv


def _nonrest_frame_soft_mask(
    binary_dict,
    numeric_dict,
    linguistic_features,
    win_length: int = 200,
    duration_threshold: float = 1.0,
):
    """Soft mask ~1 on non-rest frames, ~0 on long (> threshold sec)
    sil/pau segments, smoothed with a ``win_length``-frame moving average;
    frames with an assigned note always stay 1
    (reference gen.py:1756-1808)."""
    from scipy.signal import convolve

    mask = np.ones(len(linguistic_features))
    sil_indices = [
        k
        for k, (name, _) in binary_dict.items()
        if "C-Phone_sil" in name or "C-Phone_pau" in name
    ]
    if not sil_indices:
        return mask.reshape(-1, 1)
    note_dur_idx = None
    for k, (name, _) in numeric_dict.items():
        if "e7" in name:
            note_dur_idx = k
            break
    if note_dur_idx is None:
        return mask.reshape(-1, 1)

    dur_in_sec = linguistic_features[:, len(binary_dict) + note_dur_idx] * 0.01
    for idx in sil_indices:
        mask[
            (linguistic_features[:, idx] > 0) & (dur_in_sec > duration_threshold)
        ] = 0
    mask = convolve(mask, np.ones(win_length) / win_length, mode="same")
    pitch_idx = hts.get_pitch_index(binary_dict, numeric_dict)
    score_f0 = linguistic_features[:, pitch_idx]
    mask[score_f0 > 0] = 1.0
    return mask.reshape(-1, 1)


def gen_spsvs_static_features(
    labels,
    acoustic_features: np.ndarray,
    binary_dict,
    numeric_dict,
    stream_sizes,
    has_dynamic_features,
    pitch_idx: Optional[int] = None,
    num_windows: int = 3,
    frame_period: float = 5,
    relative_f0: bool = True,
    vibrato_scale: float = 1.0,
    vuv_threshold: float = 0.3,
    force_fix_vuv: bool = True,
    linguistic_features: Optional[np.ndarray] = None,
):
    """Split static streams and reconstruct (mgc, lf0, vuv, bap)
    (reference nnsvs/gen.py:1899-2019): V/UV fixes, relative-F0 add-back,
    optional vibrato re-synthesis.  ``linguistic_features`` (raw,
    un-normalized frame features) can be passed to avoid recomputation."""
    hts_frame_shift = int(frame_period * 1e4)
    if pitch_idx is None:
        pitch_idx = hts.get_pitch_index(binary_dict, numeric_dict)

    if np.any(has_dynamic_features):
        static_stream_sizes = get_static_stream_sizes(
            stream_sizes, has_dynamic_features, num_windows
        )
    else:
        static_stream_sizes = stream_sizes

    acoustic_features = acoustic_features.copy()
    streams = split_streams(acoustic_features, list(static_stream_sizes))
    vib, vib_flags = None, None
    if len(streams) == 4:
        mgc, target_f0, vuv, bap = streams
    elif len(streams) == 5:
        mgc, target_f0, vuv, bap, vib = streams
    elif len(streams) == 6:
        mgc, target_f0, vuv, bap, vib, vib_flags = streams
    else:
        raise RuntimeError(f"unsupported number of streams: {len(streams)}")

    if linguistic_features is None:
        linguistic_features = fe.linguistic_features(
            labels,
            binary_dict,
            numeric_dict,
            add_frame_features=True,
            frame_shift=hts_frame_shift,
        )
    # align lengths defensively — trim BOTH sides, or a shorter label-
    # derived frame count leaves mismatched stream lengths downstream
    # (vuv[mask] IndexError in correct_vuv_by_phone / ragged streams)
    n = min(len(linguistic_features), len(mgc))
    linguistic_features = linguistic_features[:n]
    mgc, target_f0, vuv, bap = mgc[:n], target_f0[:n], vuv[:n], bap[:n]
    vib = vib[:n] if vib is not None else None
    vib_flags = vib_flags[:n] if vib_flags is not None else None

    if force_fix_vuv:
        vuv = correct_vuv_by_phone(vuv, binary_dict, linguistic_features)

    if relative_f0:
        diff_lf0 = target_f0
        f0_score = midi_to_hz(linguistic_features, pitch_idx, False)[:, None]
        lf0_score = f0_score.copy()
        nz = np.nonzero(lf0_score)
        lf0_score[nz] = np.log(f0_score[nz])
        lf0_score = interp1d(lf0_score)
        f0 = diff_lf0[:n] + lf0_score
        f0[vuv[:n] < vuv_threshold] = 0
        f0[np.nonzero(f0)] = np.exp(f0[np.nonzero(f0)])
    else:
        f0 = target_f0.copy()
        f0[vuv < vuv_threshold] = 0
        f0[np.nonzero(f0)] = np.exp(f0[np.nonzero(f0)])

    if vib is not None:
        sr_f0 = int(1 / (frame_period * 0.001))
        if vib_flags is not None:
            flags = vib_flags.flatten()
            m_a = vib[:, 0].copy()
            m_f = vib[:, 1].copy()
            m_a[flags < 0.5] = 0
            m_f[flags < 0.5] = 0
            f0 = gen_sine_vibrato(f0.flatten(), sr_f0, m_a, m_f, vibrato_scale)
        else:
            f0 = f0.flatten() + vibrato_scale * vib.flatten()

    lf0 = f0.copy()
    lf0[np.nonzero(lf0)] = np.log(f0[np.nonzero(lf0)])
    lf0 = interp1d(lf0)
    lf0 = lf0[:, None] if lf0.ndim == 1 else lf0
    vuv = vuv[:, None] if vuv.ndim == 1 else vuv
    return mgc, lf0, vuv, bap


def _slaney_mel_frequencies(n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """librosa.mel_frequencies equivalent (Slaney scale: linear below
    1 kHz, logarithmic above), used only for the melf0 GV offset."""
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        return np.where(
            f >= min_log_hz,
            min_log_mel + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep,
            f / f_sp,
        )

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        return np.where(
            m >= min_log_mel,
            min_log_hz * np.exp(logstep * (m - min_log_mel)),
            f_sp * m,
        )

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels)
    return mel_to_hz(mels)


def postprocess_acoustic(
    acoustic_features: np.ndarray,
    duration_modified_labels,
    binary_dict,
    numeric_dict,
    acoustic_config,
    acoustic_out_static_scaler,
    postfilter_model: Optional[ModelPack] = None,
    postfilter_out_scaler=None,
    sample_rate: int = 48000,
    frame_period: float = 5,
    relative_f0: bool = False,
    feature_type: str = "world",
    post_filter_type: str = "gv",
    trajectory_smoothing: bool = True,
    trajectory_smoothing_cutoff: float = 50,
    trajectory_smoothing_cutoff_f0: float = 20,
    vuv_threshold: float = 0.5,
    f0_shift_in_cent: float = 0,
    fill_silence_to_rest: bool = False,
    vibrato_scale: float = 1.0,
    force_fix_vuv: bool = False,
    linguistic_features: Optional[np.ndarray] = None,
):
    """Postfilter + stream reconstruction + trajectory smoothing.

    ``linguistic_features`` (raw frame-level features for the duration-
    modified labels) can be passed to skip recomputing them — the ensemble
    path extracts them once per track for the model input already.
    """
    hts_frame_shift = int(frame_period * 1e4)
    pitch_idx = hts.get_pitch_index(binary_dict, numeric_dict)
    static_stream_sizes = get_static_stream_sizes(
        acoustic_config.stream_sizes,
        acoustic_config.has_dynamic_features,
        acoustic_config.num_windows,
    )
    if linguistic_features is None:
        linguistic_features = fe.linguistic_features(
            duration_modified_labels,
            binary_dict,
            numeric_dict,
            add_frame_features=True,
            frame_shift=hts_frame_shift,
        )

    acoustic_features = np.asarray(acoustic_features).copy()
    if post_filter_type == "gv" or (
        post_filter_type == "nnsvs" and feature_type == "world"
    ):
        note_frame_indices = hts.get_note_frame_indices(
            binary_dict, numeric_dict, linguistic_features
        )
        note_frame_indices = note_frame_indices[
            note_frame_indices < len(acoustic_features)
        ]
        if feature_type == "melf0":
            # protect mel bands near F0 from GV boosting: first band
            # above 1200 Hz (reference gen.py:1402-1410 via
            # librosa.mel_frequencies)
            offset = int(
                np.argmax(
                    _slaney_mel_frequencies(80, 63.0, sample_rate / 2)
                    > 1200.0
                )
            )
        else:
            offset = 2
        mgc_end_dim = int(static_stream_sizes[0])
        acoustic_features[:, :mgc_end_dim] = variance_scaling(
            np.asarray(acoustic_out_static_scaler.var_).reshape(-1)[:mgc_end_dim],
            acoustic_features[:, :mgc_end_dim],
            offset=offset,
            note_frame_indices=note_frame_indices,
        )

    if post_filter_type == "merlin" and feature_type == "world":
        # Merlin-style mel-cepstral sharpening (reference gen.py:1494-1496
        # via nnmnkwii.postfilters.merlin_post_filter): scale cepstral
        # coefficients >= 2 by 1.4 and restore the original spectral
        # energy through the 0th coefficient.
        from ensemble_svs_with_interactions_tpu.ops.world.codec import (
            get_cheaptrick_fft_size,
        )

        mgc_end_dim = int(static_stream_sizes[0])
        mgc = acoustic_features[:, :mgc_end_dim]
        weights = np.ones(mgc_end_dim)
        weights[2:] = 1.4
        mgc_w = mgc * weights
        alpha = mcepalpha(sample_rate)
        fftlen = get_cheaptrick_fft_size(sample_rate)
        e1 = np.sum(np.asarray(mc2sp(mgc, alpha, fftlen)), axis=-1)
        e2 = np.sum(np.asarray(mc2sp(mgc_w, alpha, fftlen)), axis=-1)
        mgc_w[:, 0] += 0.5 * np.log(np.maximum(e1, 1e-16) / np.maximum(e2, 1e-16))
        acoustic_features[:, :mgc_end_dim] = mgc_w

    if post_filter_type == "nnsvs" and postfilter_model is not None:
        normed = np.asarray(postfilter_out_scaler.transform(acoustic_features))
        out = postfilter_model.inference(normed.astype(np.float32))
        acoustic_features = np.asarray(
            postfilter_out_scaler.inverse_transform(np.asarray(out))
        )

    if feature_type == "world":
        mgc, lf0, vuv, bap = gen_spsvs_static_features(
            labels=duration_modified_labels,
            acoustic_features=acoustic_features,
            binary_dict=binary_dict,
            numeric_dict=numeric_dict,
            stream_sizes=acoustic_config.stream_sizes,
            has_dynamic_features=acoustic_config.has_dynamic_features,
            pitch_idx=pitch_idx,
            num_windows=acoustic_config.num_windows,
            frame_period=frame_period,
            relative_f0=relative_f0,
            vibrato_scale=vibrato_scale,
            vuv_threshold=vuv_threshold,
            force_fix_vuv=force_fix_vuv,
            linguistic_features=linguistic_features,
        )
    elif feature_type == "melf0":
        mel, lf0, vuv = split_streams(acoustic_features, [80, 1, 1])
    else:
        raise ValueError(f"unknown feature type: {feature_type}")

    if fill_silence_to_rest:
        # suppress model leakage in long rests: crossfade spectral params
        # toward a silence estimate on long sil/pau segments
        # (reference gen.py:1480-1487, 1756-1841)
        mask = _nonrest_frame_soft_mask(
            binary_dict, numeric_dict, linguistic_features
        )
        if feature_type == "world":
            mgc_sil = np.zeros((1, mgc.shape[1]))
            mgc_sil[0, 0] = -23.3
            mgc_sil[0, 1] = 0.0679
            mgc_sil[0, 2] = 0.00640
            mgc_sil[0, 3:] = 1e-3
            mgc = mgc * mask + (1 - mask) * mgc_sil
            bap = bap * mask + (1 - mask) * 1e-11
        else:
            mel = mel * mask + (1 - mask) * (-5.5)

    if f0_shift_in_cent != 0:
        lf0 = lf0 + f0_shift_in_cent * np.log(2) / 1200

    if trajectory_smoothing:
        modfs = int(1 / (frame_period * 0.001))
        lf0[:, 0] = lowpass_filter(lf0[:, 0], modfs, cutoff=trajectory_smoothing_cutoff_f0)
        if feature_type == "world":
            mgc = np.ascontiguousarray(
                lowpass_filter(mgc, modfs, cutoff=trajectory_smoothing_cutoff, axis=0)
            )
            bap = np.ascontiguousarray(
                lowpass_filter(bap, modfs, cutoff=trajectory_smoothing_cutoff, axis=0)
            )
        else:
            mel = np.ascontiguousarray(
                lowpass_filter(mel, modfs, cutoff=trajectory_smoothing_cutoff, axis=0)
            )

    if feature_type == "world":
        use_mcep_aperiodicity = bap.shape[-1] > 5
        if not use_mcep_aperiodicity:
            bap = np.clip(bap, -60, 0)
        return mgc, lf0, vuv, bap
    return mel, lf0, vuv


# --------------------------------------------------------------------------
# Waveform
# --------------------------------------------------------------------------


def gen_world_params(
    mgc,
    lf0,
    vuv,
    bap,
    sample_rate: int,
    vuv_threshold: float = 0.3,
    use_world_codec: bool = False,
):
    """(mgc, lf0, vuv, bap) -> (f0, spectrogram, aperiodicity)."""
    fftlen = world.get_cheaptrick_fft_size(sample_rate)
    use_mcep_aperiodicity = bap.shape[-1] > 5

    if use_world_codec:
        spectrogram = np.asarray(
            world.decode_spectral_envelope(
                np.ascontiguousarray(mgc).astype(np.float64), sample_rate, fftlen
            )
        )
    else:
        alpha = mcepalpha(sample_rate)
        spectrogram = np.asarray(mc2sp(np.ascontiguousarray(mgc), alpha, fftlen))

    if use_mcep_aperiodicity:
        alpha = mcepalpha(sample_rate)
        aperiodicity = np.asarray(mc2sp(np.ascontiguousarray(bap), alpha, fftlen))
    else:
        aperiodicity = np.asarray(
            world.decode_aperiodicity(
                np.ascontiguousarray(bap).astype(np.float64), sample_rate, fftlen
            )
        )

    aperiodicity[vuv.reshape(-1) < vuv_threshold, 0] = 1.0
    aperiodicity = np.clip(aperiodicity, 0.0, 1.0)

    f0 = lf0.copy()
    f0[np.nonzero(f0)] = np.exp(f0[np.nonzero(f0)])
    f0[vuv < vuv_threshold] = 0
    return f0.flatten().astype(np.float64), spectrogram, aperiodicity


def predict_waveform(
    multistream_features,
    vocoder: Optional[ModelPack] = None,
    vocoder_in_scaler=None,
    sample_rate: int = 48000,
    frame_period: float = 5,
    use_world_codec: bool = True,
    feature_type: str = "world",
    vocoder_type: str = "world",
    vuv_threshold: float = 0.5,
    key=None,
):
    """Synthesize a waveform with WORLD (TPU kernel) or a neural vocoder."""
    if feature_type == "world":
        mgc, lf0, vuv, bap = multistream_features
    elif feature_type == "world_org":
        f0, spectrogram, aperiodicity = multistream_features
    elif feature_type == "melf0":
        mel, lf0, vuv = multistream_features
    else:
        raise ValueError(f"unknown feature type: {feature_type}")

    if vocoder_type == "world":
        if feature_type not in ("world", "world_org"):
            raise ValueError(f"invalid feature type for WORLD vocoder: {feature_type}")
        use_mcep_ap = feature_type == "world" and bap.shape[-1] > 5
        if feature_type == "world" and use_world_codec and not use_mcep_ap:
            # fused device path: codecs + V/UV gating + synthesis in one jit
            T = len(lf0)
            T_pad = _round_up(max(T, 1), FRAME_BUCKET)
            pad = T_pad - T
            mgc_p = np.pad(mgc, ((0, pad), (0, 0)), mode="edge")
            lf0_p = np.pad(lf0, ((0, pad), (0, 0)), mode="edge")
            vuv_p = np.pad(vuv, ((0, pad), (0, 0)))
            bap_p = np.pad(bap, ((0, pad), (0, 0)), mode="edge")
            wav = np.asarray(
                world.synthesize_from_streams(
                    mgc_p, lf0_p, vuv_p, bap_p, sample_rate, frame_period,
                    vuv_threshold=vuv_threshold, key=key,
                )
            )
            hop = int(sample_rate * frame_period / 1000)
            return wav[: T * hop]
        if feature_type == "world":
            f0, spectrogram, aperiodicity = gen_world_params(
                mgc,
                lf0,
                vuv,
                bap,
                sample_rate,
                vuv_threshold=vuv_threshold,
                use_world_codec=use_world_codec,
            )
        # pad frame count to a bucket so XLA compiles once per bucket
        T = len(f0)
        T_pad = _round_up(max(T, 1), FRAME_BUCKET)
        pad = T_pad - T
        f0p = np.pad(f0, (0, pad))
        spp = np.pad(spectrogram, ((0, pad), (0, 0)), mode="edge")
        app = np.pad(aperiodicity, ((0, pad), (0, 0)), constant_values=1.0)
        wav = np.asarray(
            world.synthesize(f0p, spp, app, sample_rate, frame_period, key=key)
        )
        hop = int(sample_rate * frame_period / 1000)
        return wav[: T * hop]
    elif vocoder_type == "pwg":
        if vocoder is None:
            raise ValueError("a neural vocoder model is required for pwg")
        vuv_bin = (vuv > vuv_threshold).astype(np.float32)
        if feature_type == "world":
            voc_in = np.concatenate([mgc, lf0, vuv_bin, bap], axis=-1)
        else:
            voc_in = np.concatenate([mel, lf0, vuv_bin], axis=-1)
        if vocoder_in_scaler is not None:
            voc_in = np.asarray(
                vocoder_in_scaler.transform(voc_in), dtype=np.float32
            )
        return np.asarray(vocoder.inference(voc_in)).reshape(-1)
    elif vocoder_type == "usfgan":
        # source-filter vocoder: sine source from F0 + [mgc, bap] aux feats
        # (reference gen.py:1637-1694)
        if vocoder is None:
            raise ValueError("a USFGANWrapper is required for usfgan")
        if feature_type == "world":
            fftlen = world.get_cheaptrick_fft_size(sample_rate)
            aperiodicity = np.asarray(
                world.decode_aperiodicity(
                    np.ascontiguousarray(bap).astype(np.float64), sample_rate, fftlen
                )
            )
            aperiodicity[vuv.reshape(-1) < vuv_threshold, 0] = 1.0
            aperiodicity = np.clip(aperiodicity, 0.0, 1.0)
            bap_fixed = np.asarray(
                world.code_aperiodicity(aperiodicity, sample_rate)
            ).astype(np.float32)
            aux_feats = np.concatenate([mgc, bap_fixed], axis=-1)
        else:
            aux_feats = mel
        if vocoder_in_scaler is not None:
            aux_feats = np.asarray(
                vocoder_in_scaler.transform(aux_feats), dtype=np.float32
            )
        contf0 = np.exp(lf0)
        if getattr(vocoder, "sine_f0_type", "contf0") == "f0":
            contf0 = contf0.copy()
            contf0[vuv < vuv_threshold] = 0
        return np.asarray(vocoder.inference(contf0, aux_feats)).reshape(-1)
    raise ValueError(f"unknown vocoder type: {vocoder_type}")


def postprocess_waveform(
    wav: np.ndarray,
    sample_rate: int,
    dtype=np.int16,
    peak_norm: bool = False,
    loudness_norm: bool = False,
    target_loudness: float = -20.0,
    skip_bandpass: bool = False,
):
    """Bandpass + peak/loudness normalization + dtype conversion.

    ``skip_bandpass`` is used when the high-pass was already applied inside
    the fused vocoder kernel (synthesize_from_streams highpass_cutoff).
    """
    if not skip_bandpass:
        wav = np.asarray(bandpass_filter(wav, sample_rate))
    else:
        wav = np.asarray(wav, dtype=np.float64)

    if peak_norm:
        peak = np.max(np.abs(wav))
        if peak > 0:
            wav = wav / peak
    if loudness_norm:
        # simple RMS-based loudness normalization (pyloudnorm-free)
        rms = np.sqrt(np.mean(wav**2))
        if rms > 0:
            current_db = 20 * np.log10(rms)
            wav = wav * 10 ** ((target_loudness - current_db) / 20)

    peak = np.max(np.abs(wav))
    if peak > 0:
        wav = wav / peak
    if dtype in (np.int16, "int16"):
        wav = (wav * 32767.0).astype(np.int16)
    elif dtype is not None:
        wav = wav.astype(dtype)
    return wav
