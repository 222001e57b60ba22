"""Packaged-model SVS engines.

Re-design of the reference's nnsvs/svs.py (BaseSVS :35, SPSVS :61): a
packed-model directory holds everything needed for inference.

Packed directory layout (mirrors the reference's pack_model.sh output,
with flax msgpack parameters instead of torch .pth):

    config.yaml                        # sample_rate, frame_period, ...
    qst.hed                            # question set
    {timelag,duration,acoustic}_model.yaml     # netG config + stream info
    {timelag,duration,acoustic}_model.params   # flax msgpack variables
    in_{phase}_scaler_{min,scale}.npy          # MinMax input scalers
    out_{phase}_scaler_{mean,var,scale}.npy    # Standard output scalers
    [postfilter_model.{yaml,params}, vocoder_model.{yaml,params}, ...]

Real-time factors are logged per stage (the reference's headline metric,
svs.py:327-345,448-452,578-582,743-745).
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Optional

import numpy as np
from flax import serialization

from ensemble_svs_with_interactions_tpu import gen, gen_multitrack
from ensemble_svs_with_interactions_tpu.base import PredictionType
from ensemble_svs_with_interactions_tpu.io import hts
from ensemble_svs_with_interactions_tpu.utils.config import (
    Config,
    instantiate,
    load_config,
)
from ensemble_svs_with_interactions_tpu.utils.scalers import (
    MinMaxScaler,
    StandardScaler,
    extract_static_scaler,
)
from ensemble_svs_with_interactions_tpu.utils.logger import getLogger


def jnp_lengths(lengths):
    import jax.numpy as jnp

    return jnp.asarray(lengths)


def _load_variables(module, config, params_path: Path):
    """Deserialize flax variables against a template built from the module
    (signature-dispatched in utils/templates.init_template)."""
    from ensemble_svs_with_interactions_tpu.utils.templates import init_template

    template = init_template(
        module,
        config.netG.get("in_dim", 82),
        config.netG.get("out_dim", 1),
    )
    with open(params_path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_vocoder(model_dir, sample_rate: int, frame_period: float = 5.0):
    """Load a packed neural vocoder (reference nnsvs/util.py:377-458).

    Reads ``vocoder_model.yaml`` + ``vocoder_model.params`` from
    ``model_dir`` and returns ``(vocoder, in_scaler, vocoder_type)``:
    uSFGAN-family generators come back as a :class:`USFGANWrapper`
    (type "usfgan"); other generators (PWG/WaveNet-like, taking frame
    features) as a jitted pack with ``.inference`` (type "pwg").
    """
    import jax
    import jax.numpy as jnp

    model_dir = Path(model_dir)
    cfg = load_config(model_dir / "vocoder_model.yaml")
    module = instantiate(cfg.netG)
    name = type(module).__name__
    hop_size = int(sample_rate * frame_period / 1000.0)

    in_scaler = None
    if (model_dir / "in_vocoder_scaler_mean.npy").exists():
        in_scaler = StandardScaler(
            np.load(model_dir / "in_vocoder_scaler_mean.npy"),
            np.load(model_dir / "in_vocoder_scaler_var.npy"),
            np.load(model_dir / "in_vocoder_scaler_scale.npy"),
        )

    if "USFGAN" in name or "SiFiGAN" in name:
        from ensemble_svs_with_interactions_tpu.models.vocoders.usfgan import (
            USFGANWrapper,
        )

        signal_types = tuple(
            cfg.get("signal_types", ["sine", "noise"] if "Hn" in name else ["sine"])
        )
        # SiFiGANGenerator exposes a flat upsample_scales field; uSFGAN
        # configs nest it under upsample_params
        scales = cfg.netG.get("upsample_scales") or dict(
            cfg.netG.get("upsample_params") or {"upsample_scales": [5, 4, 3, 2]}
        ).get("upsample_scales", [5, 4, 3, 2])
        up = int(np.prod(list(scales)))
        aux = int(cfg.netG.get("aux_channels", 80))
        Tf = 4
        x = jnp.zeros((1, Tf * up, len(signal_types)), jnp.float32)
        c = jnp.zeros((1, Tf, aux), jnp.float32)
        d = jnp.ones((1, Tf * up), jnp.float32)
        template = module.init(jax.random.PRNGKey(0), x, c, d)
        with open(model_dir / "vocoder_model.params", "rb") as f:
            variables = serialization.from_bytes(template, f.read())
        wrapper = USFGANWrapper(
            module,
            jax.device_put(variables),
            sample_rate=sample_rate,
            hop_size=hop_size,
            sine_amp=float(cfg.get("sine_amp", 0.1)),
            noise_amp=float(cfg.get("noise_amp", 0.003)),
            signal_types=signal_types,
            dense_factor=int(cfg.get("dense_factor", 4)),
            sine_f0_type=str(cfg.get("sine_f0_type", "contf0")),
        )
        return wrapper, in_scaler, "usfgan"

    # frame-features -> waveform generators (PWG-style inference(c))
    in_dim = int(cfg.netG.get("aux_channels", cfg.netG.get("in_dim", 80)))
    c = jnp.zeros((1, 8, in_dim), jnp.float32)
    if name == "PWGGenerator":
        ups = cfg.netG.get("upsample_scales") or [5, 4, 3, 2]
        up = int(np.prod(list(ups)))
        x = jnp.zeros((1, 8 * up, 1), jnp.float32)
        template = module.init(jax.random.PRNGKey(0), x, c)
    else:
        template = module.init(jax.random.PRNGKey(0), c)
    with open(model_dir / "vocoder_model.params", "rb") as f:
        variables = serialization.from_bytes(template, f.read())
    variables = jax.device_put(variables)

    class _Pack:
        def __init__(self, module, variables):
            self.module = module
            self.variables = variables
            self._jit = jax.jit(
                lambda v, c: module.apply(v, c, method="inference")
            )

        def inference(self, c):
            return self._jit(self.variables, jnp.asarray(np.asarray(c)[None]))[0]

    return _Pack(module, variables), in_scaler, "pwg"


class BaseSVS:
    """All SVS engines accept HTS labels and return (waveform, sr)."""

    def svs(self, labels, *args, **kwargs):
        raise NotImplementedError


class SPSVS(BaseSVS):
    """Statistical-parametric SVS engine over a packed model directory."""

    def __init__(self, model_dir, verbose: int = 0):
        self.logger = getLogger(verbose=verbose)
        model_dir = Path(model_dir)
        self.model_dir = model_dir
        self.config = load_config(model_dir / "config.yaml")
        self.feature_type = self.config.get("feature_type", "world")
        self.sample_rate = int(self.config.get("sample_rate", 48000))
        self.frame_period = float(self.config.get("frame_period", 5))

        self.binary_dict, self.numeric_dict = hts.load_question_set(
            model_dir / "qst.hed"
        )
        self.pitch_idx = hts.get_pitch_index(self.binary_dict, self.numeric_dict)
        self.pitch_indices = hts.get_pitch_indices(self.binary_dict, self.numeric_dict)

        self.timelag_model = self._load_model("timelag", bucket=gen.PHONE_BUCKET)
        self.duration_model = self._load_model("duration", bucket=gen.PHONE_BUCKET)
        self.acoustic_model = self._load_model("acoustic", bucket=gen.FRAME_BUCKET)

        self.in_timelag_scaler = self._load_minmax("in_timelag")
        self.out_timelag_scaler = self._load_standard("out_timelag")
        self.in_duration_scaler = self._load_minmax("in_duration")
        self.out_duration_scaler = self._load_standard("out_duration")
        self.in_acoustic_scaler = self._load_minmax("in_acoustic")
        self.out_acoustic_scaler = self._load_standard("out_acoustic")

        self.acoustic_out_static_scaler = extract_static_scaler(
            self.out_acoustic_scaler,
            self.acoustic_model.config.stream_sizes,
            self.acoustic_model.config.has_dynamic_features,
            self.acoustic_model.config.num_windows,
        )

        # multitrack (cross-conditioned) packs: the acoustic netG takes
        # (x_main, x_sub, spks, lengths) and timing netGs take a spk tuple
        # (reference nnsvs/bin/synthesis_multitrack.py:30-289)
        import inspect

        self.is_multitrack = (
            "x_main"
            in inspect.signature(self.acoustic_model.module.__call__).parameters
        )
        self.spk_list = list(self.config.get("spk_list", []) or [])

        # optional postfilter
        pf_yaml = model_dir / "postfilter_model.yaml"
        if pf_yaml.exists():
            self.postfilter_model = self._load_model("postfilter")
            self.postfilter_out_scaler = self._load_standard("out_postfilter")
        else:
            self.postfilter_model = None
            self.postfilter_out_scaler = None

        # optional packed neural vocoder (reference svs.py loads
        # vocoder_model.pth via util.load_vocoder)
        if (model_dir / "vocoder_model.yaml").exists():
            self.vocoder, self.vocoder_in_scaler, self.default_vocoder_type = (
                load_vocoder(model_dir, self.sample_rate, self.frame_period)
            )
        else:
            self.vocoder = None
            self.vocoder_in_scaler = None
            self.default_vocoder_type = "world"

    # ------------------------------------------------------------- loading
    def _load_model(self, phase: str, bucket: int = gen.FRAME_BUCKET) -> gen.ModelPack:
        cfg = load_config(self.model_dir / f"{phase}_model.yaml")
        module = instantiate(cfg.netG)
        variables = _load_variables(
            module, cfg, self.model_dir / f"{phase}_model.params"
        )
        return gen.ModelPack(module, variables, cfg, bucket=bucket)

    def _load_minmax(self, prefix: str) -> MinMaxScaler:
        return MinMaxScaler(
            np.load(self.model_dir / f"{prefix}_scaler_min.npy"),
            np.load(self.model_dir / f"{prefix}_scaler_scale.npy"),
        )

    def _load_standard(self, prefix: str) -> StandardScaler:
        return StandardScaler(
            np.load(self.model_dir / f"{prefix}_scaler_mean.npy"),
            np.load(self.model_dir / f"{prefix}_scaler_var.npy"),
            np.load(self.model_dir / f"{prefix}_scaler_scale.npy"),
        )

    def __repr__(self):
        return (
            f"{type(self).__name__}(model_dir={str(self.model_dir)!r}, "
            f"sample_rate={self.sample_rate}, feature_type={self.feature_type!r}, "
            f"vocoder={self.default_vocoder_type!r})"
        )

    def set_device(self, device):
        """Device placement no-op (reference svs.py:304 moves torch modules;
        here XLA owns placement and weights are already device_put)."""
        self.logger.info("set_device(%s): managed by JAX/XLA; no-op", device)
        return self

    def set_mesh(self, mesh):
        """Enable SPMD ensemble inference over a ``jax.sharding.Mesh``.

        Batched timing/acoustic/postfilter calls then shard the ensemble
        (track/pair) batch over the mesh's first axis with parameters
        replicated — XLA partitions the compiled program so each chip runs
        its shard of tracks (no reference analogue: torch inference there
        is single-GPU, nnsvs/svs.py:304).  Pass ``None`` to go back to
        single-device.  The fused device postprocess path currently stays
        single-device, so mesh mode uses the host postprocess path.
        """
        self._mesh = mesh
        for pack in (
            self.timelag_model,
            self.duration_model,
            self.acoustic_model,
            self.postfilter_model,
        ):
            if pack is not None:
                pack.set_mesh(mesh)
        return self

    def _force_clip(self, phase: str) -> bool:
        """Per-phase input-feature clipping flag from the packed config
        (reference svs.py:341,370,439 reads config.{timelag,duration}.
        force_clip_input_features / acoustic_config.get(..., True);
        shipped recipe configs default true)."""
        section = self.config.get(phase, {}) or {}
        return bool(section.get("force_clip_input_features", True))

    def _subphone_features(self) -> str:
        """Frame-level subphone feature mode from the packed config
        (reference svs.py:439 config.acoustic.subphone_features)."""
        section = self.config.get("acoustic", {}) or {}
        return str(section.get("subphone_features", "coarse_coding"))

    def _log_f0_conditioning(self) -> bool:
        """Packed-config log-F0 conditioning flag (reference svs.py:338
        reads config.log_f0_conditioning for every model call)."""
        return bool(self.config.get("log_f0_conditioning", True))

    def _timelag_ranges(self):
        """(allowed_range, allowed_range_rest) from the packed config
        (reference svs.py:339-340); these are the clip bounds the timelag
        training targets were clipped to."""
        section = self.config.get("timelag", {}) or {}
        return (
            tuple(section.get("allowed_range", (-20, 20))),
            tuple(section.get("allowed_range_rest", (-40, 40))),
        )

    def _validate_synthesis_args(self, vocoder_type, post_filter_type) -> str:
        """Fail fast on typos (reference svs.py:660-664); returns the
        lower-cased vocoder type."""
        vocoder_type = str(vocoder_type).lower()
        if vocoder_type not in ("world", "pwg", "usfgan", "auto"):
            raise ValueError(f"Unknown vocoder type: {vocoder_type}")
        if post_filter_type not in ("merlin", "nnsvs", "gv", "none", "off", None):
            raise ValueError(f"Unknown post-filter type: {post_filter_type}")
        return vocoder_type

    # ----------------------------------------------------------- pipeline
    def predict_timelag(self, labels):
        """Note-onset time-lags in frames (reference svs.py:318)."""
        return gen.predict_timelag(
            labels.copy(),
            self.timelag_model,
            self.in_timelag_scaler,
            self.out_timelag_scaler,
            self.binary_dict,
            self.numeric_dict,
            pitch_indices=self.pitch_indices,
            log_f0_conditioning=self._log_f0_conditioning(),
            allowed_range=self._timelag_ranges()[0],
            allowed_range_rest=self._timelag_ranges()[1],
            force_clip_input_features=self._force_clip("timelag"),
            frame_period=self.frame_period,
        )

    def predict_duration(self, labels):
        """Per-phone durations in frames (reference svs.py:349)."""
        return gen.predict_duration(
            labels.copy(),
            self.duration_model,
            self.in_duration_scaler,
            self.out_duration_scaler,
            self.binary_dict,
            self.numeric_dict,
            pitch_indices=self.pitch_indices,
            log_f0_conditioning=self._log_f0_conditioning(),
            force_clip_input_features=self._force_clip("duration"),
        )

    def postprocess_duration(self, labels, pred_durations, lag):
        """Note-level duration normalization (reference svs.py:378);
        returns the duration-modified labels."""
        return gen.postprocess_duration(
            labels, pred_durations, lag, frame_period=self.frame_period
        )[0]

    def predict_timing(self, labels):
        return gen.predict_timing(
            labels,
            self.binary_dict,
            self.numeric_dict,
            self.timelag_model,
            self.in_timelag_scaler,
            self.out_timelag_scaler,
            self.duration_model,
            self.in_duration_scaler,
            self.out_duration_scaler,
            log_f0_conditioning=self._log_f0_conditioning(),
            allowed_range=self._timelag_ranges()[0],
            allowed_range_rest=self._timelag_ranges()[1],
            force_clip_input_features=self._force_clip("timelag"),
            force_clip_input_features_duration=self._force_clip("duration"),
            frame_period=self.frame_period,
        )[0]

    def predict_acoustic(self, duration_modified_labels, f0_shift_in_cent: float = 0):
        return gen.predict_acoustic(
            duration_modified_labels,
            self.acoustic_model,
            self.in_acoustic_scaler,
            self.out_acoustic_scaler,
            self.binary_dict,
            self.numeric_dict,
            subphone_features=self._subphone_features(),
            log_f0_conditioning=self._log_f0_conditioning(),
            force_clip_input_features=self._force_clip("acoustic"),
            frame_period=self.frame_period,
            f0_shift_in_cent=f0_shift_in_cent,
        )

    def predict_timing_multitrack(self, labels_list, spks_list, **kw):
        """Pairwise timing: main track conditioned on the sub track
        (reference gen.py predict_timing_multitrack:912-1005)."""
        return gen_multitrack.predict_timing_multitrack(
            [lab.copy() for lab in labels_list],
            spks_list,
            self.binary_dict,
            self.numeric_dict,
            self.timelag_model,
            self.in_timelag_scaler,
            self.out_timelag_scaler,
            self.duration_model,
            self.in_duration_scaler,
            self.out_duration_scaler,
            log_f0_conditioning=self._log_f0_conditioning(),
            allowed_range=self._timelag_ranges()[0],
            allowed_range_rest=self._timelag_ranges()[1],
            force_clip_input_features=self._force_clip("timelag"),
            force_clip_input_features_duration=self._force_clip("duration"),
            frame_period=self.frame_period,
            **kw,
        )

    def predict_acoustic_multitrack(
        self, labels_list, spks_list, f0_shift_in_cent: float = 0
    ):
        """Pairwise acoustic features for the main track
        (reference gen.py predict_acoustic_multitrack:1160-1310)."""
        return gen_multitrack.predict_acoustic_multitrack(
            labels_list,
            spks_list,
            self.acoustic_model,
            self.in_acoustic_scaler,
            self.out_acoustic_scaler,
            self.binary_dict,
            self.numeric_dict,
            subphone_features=self._subphone_features(),
            log_f0_conditioning=self._log_f0_conditioning(),
            force_clip_input_features=self._force_clip("acoustic"),
            frame_period=self.frame_period,
            f0_shift_in_cent=f0_shift_in_cent,
        )

    def postprocess_acoustic(self, acoustic_features, duration_modified_labels, **kw):
        return gen.postprocess_acoustic(
            acoustic_features,
            duration_modified_labels,
            self.binary_dict,
            self.numeric_dict,
            self.acoustic_model.config,
            self.acoustic_out_static_scaler,
            postfilter_model=self.postfilter_model,
            postfilter_out_scaler=self.postfilter_out_scaler,
            sample_rate=self.sample_rate,
            frame_period=self.frame_period,
            relative_f0=self.config.get("relative_f0", False),
            feature_type=self.feature_type,
            **kw,
        )

    def predict_waveform(self, multistream_features, vocoder_type="world", **kw):
        if vocoder_type == "auto":
            vocoder_type = self.default_vocoder_type
        if vocoder_type in ("pwg", "usfgan"):
            kw.setdefault("vocoder", self.vocoder)
            kw.setdefault("vocoder_in_scaler", self.vocoder_in_scaler)
        return gen.predict_waveform(
            multistream_features,
            sample_rate=self.sample_rate,
            frame_period=self.frame_period,
            use_world_codec=self.config.get("use_world_codec", True),
            feature_type=self.feature_type,
            vocoder_type=vocoder_type,
            **kw,
        )

    def postprocess_waveform(self, wav, **kw):
        return gen.postprocess_waveform(wav, self.sample_rate, **kw)

    def svs(
        self,
        labels,
        vocoder_type: str = "world",
        post_filter_type: str = "gv",
        trajectory_smoothing: bool = True,
        trajectory_smoothing_cutoff: float = 50,
        trajectory_smoothing_cutoff_f0: float = 20,
        vuv_threshold: float = 0.5,
        style_shift: float = 0,
        force_fix_vuv: bool = False,
        fill_silence_to_rest: bool = False,
        dtype=np.int16,
        peak_norm: bool = False,
        loudness_norm: bool = False,
        target_loudness: float = -20,
        segmented_synthesis: bool = False,
    ):
        """Full score-to-waveform synthesis.  Returns (wav, sample_rate)."""
        vocoder_type = self._validate_synthesis_args(vocoder_type, post_filter_type)
        if self.is_multitrack:
            raise ValueError(
                "this pack holds a multitrack (cross-conditioned) model; "
                "use svs_ensemble(labels_list, spk_ids=...) instead"
            )
        start = time.time()
        duration_modified_labels = self.predict_timing(labels)

        if segmented_synthesis:
            segments = hts.segment_labels(duration_modified_labels)
        else:
            segments = [duration_modified_labels]

        hts_frame_shift = int(self.frame_period * 1e4)
        wavs = []
        for seg in segments:
            seg.frame_shift = hts_frame_shift
            t0 = time.time()
            acoustic = self.predict_acoustic(
                seg, f0_shift_in_cent=style_shift * 100
            )
            t1 = time.time()
            streams = self.postprocess_acoustic(
                acoustic,
                seg,
                post_filter_type=post_filter_type,
                trajectory_smoothing=trajectory_smoothing,
                trajectory_smoothing_cutoff=trajectory_smoothing_cutoff,
                trajectory_smoothing_cutoff_f0=trajectory_smoothing_cutoff_f0,
                force_fix_vuv=force_fix_vuv,
                fill_silence_to_rest=fill_silence_to_rest,
                f0_shift_in_cent=-style_shift * 100,
            )
            t2 = time.time()
            wav = self.predict_waveform(
                streams, vocoder_type=vocoder_type, vuv_threshold=vuv_threshold
            )
            t3 = time.time()
            dur = len(wav) / self.sample_rate
            self.logger.info(
                "segment: acoustic RTF %.3f, vocoder RTF %.3f",
                (t1 - t0) / max(dur, 1e-9),
                (t3 - t2) / max(dur, 1e-9),
            )
            wavs.append(wav)

        wav = np.concatenate(wavs).reshape(-1)
        wav = self.postprocess_waveform(
            wav,
            dtype=dtype,
            peak_norm=peak_norm,
            loudness_norm=loudness_norm,
            target_loudness=target_loudness,
        )
        total = time.time() - start
        rtf = total / (len(wav) / self.sample_rate)
        self.logger.info("total: %.3f sec, RTF %.3f", total, rtf)
        self.last_rtf = rtf
        return wav, self.sample_rate

    def svs_streaming(
        self,
        labels,
        vocoder_type: str = "world",
        post_filter_type: str = "gv",
        trajectory_smoothing: bool = True,
        trajectory_smoothing_cutoff: float = 50,
        trajectory_smoothing_cutoff_f0: float = 20,
        vuv_threshold: float = 0.5,
        style_shift: float = 0,
        force_fix_vuv: bool = False,
        fill_silence_to_rest: bool = False,
        dtype=np.float32,
        gain: float = 1.0,
        pipeline_depth: int = 2,
    ):
        """Phrase-streamed synthesis: a generator yielding waveform chunks
        (one per rest-delimited segment, in order) as soon as each is
        rendered, so playback can start after the first phrase instead of
        after the whole song.

        Segments are rendered through the same per-segment chain as
        ``svs(segmented_synthesis=True)`` (reference nnsvs/svs.py segment
        path) but pipelined ``pipeline_depth`` deep on worker threads:
        while segment k's device->host fetch blocks, segment k+1's device
        compute is already dispatched — on a remote accelerator this hides
        most of the transfer latency.  Pipelining does not change the
        numerics: chunks are bit-identical to a serial per-segment render.

        Divergences from ``svs()`` (whole-signal operations that cannot be
        streamed): the output high-pass runs per segment (segment edges
        are rests, so the filter transient lands in silence), and there is
        NO global peak/loudness normalization — chunks are the raw
        synthesis scale times ``gain``; ``dtype=np.int16`` converts with
        clipping at full scale.  Use ``svs()`` when mastered whole-song
        output is wanted.

        No reference analogue: the reference synthesizes a full song per
        call (nnsvs/svs.py:659-745).
        """
        vocoder_type = self._validate_synthesis_args(
            vocoder_type, post_filter_type
        )
        if self.is_multitrack:
            raise ValueError(
                "this pack holds a multitrack (cross-conditioned) model; "
                "streaming is single-track (use svs_ensemble for pairs)"
            )
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        duration_modified_labels = self.predict_timing(labels)
        segments = hts.segment_labels(duration_modified_labels)
        hts_frame_shift = int(self.frame_period * 1e4)

        def _render(seg):
            seg.frame_shift = hts_frame_shift
            acoustic = self.predict_acoustic(
                seg, f0_shift_in_cent=style_shift * 100
            )
            streams = self.postprocess_acoustic(
                acoustic,
                seg,
                post_filter_type=post_filter_type,
                trajectory_smoothing=trajectory_smoothing,
                trajectory_smoothing_cutoff=trajectory_smoothing_cutoff,
                trajectory_smoothing_cutoff_f0=trajectory_smoothing_cutoff_f0,
                force_fix_vuv=force_fix_vuv,
                fill_silence_to_rest=fill_silence_to_rest,
                f0_shift_in_cent=-style_shift * 100,
            )
            wav = self.predict_waveform(
                streams, vocoder_type=vocoder_type,
                vuv_threshold=vuv_threshold,
            )
            chunk = np.asarray(
                gen.bandpass_filter(
                    np.asarray(wav, np.float64).reshape(-1), self.sample_rate
                )
            ) * gain
            if dtype in (np.int16, "int16"):
                return (
                    np.clip(chunk, -1.0, 1.0) * 32767.0
                ).astype(np.int16)
            return chunk.astype(dtype) if dtype is not None else chunk

        with ThreadPoolExecutor(max_workers=max(pipeline_depth, 1)) as ex:
            pending = deque(
                ex.submit(_render, seg)
                for seg in segments[: max(pipeline_depth, 1)]
            )
            for seg in segments[max(pipeline_depth, 1):]:
                done = pending.popleft()
                pending.append(ex.submit(_render, seg))
                yield done.result()
            while pending:
                yield pending.popleft().result()

    # --------------------------------------------------- ensemble synthesis
    def _frame_features(self, duration_modified):
        """Per-track frame-level linguistic features (threaded: numpy-heavy
        host work).  Returns (normalized model inputs, raw features) —
        the raw features are reused by postprocessing."""
        from concurrent.futures import ThreadPoolExecutor

        hts_frame_shift = int(self.frame_period * 1e4)
        for lab in duration_modified:
            lab.frame_shift = hts_frame_shift

        force_clip = self._force_clip("acoustic")
        subphone = self._subphone_features()
        log_f0 = self._log_f0_conditioning()

        def _feat(lab):
            return gen._prepare_linguistic_features(
                lab,
                self.binary_dict,
                self.numeric_dict,
                self.in_acoustic_scaler,
                self.pitch_indices,
                True,
                subphone,
                log_f0,
                force_clip,
                hts_frame_shift,
                return_raw=True,
            )

        with ThreadPoolExecutor(max_workers=len(duration_modified)) as ex:
            pairs = list(ex.map(_feat, duration_modified))
        return [p[0] for p in pairs], [p[1] for p in pairs]

    # ----------------------------------------------- fused device postproc
    def _fused_post_ok(self, vocoder_type, post_filter_type, lengths):
        """True when the whole postprocess+vocoder chain can run on device
        (the paper's flagship configuration: static WORLD streams, GV or no
        postfilter, no relative-F0).  ESVS_DISABLE_FUSED_POST=1 forces the
        host path (used by the parity tests)."""
        if os.environ.get("ESVS_DISABLE_FUSED_POST", "0") == "1":
            return False
        cfg = getattr(self.acoustic_model, "config", None)
        if cfg is None:
            return False
        try:
            ss = list(cfg.stream_sizes)
            hd = list(cfg.has_dynamic_features)
        except Exception:
            return False
        return (
            vocoder_type == "world"
            and self.config.get("use_world_codec", True)
            and self.feature_type == "world"
            and post_filter_type in ("gv", "off", "none", None)
            and len(ss) == 4
            # coded band aperiodicity only: mcep-aperiodicity packs
            # (bap dim > 5) need the host path's use_mcep_ap handling
            and int(ss[3]) <= 5
            and not any(hd)
            and not self.config.get("relative_f0", False)
            # host lowpass_filter skips signals <= 18 frames; keep parity
            and min(lengths) > 18
        )

    def _fused_assets(self):
        # keyed on the active mesh: the asset arrays must share the batch's
        # device set (a device-0-committed constant mixed with mesh-sharded
        # inputs is a placement error), so they are replicated over the
        # mesh in SPMD mode and re-put when the mesh changes
        mesh = getattr(self, "_mesh", None)
        cache = getattr(self, "_fused_cache", None)
        if cache is not None and cache[0] is not mesh:
            cache = self._fused_cache = None
        if cache is None:
            import jax

            from ensemble_svs_with_interactions_tpu.ops import device_post

            cfg = self.acoustic_model.config
            dim = int(sum(cfg.stream_sizes))
            a, b = device_post.scaler_affine(self.out_acoustic_scaler, dim)
            gv = (
                np.asarray(self.acoustic_out_static_scaler.var_)
                .reshape(-1)[: cfg.stream_sizes[0]]
                .astype(np.float32)
            )
            modfs = int(1 / (self.frame_period * 0.001))
            cutoffs = (
                [50.0] * int(cfg.stream_sizes[0])
                + [50.0] * int(cfg.stream_sizes[3])
                + [20.0]
            )
            fb, fa, fzi = device_post.filtfilt_coeffs(cutoffs, modfs)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                sharding = NamedSharding(mesh, PartitionSpec())
                arrays = jax.device_put((a, b, gv, fb, fa, fzi), sharding)
            else:
                arrays = jax.device_put((a, b, gv, fb, fa, fzi))
            self._fused_cache = (
                mesh,
                arrays,
                device_post.jit_fused_world_postprocess(),
            )
        return self._fused_cache[1], self._fused_cache[2]

    def _fused_postprocess(self, out_dev, lengths, raw_feats, post_filter_type):
        """Device (N, T_pad, D) normalized predictions -> device
        (mgc, lf0, vuv, bap) via one jitted program (ops/device_post.py)."""
        import jax.numpy as jnp

        (a, b, gv, fb, fa, fzi), jit_fn = self._fused_assets()
        cfg = self.acoustic_model.config
        # under a mesh the acoustic batch is padded to the mesh size:
        # rows beyond len(lengths) are padding (length 1, no note frames)
        B_rows, T_pad = out_dev.shape[0], out_dev.shape[1]
        lengths_full = np.ones((B_rows,), np.int32)
        lengths_full[: len(lengths)] = np.asarray(lengths, np.int32)
        note_mask = np.zeros((B_rows, T_pad), bool)
        for i, raw in enumerate(raw_feats):
            idx = hts.get_note_frame_indices(
                self.binary_dict, self.numeric_dict, raw
            )
            idx = idx[idx < lengths[i]]
            note_mask[i, idx] = True
        return jit_fn(
            out_dev,
            jnp.asarray(lengths_full),
            jnp.asarray(note_mask),
            a,
            b,
            gv,
            fb,
            fa,
            fzi,
            stream_sizes=tuple(int(s) for s in cfg.stream_sizes),
            apply_gv=post_filter_type == "gv",
            gate_threshold=0.5,
            smooth=True,
        )

    def _fused_vocoder(self, streams_dev, lengths, vuv_threshold, dtype):
        return self._dispatch_and_finalize_wavs(
            list(streams_dev), lengths, vuv_threshold, dtype
        )

    def _dispatch_and_finalize_wavs(self, batch, lengths, vuv_threshold, dtype):
        """Shared tail of both vocoder paths: chunked device synthesis via
        :meth:`_vocoder_core`, then per-track trim + dtype finalization."""
        self._t_vocoder_device_done = None
        hop = int(self.sample_rate * self.frame_period / 1000)
        # mesh-padded batches carry extra rows beyond the real tracks;
        # give them 1-frame sample lengths and drop them at the end
        B_rows = batch[0].shape[0]
        lengths_full = np.ones((B_rows,), np.int64)
        lengths_full[: len(lengths)] = np.asarray(lengths, np.int64)
        sample_lengths = lengths_full * hop
        want_int16 = dtype in (np.int16, "int16")
        wavs = self._vocoder_core(
            batch, sample_lengths, vuv_threshold, want_int16
        )
        N = len(lengths)
        if want_int16:
            return [wavs[i][: sample_lengths[i]] for i in range(N)]
        return [
            self.postprocess_waveform(
                wavs[i][: sample_lengths[i]], dtype=dtype, skip_bandpass=True
            )
            for i in range(N)
        ]

    def _postprocess_batch(
        self, duration_modified, acoustics, post_filter_type, raw_feats=None
    ):
        from concurrent.futures import ThreadPoolExecutor

        if raw_feats is None:
            raw_feats = [None] * len(duration_modified)

        def _post(lab_ac_raw):
            lab, acoustic, raw = lab_ac_raw
            return self.postprocess_acoustic(
                acoustic,
                lab,
                post_filter_type=post_filter_type,
                linguistic_features=raw,
            )

        with ThreadPoolExecutor(max_workers=len(duration_modified)) as ex:
            return list(
                ex.map(_post, zip(duration_modified, acoustics, raw_feats))
            )

    @staticmethod
    def _vocoder_chunk_plan(N):
        """Batch-size plan for the chunked vocoder dispatch: two equal
        halves.  A/B on the v5e bench (ESVS_VOCODER_CHUNKS override):
        [2,2] 0.738 s median beats [3,1] 0.746, [2,1,1] 0.799 and [4]
        0.776 — a smaller last chunk trims the exposed final D2H but the
        off-peak-batch kernels cost more device time than the overlap
        saves."""
        plan = os.environ.get("ESVS_VOCODER_CHUNKS")
        if plan:
            sizes = [int(c) for c in plan.split(",") if c.strip()]
            if sum(sizes) == N and all(c >= 1 for c in sizes):
                return sizes
            raise ValueError(
                f"ESVS_VOCODER_CHUNKS={plan!r} must be positive sizes "
                f"summing to the batch size {N}"
            )
        if N < 4:
            return [N]
        half = (N + 1) // 2
        return [half, N - half]

    def _vocoder_core(self, batch, sample_lengths, vuv_threshold, want_int16):
        """Chunked WORLD-kernel dispatch over a 4-array (N, T_pad, D)
        stream batch (numpy or device-resident): two dispatches so the
        first chunk's device->host transfer overlaps the second chunk's
        synthesis (per-track chunks measured slower: B=1 kernels waste
        more device time than the overlap saves).  Returns a list of N
        per-track sample arrays (bucket-trimmed, possibly ragged)."""
        import jax

        from ensemble_svs_with_interactions_tpu.ops import world

        N = batch[0].shape[0]
        # SPMD: one chunk — slicing the sharded batch axis would reshard,
        # and each device's D2H runs in parallel anyway, so the two-chunk
        # transfer/compute overlap trick has nothing to hide
        if getattr(self, "_mesh", None) is not None:
            chunks = [N]
        else:
            chunks = self._vocoder_chunk_plan(N)
        hop = int(self.sample_rate * self.frame_period / 1000)
        futures = []
        starts = np.concatenate([[0], np.cumsum(chunks)])[:-1]
        for c0, chunk in zip(starts, chunks):
            c0 = int(c0)
            sub = [b[c0 : c0 + chunk] for b in batch]
            wav_dev = world.synthesize_from_streams(
                *sub,
                self.sample_rate,
                self.frame_period,
                vuv_threshold=vuv_threshold,
                # fold the 70 Hz output high-pass into the kernel so no
                # host-side Butterworth pass is needed
                highpass_cutoff=70.0,
                key=jax.random.PRNGKey(c0),
            )
            # trim the frame-bucket padding before the device->host fetch
            # (rounded to a finer 64-frame bucket to bound recompilation);
            # the synthesis T_pad bucket is 512 frames, so this saves up
            # to ~2.5 s of audio worth of transfer bytes per track
            max_s = int(sample_lengths[c0 : c0 + chunk].max())
            keep = min(wav_dev.shape[1], gen._round_up(max_s, 64 * hop))
            wav_dev = wav_dev[:, :keep]
            if want_int16:
                wav_dev = world.quantize_peak_norm_int16(
                    wav_dev, jnp_lengths(sample_lengths[c0 : c0 + chunk])
                )
            futures.append(wav_dev)

        wavs = []
        for i, wav_dev in enumerate(futures):
            if i == len(futures) - 1:
                # all chunks were dispatched up front: once the last one
                # is ready, device compute is done (earlier fetches
                # overlapped it)
                wav_dev.block_until_ready()
                self._t_vocoder_device_done = time.time()
            host = np.asarray(wav_dev)
            wavs.extend(host[j] for j in range(host.shape[0]))
        return wavs

    def _batched_vocoder(self, streams_list, vocoder_type, vuv_threshold, dtype):
        """All tracks through the fused WORLD kernel via :meth:`_vocoder_core`;
        quantization + peak norm happen on device to halve D2H bytes."""
        import jax

        from ensemble_svs_with_interactions_tpu.ops import world

        if (
            vocoder_type == "world"
            and self.config.get("use_world_codec", True)
            # the fused kernel decodes CODED band aperiodicity; packs
            # trained with mcep aperiodicity (bap dim > 5) take the
            # per-track path which handles use_mcep_ap (gen.py)
            and streams_list[0][3].shape[-1] <= 5
        ):
            T_max = max(len(s[0]) for s in streams_list)
            T_pad = gen._round_up(T_max, gen.FRAME_BUCKET)
            packed = []
            for mgc, lf0, vuv, bap in streams_list:
                pad = T_pad - len(mgc)
                packed.append(
                    [
                        np.pad(mgc, ((0, pad), (0, 0)), mode="edge"),
                        np.pad(lf0, ((0, pad), (0, 0)), mode="edge"),
                        np.pad(vuv, ((0, pad), (0, 0))),
                        np.pad(bap, ((0, pad), (0, 0)), mode="edge"),
                    ]
                )
            batch = [np.stack([p[i] for p in packed]) for i in range(4)]
            lengths = [len(s[0]) for s in streams_list]
            return self._dispatch_and_finalize_wavs(
                batch, lengths, vuv_threshold, dtype
            )
        self._t_vocoder_device_done = None
        return [
            self.postprocess_waveform(
                self.predict_waveform(
                    s, vocoder_type=vocoder_type, vuv_threshold=vuv_threshold
                ),
                dtype=dtype,
            )
            for s in streams_list
        ]

    def svs_ensemble(
        self,
        labels_list,
        vocoder_type: str = "world",
        post_filter_type: str = "gv",
        vuv_threshold: float = 0.5,
        dtype=np.int16,
        spk_ids=None,
        pairs=None,
        blocked_stage_times: bool = False,
    ):
        """Synthesize an N-part ensemble with batched device inference.

        ``blocked_stage_times=True`` inserts a ``jax.block_until_ready``
        after the acoustic and postprocess dispatches and records
        ``acoustic_blocked`` / ``postproc_blocked`` in
        ``last_stage_times`` — honest device-compute attribution for
        profiling.  It DESTROYS the dispatch/transfer overlap, so never
        enable it on the production path; the default keys carry a
        ``_dispatch`` suffix to make the asynchrony explicit.

        For a multitrack (cross-conditioned) pack this runs the paper's
        pairwise pipeline: every track is the MAIN track of one pair,
        conditioned on a sub track (``pairs[i]``, default the next track in
        a ring), and all N pairs run through the joint timelag/duration/
        acoustic models as single (N, T, D) batches
        (reference nnsvs/bin/synthesis_multitrack.py:30-289, svs.py:619-746).
        For single-track packs, timing/acoustic/vocoder are batched across
        the independent tracks.

        Returns (list of wavs, sample_rate).
        """
        vocoder_type = self._validate_synthesis_args(vocoder_type, post_filter_type)
        start = time.time()
        if self.is_multitrack:
            N = len(labels_list)
            if spk_ids is None:
                spk_ids = list(range(N))
            if pairs is None:
                pairs = [(i + 1) % N for i in range(N)]
            duration_modified = gen_multitrack.predict_timing_multitrack_batch(
                [lab.copy() for lab in labels_list],
                spk_ids,
                pairs,
                self.binary_dict,
                self.numeric_dict,
                self.timelag_model,
                self.in_timelag_scaler,
                self.out_timelag_scaler,
                self.duration_model,
                self.in_duration_scaler,
                self.out_duration_scaler,
                log_f0_conditioning=self._log_f0_conditioning(),
                allowed_range=self._timelag_ranges()[0],
                allowed_range_rest=self._timelag_ranges()[1],
                force_clip_input_features=self._force_clip("timelag"),
                force_clip_input_features_duration=self._force_clip("duration"),
                frame_period=self.frame_period,
            )
            t_timing_device = time.time()
            feats, raw_feats = self._frame_features(duration_modified)
            t_timing = time.time()
            import jax.numpy as jnp

            spks = (
                jnp.asarray([spk_ids[i] for i in range(N)], jnp.int32),
                jnp.asarray([spk_ids[pairs[i]] for i in range(N)], jnp.int32),
            )
            # each track appears exactly once as MAIN: skip the sub-track
            # decoder passes when the model offers a main-only entry point
            method = (
                "inference_main"
                if hasattr(self.acoustic_model.module, "inference_main")
                else "inference"
            )
            lengths = [len(f) for f in feats]
            use_fused = self._fused_post_ok(
                vocoder_type, post_filter_type, lengths
            )
            if use_fused:
                out_dev, lengths = self.acoustic_model.inference_batch(
                    feats,
                    spks=spks,
                    sub_index=pairs,
                    method=method,
                    device_out=True,
                )
                # multitrack inference returns (out_main, out_sub); each
                # track appears exactly once as main
                if isinstance(out_dev, tuple):
                    out_dev = out_dev[0]
                t_acoustic = time.time()
                if blocked_stage_times:
                    import jax

                    jax.block_until_ready(out_dev)
                    t_acoustic_blocked = time.time()
            else:
                preds = self.acoustic_model.inference_batch(
                    feats,
                    spks=spks,
                    sub_index=pairs,
                    method=method,
                )
                t_acoustic = time.time()
                # same branch logic as gen_multitrack.predict_acoustic_
                # multitrack: with inference_main the output is the main
                # track already; otherwise (out_main, out_sub) tuples are
                # unwrapped, while PROBABILISTIC (mu, sigma) keeps both so
                # MLPG solves with the predicted sigma
                ptype = self.acoustic_model.prediction_type()
                is_prob = ptype in (
                    PredictionType.PROBABILISTIC,
                    PredictionType.MULTISTREAM_HYBRID,
                )
                use_main = method == "inference_main"

                def _main_pred(p):
                    if (
                        not use_main
                        and isinstance(p, tuple)
                        and ptype != PredictionType.PROBABILISTIC
                    ):
                        return p[0]
                    return p

                acoustics = [
                    gen._denorm_and_mlpg(
                        _main_pred(p),
                        self.out_acoustic_scaler,
                        self.acoustic_model.config,
                        is_prob,
                    )
                    for p in preds
                ]
        else:
            duration_modified = gen.predict_timing_batch(
                labels_list,
                self.binary_dict,
                self.numeric_dict,
                self.timelag_model,
                self.in_timelag_scaler,
                self.out_timelag_scaler,
                self.duration_model,
                self.in_duration_scaler,
                self.out_duration_scaler,
                log_f0_conditioning=self._log_f0_conditioning(),
                allowed_range=self._timelag_ranges()[0],
                allowed_range_rest=self._timelag_ranges()[1],
                force_clip_input_features=self._force_clip("timelag"),
                force_clip_input_features_duration=self._force_clip("duration"),
                frame_period=self.frame_period,
            )
            feats, raw_feats = self._frame_features(duration_modified)
            t_timing = time.time()
            lengths = [len(f) for f in feats]
            use_fused = self._fused_post_ok(
                vocoder_type, post_filter_type, lengths
            )
            if use_fused:
                out_dev, lengths = self.acoustic_model.inference_batch(
                    feats, device_out=True
                )
                # probabilistic heads return (mu, sigma); with static-only
                # streams the host path keeps mu (gen._denorm_and_mlpg)
                if isinstance(out_dev, tuple):
                    out_dev = out_dev[0]
                t_acoustic = time.time()
                if blocked_stage_times:
                    import jax

                    jax.block_until_ready(out_dev)
                    t_acoustic_blocked = time.time()
            else:
                preds = self.acoustic_model.inference_batch(feats)
                t_acoustic = time.time()
                is_prob = self.acoustic_model.prediction_type().name in (
                    "PROBABILISTIC",
                    "MULTISTREAM_HYBRID",
                )
                acoustics = [
                    gen._denorm_and_mlpg(
                        p, self.out_acoustic_scaler, self.acoustic_model.config, is_prob
                    )
                    for p in preds
                ]

        if use_fused:
            streams_dev = self._fused_postprocess(
                out_dev, lengths, raw_feats, post_filter_type
            )
            t_post = time.time()
            if blocked_stage_times:
                import jax

                jax.block_until_ready(streams_dev)
                t_post_blocked = time.time()
            outs = self._fused_vocoder(streams_dev, lengths, vuv_threshold, dtype)
        else:
            streams_list = self._postprocess_batch(
                duration_modified, acoustics, post_filter_type, raw_feats=raw_feats
            )
            t_post = time.time()
            outs = self._batched_vocoder(
                streams_list, vocoder_type, vuv_threshold, dtype
            )
        t_end = time.time()

        total = t_end - start
        dur = max(len(w) for w in outs) / self.sample_rate
        self.last_rtf = total / dur
        # *_dispatch keys are enqueue times only — the device wait is
        # absorbed by whichever later stage first blocks (normally the
        # vocoder). blocked_stage_times=True adds the honest *_blocked
        # attribution at the cost of the overlap (VERDICT r2 #9).
        self.last_stage_times = {
            "timing_feats": t_timing - start,
            "acoustic_dispatch": t_acoustic - t_timing,
            "postproc_dispatch": t_post - t_acoustic,
            "vocoder": t_end - t_post,
        }
        if blocked_stage_times and use_fused:
            self.last_stage_times["acoustic_blocked"] = (
                t_acoustic_blocked - t_timing
            )
            self.last_stage_times["postproc_dispatch"] = (
                t_post - t_acoustic_blocked
            )
            self.last_stage_times["postproc_blocked"] = (
                t_post_blocked - t_acoustic_blocked
            )
            self.last_stage_times["vocoder"] = t_end - t_post_blocked
        if self.is_multitrack:
            self.last_stage_times["timing_models"] = t_timing_device - start
            self.last_stage_times["frame_feats"] = t_timing - t_timing_device
        if getattr(self, "_t_vocoder_device_done", None):
            self.last_stage_times["vocoder_device"] = (
                self._t_vocoder_device_done - t_post
            )
            self.last_stage_times["vocoder_d2h"] = (
                t_end - self._t_vocoder_device_done
            )
        self.logger.info(
            "ensemble stages: %s",
            ", ".join(f"{k} {v:.3f}s" for k, v in self.last_stage_times.items()),
        )
        self.logger.info(
            "ensemble: %d parts, %.2f s audio, total %.3f s, RTF %.4f",
            len(outs), dur, total, self.last_rtf,
        )
        return outs, self.sample_rate
