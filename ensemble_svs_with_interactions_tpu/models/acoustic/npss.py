"""NPSS-style cascaded multi-stream models.

Parity targets: /root/reference/nnsvs/acoustic_models/multistream.py
(NPSSMultistreamParametricModel :813, NPSSMDNMultistreamParametricModel
:1025, MultiSpeakerNPSSMDNMultistreamParametricModel :1245,
MultiTrackNPSSMDNMultistreamParametricModel :1482).

Cascaded factorization (Blaauw & Bonada 2017, adapted):
  p(MGC, LF0, VUV, BAP | C)
    = p(LF0|C) p(MGC|LF0,C) p(BAP|LF0,C) p(VUV|LF0,BAP,C)
with teacher-forced conditioning during training and configurable V/UV
conditioning (bap / bap0 / lf0 / mgc flags).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ensemble_svs_with_interactions_tpu.base import BaseModel, PredictionType
from ensemble_svs_with_interactions_tpu.models.acoustic.multistream import (
    _maybe_instantiate,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.util import (
    concat_stream_outputs,
    point_estimate as _point,
)
from ensemble_svs_with_interactions_tpu.ops.multistream import split_streams


def _run_stream_decoder(mod, x, lengths, y, train=False, spk_embs=None):
    """Call a cascade stream decoder.

    Teacher-forced (y given): plain ``__call__``.  Free-running (y=None):
    diffusion sub-models dispatch to their ``.inference()`` sampling loop
    (the reference cascades call ``self.*_model.inference`` at inference,
    multistream.py:946-995 — DDPM training and sampling are distinct
    paths); every other family runs inference through ``__call__(y=None)``
    which preserves the MDN parameter tuples the callers reduce with
    ``point_estimate``.
    """
    if y is None and mod.prediction_type() == PredictionType.DIFFUSION:
        return mod.inference(x, lengths, spk_embs=spk_embs)
    kwargs = {"train": train}
    if spk_embs is not None:
        kwargs["spk_embs"] = spk_embs
    return mod(x, lengths, y, **kwargs)


class _NPSSBase(BaseModel):
    """Shared cascade logic; subclasses set ``use_mdn_streams``."""

    in_dim: int = 0
    out_dim: int = 0
    stream_sizes: Sequence[int] = (60, 1, 1, 5)
    reduction_factor: int = 1
    lf0_model: Any = None
    mgc_model: Any = None
    bap_model: Any = None
    vuv_model: Any = None
    in_rest_idx: int = 0
    in_lf0_idx: int = 51
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 60
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    vuv_model_bap_conditioning: bool = True
    vuv_model_bap0_conditioning: bool = False
    vuv_model_lf0_conditioning: bool = True
    vuv_model_mgc_conditioning: bool = False

    def setup(self):
        self._lf0 = _maybe_instantiate(self.lf0_model)
        self._mgc = _maybe_instantiate(self.mgc_model)
        self._bap = _maybe_instantiate(self.bap_model)
        self._vuv = _maybe_instantiate(self.vuv_model)

    def has_residual_lf0_prediction(self):
        return True

    # V/UV conditioning order: the MDN cascades concatenate
    # (x, mgc, lf0, bap) (reference multistream.py:1190-1214); the
    # deterministic cascade uses (x, mgc, bap, lf0) (:995-1005)
    _VUV_COND_ORDER = ("mgc", "lf0", "bap")

    def _vuv_inputs(self, x, mgc, bap, lf0):
        bap_cond = bap[..., 0:1] if self.vuv_model_bap0_conditioning else bap
        enabled = {
            "mgc": (self.vuv_model_mgc_conditioning, mgc),
            "lf0": (self.vuv_model_lf0_conditioning, lf0),
            "bap": (self.vuv_model_bap_conditioning, bap_cond),
        }
        parts = [x]
        for name in self._VUV_COND_ORDER:
            on, feat = enabled[name]
            if on:
                parts.append(feat)
        return jnp.concatenate(parts, axis=-1)

    def _cascade(self, x, lengths, y, spk_embs=None, train: bool = False):
        is_inference = y is None
        if is_inference:
            y_mgc = y_lf0 = y_vuv = y_bap = None
        else:
            y_mgc, y_lf0, y_vuv, y_bap = split_streams(y, list(self.stream_sizes))

        kwargs = {"train": train}
        if spk_embs is not None:
            kwargs["spk_embs"] = spk_embs

        lf0_out = self._lf0(x, lengths, y_lf0, **kwargs)
        if isinstance(lf0_out, tuple) and len(lf0_out) == 2:
            lf0, lf0_residual = lf0_out
        else:
            lf0, lf0_residual = lf0_out, None

        # probabilistic lf0 submodels condition downstream streams on the
        # point estimate (reference multistream.py:1151-1157 lf0_cond=lf0[0])
        cond_lf0 = _point(lf0) if is_inference else y_lf0
        mgc = _run_stream_decoder(
            self._mgc, jnp.concatenate([x, cond_lf0], -1), lengths, y_mgc, **kwargs
        )
        bap = _run_stream_decoder(
            self._bap, jnp.concatenate([x, cond_lf0], -1), lengths, y_bap, **kwargs
        )

        if is_inference:
            vuv_inp = self._vuv_inputs(x, _point(mgc), _point(bap), cond_lf0)
        else:
            vuv_inp = self._vuv_inputs(x, y_mgc, y_bap, y_lf0)
        vuv = self._vuv(vuv_inp, lengths, y_vuv, **kwargs)
        return mgc, lf0, vuv, bap, lf0_residual


class NPSSMultistreamParametricModel(_NPSSBase):
    """Deterministic NPSS cascade (multistream.py:813).  Pairs with
    deterministic AR stream decoders (BiLSTMNonAttentiveDecoder with an
    optional Post-Net — the reference ``ar_mgcf0bap`` recipe config)."""

    # deterministic cascade conditions V/UV as (x, mgc, bap, lf0)
    # (reference multistream.py:995-1005)
    _VUV_COND_ORDER = ("mgc", "bap", "lf0")

    # reference knob that was never implemented upstream either
    # (multistream.py:871-886 asserts it off)
    npss_style_conditioning: bool = False

    def prediction_type(self):
        return PredictionType.DETERMINISTIC

    def __call__(self, x, lengths=None, y=None, train: bool = False):
        assert not self.npss_style_conditioning, "Not supported"
        assert x.shape[-1] == self.in_dim
        mgc, lf0, vuv, bap, lf0_residual = self._cascade(x, lengths, y, train=train)
        out = concat_stream_outputs([mgc, lf0, vuv, bap], self.out_dim)
        return out, lf0_residual

    def inference(self, x, lengths=None):
        out = self(x, lengths)[0]
        return out[-1] if isinstance(out, list) else out


class NPSSMDNMultistreamParametricModel(_NPSSBase):
    """NPSS cascade with MDN spectral models (multistream.py:1025);
    training returns per-stream outputs (MULTISTREAM_HYBRID)."""

    def prediction_type(self):
        return PredictionType.MULTISTREAM_HYBRID

    def __call__(self, x, lengths=None, y=None, train: bool = False):
        assert x.shape[-1] == self.in_dim
        mgc, lf0, vuv, bap, lf0_residual = self._cascade(x, lengths, y, train=train)
        if y is None:
            out = jnp.concatenate(
                [_point(mgc), _point(lf0), vuv, _point(bap)], axis=-1
            )
            return out, lf0_residual
        return (mgc, lf0, vuv, bap), lf0_residual

    def inference(self, x, lengths=None):
        return self(x, lengths)[0]


class MultiSpeakerNPSSMDNMultistreamParametricModel(_NPSSBase):
    """+ speaker embedding (multistream.py:1245)."""

    speaker_embedding: Any = None

    def setup(self):
        super().setup()
        self._spk = _maybe_instantiate(self.speaker_embedding)

    def prediction_type(self):
        return PredictionType.MULTISTREAM_HYBRID

    def __call__(self, x, spks, lengths=None, y=None, train: bool = False):
        embs = self._spk(spks)
        if embs.ndim == 2:
            embs = embs[:, None, :]
        embs = jnp.broadcast_to(embs, (x.shape[0], x.shape[1], embs.shape[-1]))
        mgc, lf0, vuv, bap, lf0_residual = self._cascade(
            x, lengths, y, spk_embs=embs, train=train
        )
        if y is None:
            return (
                jnp.concatenate([_point(mgc), _point(lf0), vuv, _point(bap)], -1),
                lf0_residual,
            )
        return (mgc, lf0, vuv, bap), lf0_residual

    def inference(self, x, spks, lengths=None):
        return self(x, spks, lengths)[0]


class MultiTrackNPSSMDNMultistreamParametricModel(_NPSSBase):
    """Multitrack NPSS cascade with a cross-track lf0 model and an
    ``output_subtrack`` flag controlling whether sub-track predictions are
    produced for the interaction losses (multistream.py:1482,
    forward :1594-1768)."""

    speaker_embedding: Any = None
    output_subtrack: bool = True

    def setup(self):
        super().setup()
        self._spk = _maybe_instantiate(self.speaker_embedding)

    def prediction_type(self):
        return PredictionType.MULTISTREAM_HYBRID

    def _expand(self, spk, T):
        e = self._spk(spk)
        if e.ndim == 2:
            e = e[:, None, :]
        return jnp.broadcast_to(e, (e.shape[0], T, e.shape[-1]))

    @staticmethod
    def _dec(mod, x, lengths, y, spk_e, train):
        """Call a stream decoder, passing spk_embs only when its signature
        accepts speaker conditioning (the reference always forwards
        spk_embs, :1685-1737, but its configs pair this class with
        spk-capable decoders; plain FFN/MDN decoders remain usable).
        Free-running diffusion decoders dispatch to their sampling loop."""
        import inspect

        if "spk_embs" in inspect.signature(mod.__call__).parameters:
            return _run_stream_decoder(
                mod, x, lengths, y, train=train, spk_embs=spk_e
            )
        return _run_stream_decoder(mod, x, lengths, y, train=train)

    def _main_cascade(self, x, x_other, spk_e, spk_e_other, lengths, y, train):
        """The full cascade for one track, speaker-conditioned sub-decoders
        (reference forward :1685-1737 passes spk_embs to mgc/bap/vuv)."""
        is_inference = y is None
        if is_inference:
            y_mgc = y_lf0 = y_vuv = y_bap = None
        else:
            y_mgc, y_lf0, y_vuv, y_bap = split_streams(y, list(self.stream_sizes))
        lf0, lf0_residual = self._lf0(
            x, x_other, spk_e, spk_e_other, lengths, y_lf0, train=train
        )
        cond_lf0 = _point(lf0) if is_inference else y_lf0
        mgc = self._dec(
            self._mgc, jnp.concatenate([x, cond_lf0], -1), lengths, y_mgc,
            spk_e, train,
        )
        bap = self._dec(
            self._bap, jnp.concatenate([x, cond_lf0], -1), lengths, y_bap,
            spk_e, train,
        )
        if is_inference:
            vuv_inp = self._vuv_inputs(x, _point(mgc), _point(bap), cond_lf0)
        else:
            vuv_inp = self._vuv_inputs(x, y_mgc, y_bap, y_lf0)
        vuv = self._dec(self._vuv, vuv_inp, lengths, y_vuv, spk_e, train)
        return mgc, lf0, vuv, bap, lf0_residual

    def __call__(
        self, x_main, x_sub, spks_list, lengths=None, ys=None, train: bool = False
    ):
        """Mirrors reference forward :1594-1768: the full cascade runs only
        for the MAIN track; the sub track contributes its cross-conditioned
        lf0 prediction (for the interaction losses), its other streams
        come back as the teacher targets.  At inference the reference
        returns ``(out, out)`` — the sub slot is a copy of the main output.

        Deviation kept on purpose: the reference trains the AR lf0 model
        free-running here (forward :1646-1651 omits y); we teacher-force
        it like every other trainer path.
        """
        is_inference = ys is None
        T = x_main.shape[1]
        e_m = self._expand(spks_list[0], T)
        e_s = self._expand(spks_list[1], T)
        y_m = None if ys is None else ys[0]
        mgc, lf0, vuv, bap, res_m = self._main_cascade(
            x_main, x_sub, e_m, e_s, lengths, y_m, train
        )
        if is_inference:
            out_m = jnp.concatenate([_point(mgc), _point(lf0), vuv, _point(bap)], -1)
            return out_m, out_m
        if not self.output_subtrack:
            return ((mgc, lf0, vuv, bap), res_m), (None, None)
        y_s = ys[1]
        y_mgc_s, y_lf0_s, y_vuv_s, y_bap_s = split_streams(
            y_s, list(self.stream_sizes)
        )
        lf0_s, res_s = self._lf0(
            x_sub, x_main, e_s, e_m, lengths, y_lf0_s, train=train
        )
        return ((mgc, lf0, vuv, bap), res_m), (
            (y_mgc_s, lf0_s, y_vuv_s, y_bap_s),
            res_s,
        )

    def inference(self, x_main, x_sub, spks=None, lengths=None):
        return self(x_main, x_sub, spks, lengths)

    def inference_main(self, x_main, x_sub, spks=None, lengths=None):
        """Main-track-only inference (identical to ``inference(...)[0]``;
        the reference's sub slot is a copy anyway)."""
        return self(x_main, x_sub, spks, lengths)[0]


class V2MultiTrackNPSSMDNMultistreamParametricModel(
    MultiTrackNPSSMDNMultistreamParametricModel
):
    """Experimental variant (reference multistream.py:1781): identical to
    the base multitrack NPSS cascade except it always emits sub-track
    predictions (no ``output_subtrack`` switch); kept as an alias with
    ``output_subtrack=True`` for config compatibility."""

    output_subtrack: bool = True
