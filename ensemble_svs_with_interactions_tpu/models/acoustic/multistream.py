"""Multi-stream acoustic models with a separate F0 model.

Parity targets: /root/reference/nnsvs/acoustic_models/multistream.py
(MultistreamSeparateF0ParametricModel :19,
MultiSpeakerMultistreamSeparateF0ParametricModel :177,
MultiTrackMultistreamSeparateF0ParametricModel :348 — the recipe's
multitrack acoustic netG).

Factorization: p(MGC, LF0, VUV, BAP | C) =
  p(LF0|C) p(MGC|LF0,C) p(VUV|LF0,C) p(BAP|LF0,C):
the lf0 model runs first (optionally autoregressive), the shared encoder
output is concatenated with rest flags and (teacher-forced or predicted)
lf0, and per-stream decoders run on that.

NOTE: the reference's multitrack forward feeds ``encoder_outs_main`` to the
sub-track decoders (multistream.py:520-522) — an apparent copy-paste slip;
this implementation routes ``encoder_outs_sub`` to the sub-track decoders.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ensemble_svs_with_interactions_tpu.base import BaseModel, PredictionType
from ensemble_svs_with_interactions_tpu.models.acoustic.util import (
    concat_stream_outputs,
    point_estimate,
)
from ensemble_svs_with_interactions_tpu.ops.multistream import split_streams


def _maybe_instantiate(node):
    from collections.abc import Mapping

    if node is None or isinstance(node, nn.Module):
        return node
    if isinstance(node, Mapping):
        from ensemble_svs_with_interactions_tpu.utils.config import instantiate

        return instantiate(dict(node))
    raise TypeError(f"cannot build module from {type(node)}")


class MultistreamSeparateF0ParametricModel(BaseModel):
    """Single-track multistream WORLD model (multistream.py:19)."""

    in_dim: int
    out_dim: int
    stream_sizes: Sequence[int]
    reduction_factor: int
    encoder: Any
    mgc_model: Any
    lf0_model: Any
    vuv_model: Any
    bap_model: Any
    vib_model: Any = None
    vib_flags_model: Any = None
    in_rest_idx: int = 1
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    lf0_teacher_forcing: bool = True

    def setup(self):
        self._encoder = _maybe_instantiate(self.encoder)
        self._mgc = _maybe_instantiate(self.mgc_model)
        self._lf0 = _maybe_instantiate(self.lf0_model)
        self._vuv = _maybe_instantiate(self.vuv_model)
        self._bap = _maybe_instantiate(self.bap_model)

    def prediction_type(self):
        return PredictionType.MULTISTREAM_HYBRID

    def has_residual_lf0_prediction(self):
        return True

    def is_autoregressive(self):
        return self._lf0.is_autoregressive()

    def __call__(self, x, lengths=None, y=None, train: bool = False):
        assert x.shape[-1] == self.in_dim
        if y is not None:
            y_mgc, y_lf0, y_vuv, y_bap = split_streams(y, list(self.stream_sizes))
        else:
            y_mgc = y_lf0 = y_vuv = y_bap = None

        lf0, lf0_residual = self._lf0(x, lengths, y_lf0, train=train)
        if y is None:
            # probabilistic lf0 submodels ((mu, sigma) / MDN 3-tuples) are
            # reduced to the mu trajectory at inference, as the reference's
            # MDN AR decoders do internally (tacotron_f0.py:511-514)
            lf0 = point_estimate(lf0)

        if self._encoder is not None:
            enc = self._encoder(x, lengths, train=train)
            rest = x[:, :, self.in_rest_idx][..., None]
            cond_lf0 = y_lf0 if (self.lf0_teacher_forcing and y is not None) else lf0
            enc = jnp.concatenate([enc, rest, cond_lf0], axis=-1)
        else:
            enc = x

        mgc = self._mgc(enc, lengths, y_mgc, train=train)
        vuv = self._vuv(enc, lengths, y_vuv, train=train)
        bap = self._bap(enc, lengths, y_bap, train=train)

        out = concat_stream_outputs([mgc, lf0, vuv, bap], self.out_dim)
        return out, lf0_residual

    def inference(self, x, lengths=None):
        out = self(x, lengths)[0]
        return out[-1] if isinstance(out, list) else out


class MultiSpeakerMultistreamSeparateF0ParametricModel(BaseModel):
    """+ speaker embedding added to all submodel inputs (multistream.py:177)."""

    in_dim: int
    out_dim: int
    stream_sizes: Sequence[int]
    reduction_factor: int
    encoder: Any
    mgc_model: Any
    lf0_model: Any
    vuv_model: Any
    bap_model: Any
    speaker_embedding: Any
    vib_model: Any = None
    vib_flags_model: Any = None
    in_rest_idx: int = 1
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    lf0_teacher_forcing: bool = True

    def setup(self):
        self._encoder = _maybe_instantiate(self.encoder)
        self._mgc = _maybe_instantiate(self.mgc_model)
        self._lf0 = _maybe_instantiate(self.lf0_model)
        self._vuv = _maybe_instantiate(self.vuv_model)
        self._bap = _maybe_instantiate(self.bap_model)
        self._spk = _maybe_instantiate(self.speaker_embedding)

    def prediction_type(self):
        return PredictionType.MULTISTREAM_HYBRID

    def has_residual_lf0_prediction(self):
        return True

    def __call__(self, x, spks, lengths=None, y=None, train: bool = False):
        if y is not None:
            y_mgc, y_lf0, y_vuv, y_bap = split_streams(y, list(self.stream_sizes))
        else:
            y_mgc = y_lf0 = y_vuv = y_bap = None

        spk_embs = self._spk(spks)
        if spk_embs.ndim == 2:
            spk_embs = spk_embs[:, None, :]
        spk_embs = jnp.broadcast_to(
            spk_embs, (x.shape[0], x.shape[1], spk_embs.shape[-1])
        )

        lf0, lf0_residual = self._lf0(
            x, lengths, y_lf0, spk_embs=spk_embs, train=train
        )
        if y is None:
            lf0 = point_estimate(lf0)

        if self._encoder is not None:
            enc = self._encoder(x, lengths, spk_embs=spk_embs, train=train)
            rest = x[:, :, self.in_rest_idx][..., None]
            cond_lf0 = y_lf0 if (self.lf0_teacher_forcing and y is not None) else lf0
            enc = jnp.concatenate([enc, rest, cond_lf0], axis=-1)
        else:
            enc = x

        mgc = self._mgc(enc, lengths, y_mgc, train=train)
        vuv = self._vuv(enc, lengths, y_vuv, train=train)
        bap = self._bap(enc, lengths, y_bap, train=train)
        out = concat_stream_outputs([mgc, lf0, vuv, bap], self.out_dim)
        return out, lf0_residual

    def inference(self, x, spks, lengths=None):
        out = self(x, spks, lengths)[0]
        return out[-1] if isinstance(out, list) else out


class MultiTrackMultistreamSeparateF0ParametricModel(BaseModel):
    """THE multitrack acoustic model (multistream.py:348): the lf0 model is
    called twice with (main, sub) and (sub, main), a MultiTrackLSTMEncoder
    encodes both tracks, and per-stream decoders predict each track.
    Returns ``((out_main, lf0_res_main), (out_sub, lf0_res_sub))`` in
    training and ``(out_main, out_sub)`` at inference."""

    in_dim: int
    out_dim: int
    stream_sizes: Sequence[int]
    reduction_factor: int
    encoder: Any
    mgc_model: Any
    lf0_model: Any
    vuv_model: Any
    bap_model: Any
    speaker_embedding: Any
    vib_model: Any = None
    vib_flags_model: Any = None
    in_rest_idx: int = 1
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    lf0_teacher_forcing: bool = True
    # The reference feeds encoder_outs_MAIN to the sub-track decoders
    # (multistream.py:520-522) — almost certainly a slip; we route
    # encoder_outs_sub by default.  Set True for bit-exact behavior with
    # reference-trained (ported) checkpoints.
    compat_sub_encoder_outs: bool = False

    def setup(self):
        self._encoder = _maybe_instantiate(self.encoder)
        self._mgc = _maybe_instantiate(self.mgc_model)
        self._lf0 = _maybe_instantiate(self.lf0_model)
        self._vuv = _maybe_instantiate(self.vuv_model)
        self._bap = _maybe_instantiate(self.bap_model)
        self._spk = _maybe_instantiate(self.speaker_embedding)

    def prediction_type(self):
        return PredictionType.MULTISTREAM_HYBRID

    def has_residual_lf0_prediction(self):
        return True

    def is_autoregressive(self):
        return self._lf0.is_autoregressive()

    def _expand_spk(self, spk, T):
        e = self._spk(spk)
        if e.ndim == 2:
            e = e[:, None, :]
        return jnp.broadcast_to(e, (e.shape[0], T, e.shape[-1]))

    def __call__(
        self, x_main, x_sub, spks_list, lengths=None, ys=None, train: bool = False
    ):
        assert x_main.shape[-1] == self.in_dim
        is_inference = ys is None
        if ys is not None:
            y_mgc_m, y_lf0_m, y_vuv_m, y_bap_m = split_streams(
                ys[0], list(self.stream_sizes)
            )
            y_mgc_s, y_lf0_s, y_vuv_s, y_bap_s = split_streams(
                ys[1], list(self.stream_sizes)
            )
        else:
            y_mgc_m = y_lf0_m = y_vuv_m = y_bap_m = None
            y_mgc_s = y_lf0_s = y_vuv_s = y_bap_s = None

        T = x_main.shape[1]
        spk_m = self._expand_spk(spks_list[0], T)
        spk_s = self._expand_spk(spks_list[1], T)

        # cross-track F0: each track conditioned on the other
        lf0_m, lf0_res_m = self._lf0(
            x_main, x_sub, spk_m, spk_s, lengths, y_lf0_m, train=train
        )
        lf0_s, lf0_res_s = self._lf0(
            x_sub, x_main, spk_s, spk_m, lengths, y_lf0_s, train=train
        )
        if is_inference:
            lf0_m = point_estimate(lf0_m)
            lf0_s = point_estimate(lf0_s)

        if self._encoder is not None:
            enc_m = self._encoder(
                x_main, x_sub, spk_embs=(spk_m, spk_s), lengths=lengths, train=train
            )
            enc_s = self._encoder(
                x_sub, x_main, spk_embs=(spk_s, spk_m), lengths=lengths, train=train
            )
            rest_m = x_main[:, :, self.in_rest_idx][..., None]
            rest_s = x_sub[:, :, self.in_rest_idx][..., None]
            if self.lf0_teacher_forcing and ys is not None:
                enc_m = jnp.concatenate([enc_m, rest_m, y_lf0_m], axis=-1)
                enc_s = jnp.concatenate([enc_s, rest_s, y_lf0_s], axis=-1)
            else:
                enc_m = jnp.concatenate([enc_m, rest_m, lf0_m], axis=-1)
                enc_s = jnp.concatenate([enc_s, rest_s, lf0_s], axis=-1)
        else:
            enc_m, enc_s = x_main, x_sub

        enc_for_sub = enc_m if self.compat_sub_encoder_outs else enc_s
        mgc_m = self._mgc(enc_m, lengths, y_mgc_m, train=train)
        vuv_m = self._vuv(enc_m, lengths, y_vuv_m, train=train)
        bap_m = self._bap(enc_m, lengths, y_bap_m, train=train)
        mgc_s = self._mgc(enc_for_sub, lengths, y_mgc_s, train=train)
        vuv_s = self._vuv(enc_for_sub, lengths, y_vuv_s, train=train)
        bap_s = self._bap(enc_for_sub, lengths, y_bap_s, train=train)

        out_m = jnp.concatenate([mgc_m, lf0_m, vuv_m, bap_m], axis=-1)
        out_s = jnp.concatenate([mgc_s, lf0_s, vuv_s, bap_s], axis=-1)
        assert out_m.shape[-1] == self.out_dim

        if is_inference:
            return out_m, out_s
        return (out_m, lf0_res_m), (out_s, lf0_res_s)

    def inference(self, x_main, x_sub, spks=None, lengths=None):
        return self(x_main, x_sub, spks, lengths)

    def inference_main(self, x_main, x_sub, spks=None, lengths=None):
        """MAIN-track-only inference.

        Pairwise ensemble synthesis uses each track once as the main track
        and discards the sub-track outputs, so the sub-track encoder/decoder
        passes in ``__call__`` are pure waste there (~2x compute).  This
        path computes only lf0/enc/decoders for the main track —
        numerically identical to ``inference(...)[0]``.
        """
        T = x_main.shape[1]
        spk_m = self._expand_spk(spks[0], T)
        spk_s = self._expand_spk(spks[1], T)
        lf0_m, _ = self._lf0(
            x_main, x_sub, spk_m, spk_s, lengths, None, train=False
        )
        lf0_m = point_estimate(lf0_m)
        if self._encoder is not None:
            enc_m = self._encoder(
                x_main, x_sub, spk_embs=(spk_m, spk_s), lengths=lengths,
                train=False,
            )
            rest_m = x_main[:, :, self.in_rest_idx][..., None]
            enc_m = jnp.concatenate([enc_m, rest_m, lf0_m], axis=-1)
        else:
            enc_m = x_main
        mgc_m = self._mgc(enc_m, lengths, None, train=False)
        vuv_m = self._vuv(enc_m, lengths, None, train=False)
        bap_m = self._bap(enc_m, lengths, None, train=False)
        return jnp.concatenate([mgc_m, lf0_m, vuv_m, bap_m], axis=-1)


class MultistreamSeparateF0MelModel(BaseModel):
    """mel + lf0 + vuv multistream model (reference multistream.py:2055)."""

    in_dim: int
    out_dim: int
    stream_sizes: Sequence[int]
    reduction_factor: int
    encoder: Any
    mel_model: Any
    lf0_model: Any
    vuv_model: Any
    in_rest_idx: int = 0
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    lf0_teacher_forcing: bool = True

    def setup(self):
        self._encoder = _maybe_instantiate(self.encoder)
        self._mel = _maybe_instantiate(self.mel_model)
        self._lf0 = _maybe_instantiate(self.lf0_model)
        self._vuv = _maybe_instantiate(self.vuv_model)

    def prediction_type(self):
        return PredictionType.MULTISTREAM_HYBRID

    def has_residual_lf0_prediction(self):
        return True

    def __call__(self, x, lengths=None, y=None, train: bool = False):
        assert len(self.stream_sizes) == 3
        if y is not None:
            y_mel, y_lf0, y_vuv = split_streams(y, list(self.stream_sizes))
        else:
            y_mel = y_lf0 = y_vuv = None
        lf0, lf0_residual = self._lf0(x, lengths, y_lf0, train=train)
        if y is None:
            lf0 = point_estimate(lf0)
        if self._encoder is not None:
            enc = self._encoder(x, lengths, train=train)
            rest = x[:, :, self.in_rest_idx][..., None]
            cond = y_lf0 if (self.lf0_teacher_forcing and y is not None) else lf0
            enc = jnp.concatenate([enc, rest, cond], axis=-1)
        else:
            enc = x
        mel = self._mel(enc, lengths, y_mel, train=train)
        vuv = self._vuv(enc, lengths, y_vuv, train=train)
        if y is None:
            return (
                jnp.concatenate([point_estimate(mel), lf0, vuv], axis=-1),
                lf0_residual,
            )
        return (mel, lf0, vuv), lf0_residual

    def inference(self, x, lengths=None):
        return self(x, lengths)[0]


class MDNMultistreamSeparateF0MelModel(BaseModel):
    """Encoder-less mel cascade (reference multistream.py:2207): unlike
    :class:`MultistreamSeparateF0MelModel`, the mel decoder is conditioned
    directly on ``cat(x, lf0)`` and V/UV on ``(x [, lf0] [, mel])``,
    mirroring the NPSS factorization.  Despite the MDN name, sub-decoders
    may be deterministic, MDN, or diffusion (the reference pairs it with
    GaussianDiffusion in acoustic_nnsvs_melf0_ar_f0_diff_mel.yaml)."""

    in_dim: int
    out_dim: int
    stream_sizes: Sequence[int]
    reduction_factor: int
    lf0_model: Any
    mel_model: Any
    vuv_model: Any
    in_rest_idx: int = 0
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    vuv_model_lf0_conditioning: bool = True
    vuv_model_mel_conditioning: bool = True

    def setup(self):
        self._mel = _maybe_instantiate(self.mel_model)
        self._lf0 = _maybe_instantiate(self.lf0_model)
        self._vuv = _maybe_instantiate(self.vuv_model)

    def prediction_type(self):
        return PredictionType.MULTISTREAM_HYBRID

    def has_residual_lf0_prediction(self):
        return True

    def is_autoregressive(self):
        return self._lf0.is_autoregressive() or self._mel.is_autoregressive()

    def __call__(self, x, lengths=None, y=None, train: bool = False):
        from ensemble_svs_with_interactions_tpu.models.acoustic.npss import (
            _run_stream_decoder,
        )

        assert x.shape[-1] == self.in_dim
        assert len(self.stream_sizes) == 3
        is_inference = y is None
        if is_inference:
            y_mel = y_lf0 = y_vuv = None
        else:
            y_mel, y_lf0, y_vuv = split_streams(y, list(self.stream_sizes))

        lf0_out = self._lf0(x, lengths, y_lf0, train=train)
        if isinstance(lf0_out, tuple) and len(lf0_out) == 2:
            lf0, lf0_residual = lf0_out
        else:
            lf0, lf0_residual = lf0_out, None
        cond_lf0 = point_estimate(lf0) if is_inference else y_lf0

        mel = _run_stream_decoder(
            self._mel,
            jnp.concatenate([x, cond_lf0], axis=-1),
            lengths,
            y_mel,
            train=train,
        )

        # V/UV conditioning order: (x, lf0, mel) — reference
        # multistream.py:2345-2360 appends lf0 then mel (the in-source
        # "(x, mel, lf0)" comment contradicts its own code)
        vuv_inp = [x]
        if self.vuv_model_lf0_conditioning:
            vuv_inp.append(cond_lf0 if is_inference else y_lf0)
        if self.vuv_model_mel_conditioning:
            vuv_inp.append(point_estimate(mel) if is_inference else y_mel)
        vuv = self._vuv(
            jnp.concatenate(vuv_inp, axis=-1), lengths, y_vuv, train=train
        )

        if is_inference:
            out = jnp.concatenate(
                [point_estimate(mel), point_estimate(lf0), vuv], axis=-1
            )
            assert out.shape[-1] == self.out_dim
            return out, out  # reference returns (out, out) at inference
        return (mel, lf0, vuv), lf0_residual

    def inference(self, x, lengths=None):
        return self(x, lengths)[0]


class MultiTrackMultistreamSeparateF0ParametricModelv3(
    MultiTrackMultistreamSeparateF0ParametricModel
):
    """Experimental variant (reference multistream.py:580).

    In the reference, v3 differs from the base model only by building an
    unused ``cat(encoder_outs_main, encoder_outs_sub)`` tensor (:747) while
    the per-stream decoders still consume the main-track encoder output;
    behaviorally it matches the base class, so it is kept as an alias for
    config compatibility.
    """
