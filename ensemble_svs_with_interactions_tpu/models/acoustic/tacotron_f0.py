"""Residual-F0 autoregressive Tacotron decoders, single- and multi-track.

Parity targets: /root/reference/nnsvs/acoustic_models/tacotron_f0.py
(ResF0NonAttentiveDecoder :19, BiLSTMResF0NonAttentiveDecoder :528,
MultiTrackBiLSTMResF0NonAttentiveDecoder :757 with _merge_track_features
:924-967 — the interaction F0 model: both tracks share the phoneme
embedding, add per-track speaker embeddings, are summed, and the decoder
consumes BOTH score lf0 tracks with the main-track residual connection).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ensemble_svs_with_interactions_tpu.base import BaseModel, PredictionType
from ensemble_svs_with_interactions_tpu.models.layers import (
    LSTM,
    MaskedBatchNorm,
    PhonemeContextEmbedding,
    ReflectConv1d,
    kernel_initializer,
)
from ensemble_svs_with_interactions_tpu.models.tacotron import (
    apply_postnet,
    ar_decode,
)


class ResF0NonAttentiveDecoder(BaseModel):
    """AR Tacotron decoder with residual F0 (tacotron_f0.py:19)."""

    in_dim: int = 512
    out_dim: int = 1
    layers: int = 2
    hidden_dim: int = 1024
    prenet_layers: int = 2
    prenet_hidden_dim: int = 256
    prenet_dropout: float = 0.5
    zoneout: float = 0.1
    reduction_factor: int = 1
    downsample_by_conv: bool = False
    scaled_tanh: bool = True
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    init_type: str = "none"
    use_mdn: bool = False
    num_gaussians: int = 8
    sampling_mode: str = "mean"
    eval_dropout: bool = True

    def is_autoregressive(self) -> bool:
        return True

    def has_residual_lf0_prediction(self) -> bool:
        return True

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    @nn.compact
    def __call__(self, encoder_outs, lengths=None, y=None, train: bool = False):
        return ar_decode(
            self,
            encoder_outs,
            y,
            train,
            residual_f0=True,
            in_lf0_idx=self.in_lf0_idx,
            lf0_params=(
                self.in_lf0_min,
                self.in_lf0_max,
                self.out_lf0_mean,
                self.out_lf0_scale,
            ),
            scaled_tanh=self.scaled_tanh,
            out_lf0_idx=self.out_lf0_idx,
        )

    def inference(self, x, lengths=None):
        return self(x, lengths)[0]


class MDNResF0NonAttentiveDecoder(ResF0NonAttentiveDecoder):
    """AR ResF0 decoder with per-step MDN outputs (tacotron_f0.py:245)."""

    use_mdn: bool = True


class _SinsyEncoder(nn.Module):
    """FF -> concat(lf0 scores) -> Conv(+BN) -> biLSTM encoder used by the
    BiLSTM ResF0 decoders (tacotron_f0.py:622-649)."""

    ff_hidden_dim: int
    conv_hidden_dim: int
    lstm_hidden_dim: int
    num_lstm_layers: int
    dropout: float
    init_type: str = "none"

    @nn.compact
    def __call__(self, x, lf0_scores, lengths=None, train: bool = False):
        init = kernel_initializer(self.init_type)
        h = x
        for _ in range(3):
            h = nn.relu(nn.Dense(self.ff_hidden_dim, kernel_init=init)(h))
        h = jnp.concatenate([h] + lf0_scores, axis=-1)
        mask = None
        if lengths is not None:
            mask = jnp.arange(h.shape[1])[None, :] < jnp.asarray(lengths)[:, None]
        for _ in range(3):
            h = ReflectConv1d(self.conv_hidden_dim, kernel_size=7)(h)
            h = MaskedBatchNorm()(h, mask=mask, use_running_average=not train)
            h = nn.relu(h)
        h = LSTM(
            self.lstm_hidden_dim,
            num_layers=self.num_lstm_layers,
            bidirectional=True,
            dropout=self.dropout,
        )(h, lengths, train=train)
        return h


class BiLSTMResF0NonAttentiveDecoder(BaseModel):
    """Sinsy-like encoder + AR ResF0 decoder (tacotron_f0.py:528)."""

    in_dim: int = 512
    ff_hidden_dim: int = 2048
    conv_hidden_dim: int = 1024
    lstm_hidden_dim: int = 256
    num_lstm_layers: int = 2
    dropout: float = 0.0
    out_dim: int = 80
    decoder_layers: int = 2
    decoder_hidden_dim: int = 1024
    prenet_layers: int = 2
    prenet_hidden_dim: int = 256
    prenet_dropout: float = 0.5
    zoneout: float = 0.1
    reduction_factor: int = 1
    downsample_by_conv: bool = False
    scaled_tanh: bool = True
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    use_mdn: bool = False
    num_gaussians: int = 4
    sampling_mode: str = "mean"
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None
    init_type: str = "none"
    eval_dropout: bool = True

    def is_autoregressive(self) -> bool:
        return True

    def has_residual_lf0_prediction(self) -> bool:
        return True

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    @nn.compact
    def __call__(self, x, lengths=None, y=None, spk_embs=None, train: bool = False):
        lf0_score = x[:, :, self.in_lf0_idx][..., None]
        if self.embed_dim is not None:
            x = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(x)
        if spk_embs is not None:
            x = x + spk_embs

        h = _SinsyEncoder(
            self.ff_hidden_dim,
            self.conv_hidden_dim,
            self.lstm_hidden_dim,
            self.num_lstm_layers,
            self.dropout,
            self.init_type,
        )(x, [lf0_score], lengths, train=train)
        # tell the decoder the score lf0 (decoder's in_lf0_idx = -1)
        h = jnp.concatenate([h, lf0_score], axis=-1)

        return ar_decode(
            self,
            h,
            y,
            train,
            residual_f0=True,
            in_lf0_idx=-1,
            lf0_params=(
                self.in_lf0_min,
                self.in_lf0_max,
                self.out_lf0_mean,
                self.out_lf0_scale,
            ),
            scaled_tanh=self.scaled_tanh,
            out_lf0_idx=self.out_lf0_idx,
        )

    def inference(self, x, lengths=None, spk_embs=None):
        return self(x, lengths, spk_embs=spk_embs)[0]


class MultiTrackBiLSTMResF0NonAttentiveDecoder(BaseModel):
    """THE interaction F0 model (tacotron_f0.py:757): encodes BOTH tracks
    through a shared phoneme embedding, adds per-track speaker embeddings,
    SUMS the track features (:965), and conditions the conv stack and AR
    decoder on both score-lf0 tracks (decoder in_lf0_idx = -2 = main)."""

    in_dim: int = 512
    ff_hidden_dim: int = 2048
    conv_hidden_dim: int = 1024
    lstm_hidden_dim: int = 256
    num_lstm_layers: int = 2
    dropout: float = 0.0
    out_dim: int = 1
    decoder_layers: int = 2
    decoder_hidden_dim: int = 1024
    prenet_layers: int = 2
    prenet_hidden_dim: int = 256
    prenet_dropout: float = 0.5
    zoneout: float = 0.1
    reduction_factor: int = 1
    downsample_by_conv: bool = False
    scaled_tanh: bool = True
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 0
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    use_mdn: bool = False
    num_gaussians: int = 4
    sampling_mode: str = "mean"
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None
    init_type: str = "none"
    eval_dropout: bool = True
    # accepted for reference-config compatibility; the reference declares
    # num_speaker=15 but never reads it (tacotron_f0.py:800 — speaker
    # embeddings arrive pre-computed as spk_emb_main/spk_emb_sub)
    num_speaker: Optional[int] = None

    def is_autoregressive(self) -> bool:
        return True

    def has_residual_lf0_prediction(self) -> bool:
        return True

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    @nn.compact
    def __call__(
        self,
        x_main,
        x_sub,
        spk_emb_main=None,
        spk_emb_sub=None,
        lengths=None,
        y=None,
        train: bool = False,
    ):
        lf0_score_main = x_main[:, :, self.in_lf0_idx][..., None]
        lf0_score_sub = x_sub[:, :, self.in_lf0_idx][..., None]

        if self.embed_dim is not None:
            shared = PhonemeContextEmbedding(
                self.in_dim,
                self.embed_dim,
                self.in_ph_start_idx,
                self.in_ph_end_idx,
                name="shared_ph_embed",
            )
            x_main = shared(x_main)
            x_sub = shared(x_sub)
        if spk_emb_main is not None:
            x_main = x_main + spk_emb_main
        if spk_emb_sub is not None:
            x_sub = x_sub + spk_emb_sub
        # cross-track mixing by summation (reference :965)
        x = x_main + x_sub

        h = _SinsyEncoder(
            self.ff_hidden_dim,
            self.conv_hidden_dim,
            self.lstm_hidden_dim,
            self.num_lstm_layers,
            self.dropout,
            self.init_type,
        )(x, [lf0_score_main, lf0_score_sub], lengths, train=train)
        h = jnp.concatenate([h, lf0_score_main, lf0_score_sub], axis=-1)

        return ar_decode(
            self,
            h,
            y,
            train,
            residual_f0=True,
            in_lf0_idx=-2,  # main-track score lf0
            lf0_params=(
                self.in_lf0_min,
                self.in_lf0_max,
                self.out_lf0_mean,
                self.out_lf0_scale,
            ),
            scaled_tanh=self.scaled_tanh,
            out_lf0_idx=self.out_lf0_idx,
        )

    def inference(self, x_main, x_sub, spk_emb_main=None, spk_emb_sub=None, lengths=None):
        return self(x_main, x_sub, spk_emb_main, spk_emb_sub, lengths)[0]


class BiLSTMNonAttentiveDecoder(BaseModel):
    """Sinsy-like encoder + plain (non-ResF0) AR decoder
    (reference nnsvs/acoustic_models/tacotron.py:118,312; the MDN variant
    is selected with ``use_mdn``).  Unlike the ResF0 variants, the plain
    decoder has NO score-lf0 conditioning (reference tacotron.py:198-232:
    the encoder is ff -> conv -> biLSTM only), and supports an optional
    residual Post-Net (forward returns [coarse, fine],
    tacotron.py:293-300)."""

    in_dim: int = 512
    ff_hidden_dim: int = 2048
    conv_hidden_dim: int = 1024
    lstm_hidden_dim: int = 256
    num_lstm_layers: int = 2
    dropout: float = 0.0
    out_dim: int = 80
    decoder_layers: int = 2
    decoder_hidden_dim: int = 1024
    prenet_layers: int = 2
    prenet_hidden_dim: int = 256
    prenet_dropout: float = 0.5
    zoneout: float = 0.1
    reduction_factor: int = 1
    downsample_by_conv: bool = False
    use_mdn: bool = False
    num_gaussians: int = 4
    sampling_mode: str = "mean"
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None
    init_type: str = "none"
    initial_value: float = 0.0
    prenet_noise_std: float = 0.0
    eval_dropout: bool = True
    postnet_layers: int = 0
    postnet_channels: int = 512
    postnet_kernel_size: int = 5
    postnet_dropout: float = 0.0

    def is_autoregressive(self) -> bool:
        return True

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    @nn.compact
    def __call__(self, x, lengths=None, y=None, spk_embs=None, train: bool = False):
        if self.embed_dim is not None:
            x = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(x)
        if spk_embs is not None:
            x = x + spk_embs
        h = _SinsyEncoder(
            self.ff_hidden_dim,
            self.conv_hidden_dim,
            self.lstm_hidden_dim,
            self.num_lstm_layers,
            self.dropout,
            self.init_type,
        )(x, [], lengths, train=train)
        outs, _ = ar_decode(
            self, h, y, train, residual_f0=False,
            initial_value=self.initial_value,
        )
        if self.postnet_layers > 0 and not self.use_mdn:
            return apply_postnet(self, outs, lengths, train)
        return outs

    def inference(self, x, lengths=None, spk_embs=None):
        outs = self(x, lengths, spk_embs=spk_embs)
        return outs[-1] if isinstance(outs, list) else outs


class BiLSTMMDNNonAttentiveDecoder(BiLSTMNonAttentiveDecoder):
    """MDN-headed variant (reference tacotron.py:312)."""

    use_mdn: bool = True
