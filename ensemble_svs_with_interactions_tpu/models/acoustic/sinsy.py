"""Sinsy-style acoustic model with residual F0 prediction.

Parity target: /root/reference/nnsvs/acoustic_models/sinsy.py:14-199
(ResSkipF0FFConvLSTM, hono2021sinsy).  FF stack -> concat score-lf0 ->
Conv(+BN) stack -> biLSTM (+optional input skip) -> linear/MDN head, with
the lf0 output column replaced by score-lf0 + bounded residual.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ensemble_svs_with_interactions_tpu.base import BaseModel, PredictionType
from ensemble_svs_with_interactions_tpu.models.acoustic.util import (
    predict_lf0_with_residual,
    set_lf0_column,
)
from ensemble_svs_with_interactions_tpu.models.layers import (
    LSTM,
    MaskedBatchNorm,
    ReflectConv1d,
    kernel_initializer,
)
from ensemble_svs_with_interactions_tpu.ops.mdn import (
    MDNLayer,
    mdn_get_most_probable_sigma_and_mu,
)


class ResSkipF0FFConvLSTM(BaseModel):
    """FFN + Conv1d + LSTM with residual F0 and optional skip connections."""

    in_dim: int
    ff_hidden_dim: int = 2048
    conv_hidden_dim: int = 1024
    lstm_hidden_dim: int = 256
    out_dim: int = 199
    dropout: float = 0.0
    num_lstm_layers: int = 2
    bidirectional: bool = True
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    skip_inputs: bool = False
    init_type: str = "none"
    use_mdn: bool = False
    num_gaussians: int = 8
    dim_wise: bool = False

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    def has_residual_lf0_prediction(self):
        return True

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        init = kernel_initializer(self.init_type)
        lf0_score = x[:, :, self.in_lf0_idx][..., None]

        h = x
        for _ in range(3):
            h = nn.relu(nn.Dense(self.ff_hidden_dim, kernel_init=init)(h))
        h = jnp.concatenate([h, lf0_score], axis=-1)

        mask = None
        if lengths is not None:
            mask = jnp.arange(h.shape[1])[None, :] < jnp.asarray(lengths)[:, None]
        for _ in range(3):
            # init_type covers convs too (reference init_weights
            # re-initializes every Conv1d/Linear)
            h = ReflectConv1d(
                self.conv_hidden_dim, kernel_size=7, kernel_init=init
            )(h)
            h = MaskedBatchNorm()(h, mask=mask, use_running_average=not train)
            h = nn.relu(h)

        h = LSTM(
            self.lstm_hidden_dim,
            num_layers=self.num_lstm_layers,
            bidirectional=self.bidirectional,
            dropout=self.dropout,
        )(h, lengths, train=train)
        if self.skip_inputs:
            h = jnp.concatenate([h, x], axis=-1)

        if self.use_mdn:
            log_pi, log_sigma, mu = MDNLayer(
                self.out_dim, self.num_gaussians, self.dim_wise
            )(h)
        else:
            mu = nn.Dense(self.out_dim, kernel_init=init)(h)

        lf0_pred, lf0_residual = predict_lf0_with_residual(
            x,
            mu,
            self.in_lf0_idx,
            self.in_lf0_min,
            self.in_lf0_max,
            self.out_lf0_idx,
            self.out_lf0_mean,
            self.out_lf0_scale,
        )
        mu = set_lf0_column(mu, lf0_pred, self.out_lf0_idx)

        if self.use_mdn:
            return (log_pi, log_sigma, mu), lf0_residual
        return mu, lf0_residual

    def inference(self, x, lengths=None):
        if self.use_mdn:
            (log_pi, log_sigma, mu), _ = self(x, lengths)
            sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
            return mu, sigma
        return self(x, lengths)[0]
