"""Residual-F0 variants of generic backbones.

Parity targets: /root/reference/nnsvs/acoustic_models/__init__.py:62
(ResF0Conv1dResnet), :210 (ResF0VariancePredictor).  Each runs its backbone,
then replaces the lf0 output column with score-lf0 + bounded residual and
returns ``(out, lf0_residual)``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ensemble_svs_with_interactions_tpu.base import BaseModel, PredictionType
from ensemble_svs_with_interactions_tpu.models.acoustic.util import (
    predict_lf0_with_residual,
    set_lf0_column,
)
from ensemble_svs_with_interactions_tpu.models.layers import (
    PhonemeContextEmbedding,
    ReflectConv1d,
    ResnetBlock,
    kernel_initializer,
)
from ensemble_svs_with_interactions_tpu.ops.mdn import (
    MDNLayer,
    mdn_get_most_probable_sigma_and_mu,
)


class _ResF0Mixin:
    def has_residual_lf0_prediction(self):
        return True

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if getattr(self, "use_mdn", False)
            else PredictionType.DETERMINISTIC
        )

    def _finalize(self, x, mu):
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
        return set_lf0_column(mu, lf0_pred, self.out_lf0_idx), lf0_residual

    def inference(self, x, lengths=None):
        if getattr(self, "use_mdn", False):
            (log_pi, log_sigma, mu), _ = self(x, lengths)
            sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
            return mu, sigma
        return self(x, lengths)[0]


class ResF0Conv1dResnet(_ResF0Mixin, BaseModel):
    """Conv1dResnet + residual F0 (reference acoustic_models/__init__.py:62)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 4
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    init_type: str = "none"
    use_mdn: bool = False
    num_gaussians: int = 8
    dim_wise: bool = False

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        init = kernel_initializer(self.init_type)
        h = ReflectConv1d(
            self.hidden_dim, kernel_size=7, use_weight_norm=True,
            kernel_init=init,
        )(x)
        for n in range(self.num_layers):
            h = ResnetBlock(self.hidden_dim, dilation=2**n)(h)
        h = nn.leaky_relu(h, 0.2)
        last_dim = self.hidden_dim if self.use_mdn else self.out_dim
        h = ReflectConv1d(
            last_dim, kernel_size=7, use_weight_norm=True, kernel_init=init
        )(h)
        if self.use_mdn:
            log_pi, log_sigma, mu = MDNLayer(
                self.out_dim, self.num_gaussians, self.dim_wise
            )(h)
        else:
            mu = h
        mu, lf0_residual = self._finalize(x, mu)
        if self.use_mdn:
            return (log_pi, log_sigma, mu), lf0_residual
        return mu, lf0_residual


class ResF0VariancePredictor(_ResF0Mixin, BaseModel):
    """VariancePredictor + residual F0
    (reference acoustic_models/__init__.py:210)."""

    in_dim: int
    out_dim: int
    num_layers: int = 5
    hidden_dim: int = 256
    kernel_size: int = 5
    dropout: float = 0.5
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    init_type: str = "none"
    use_mdn: bool = False
    num_gaussians: int = 1
    dim_wise: bool = False
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        h = x
        if self.embed_dim is not None:
            h = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(h)
        init = kernel_initializer(self.init_type)
        for _ in range(self.num_layers):
            h = nn.Conv(
                self.hidden_dim, (self.kernel_size,), padding="SAME", kernel_init=init
            )(h)
            h = nn.relu(h)
            h = nn.LayerNorm(epsilon=1e-12)(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if self.use_mdn:
            log_pi, log_sigma, mu = MDNLayer(
                self.out_dim, self.num_gaussians, self.dim_wise
            )(h)
        else:
            mu = nn.Dense(self.out_dim, kernel_init=init)(h)
        mu, lf0_residual = self._finalize(x, mu)
        if self.use_mdn:
            return (log_pi, log_sigma, mu), lf0_residual
        return mu, lf0_residual


class ResF0TransformerEncoder(_ResF0Mixin, BaseModel):
    """Transformer encoder + residual F0
    (reference acoustic_models/__init__.py:331)."""

    in_dim: int
    out_dim: int
    hidden_dim: int
    attention_dim: int
    num_heads: int = 2
    num_layers: int = 2
    kernel_size: int = 3
    dropout: float = 0.1
    reduction_factor: int = 1
    init_type: str = "none"
    downsample_by_conv: bool = False
    in_lf0_idx: int = 300
    in_lf0_min: float = 5.3936276
    in_lf0_max: float = 6.491111
    out_lf0_idx: int = 180
    out_lf0_mean: float = 5.953093881972361
    out_lf0_scale: float = 0.23435173188961034
    # NOTE: no use_mdn — the reference ResF0TransformerEncoder has no MDN
    # variant (acoustic_models/__init__.py:331); configs requesting one
    # fail loudly at instantiation instead of silently mis-routing

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        from ensemble_svs_with_interactions_tpu.models.generic import (
            TransformerEncoder,
        )

        mu = TransformerEncoder(
            in_dim=self.in_dim,
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            attention_dim=self.attention_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
            reduction_factor=self.reduction_factor,
            downsample_by_conv=self.downsample_by_conv,
            init_type=self.init_type,
        )(x, lengths, train=train)
        # match input length (reduction-factor truncation)
        T = min(x.shape[1], mu.shape[1])
        mu, lf0_residual = self._finalize(x[:, :T], mu[:, :T])
        return mu, lf0_residual
