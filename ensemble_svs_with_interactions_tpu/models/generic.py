"""Generic model zoo: FFN/LSTM/MDN/conv-resnet/Sinsy-style models.

JAX/flax re-designs of the reference's nnsvs/model.py zoo (file:line parity
targets cited per class).  Conventions:

* features are (B, T, D), feature-last (XLA-preferred);
* ``lengths`` is a (B,) int array; variable length = masking, not packing;
* training forward is ``__call__(..., train=True)`` with a "dropout" rng;
* ``inference`` returns ``(mu, sigma)`` for MDN models, plain features
  otherwise — the same contract the generation pipeline consumes.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ensemble_svs_with_interactions_tpu.base import BaseModel, PredictionType
from ensemble_svs_with_interactions_tpu.models.layers import (
    LSTM,
    MaskedBatchNorm,
    PhonemeContextEmbedding,
    ReflectConv1d,
    ResnetBlock,
    TrTimeInvFIRFilter,
    kernel_initializer,
)
from ensemble_svs_with_interactions_tpu.ops.mdn import (
    MDNLayer,
    mdn_get_most_probable_sigma_and_mu,
)
from ensemble_svs_with_interactions_tpu.ops.multistream import split_streams

__all__ = [
    "SpeakerEmbedding",
    "FFN",
    "FeedForwardNet",
    "LSTMRNN",
    "LSTMRNNSAR",
    "MDN",
    "MDNv2",
    "RMDN",
    "Conv1dResnet",
    "Conv1dResnetSAR",
    "FFConvLSTM",
    "MultiSpeakerFFConvLSTM",
    "VariancePredictor",
    "MultiTrackVariancePredictor",
    "LSTMEncoder",
    "MultiTrackLSTMEncoder",
    "TransformerEncoder",
]


class SpeakerEmbedding(BaseModel):
    """Speaker-ID embedding table (reference nnsvs/model.py:35)."""

    num_embeddings: int
    embedding_dim: int
    padding_idx: Optional[int] = None
    std: float = 0.01

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        emb = nn.Embed(
            self.num_embeddings,
            self.embedding_dim,
            embedding_init=nn.initializers.normal(stddev=self.std),
        )(x)
        if self.padding_idx is not None:
            emb = jnp.where(
                (x == self.padding_idx)[..., None], jnp.zeros_like(emb), emb
            )
        return emb


class FFN(BaseModel):
    """Feed-forward network (reference nnsvs/model.py:284)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 2
    dropout: float = 0.0
    init_type: str = "none"
    last_sigmoid: bool = False

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        init = kernel_initializer(self.init_type)
        h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=init)(x))
        for _ in range(self.num_layers):
            h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=init)(h))
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = nn.Dense(self.out_dim, kernel_init=init)(h)
        return jax.nn.sigmoid(out) if self.last_sigmoid else out


FeedForwardNet = FFN


class LSTMRNN(BaseModel):
    """(bi)LSTM regression model (reference nnsvs/model.py:341)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 1
    bidirectional: bool = True
    dropout: float = 0.0
    init_type: str = "none"

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        h = LSTM(
            self.hidden_dim,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            dropout=self.dropout,
        )(x, lengths, train=train)
        return nn.Dense(self.out_dim, kernel_init=kernel_initializer(self.init_type))(h)


class LSTMRNNSAR(BaseModel):
    """LSTM-RNN with shallow autoregressive output filters
    (reference nnsvs/model.py:399)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 1
    bidirectional: bool = True
    dropout: float = 0.0
    stream_sizes: Sequence[int] = (180, 3, 1, 15)
    ar_orders: Sequence[int] = (20, 200, 20, 20)
    init_type: str = "none"

    def setup(self):
        self.lstm = LSTM(
            self.hidden_dim,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            dropout=self.dropout,
        )
        self.proj = nn.Dense(
            self.out_dim, kernel_init=kernel_initializer(self.init_type)
        )
        self.analysis_filts = [
            TrTimeInvFIRFilter(s, K + 1, name=f"filt{i}")
            for i, (s, K) in enumerate(zip(self.stream_sizes, self.ar_orders))
        ]

    def __call__(self, x, lengths=None, y=None, train: bool = False):
        # touch filter params so init() creates them (flax params are lazy;
        # preprocess_target/inference are called outside init)
        for f in self.analysis_filts:
            f.coefs()
        return self.proj(self.lstm(x, lengths, train=train))

    def preprocess_target(self, y):
        ys = split_streams(y, list(self.stream_sizes))
        return jnp.concatenate(
            [f(yi) for f, yi in zip(self.analysis_filts, ys)], axis=-1
        )

    def inference(self, x, lengths=None):
        out = self(x, lengths)
        outs = split_streams(out, list(self.stream_sizes))
        return jnp.concatenate(
            [f.inverse(oi) for f, oi in zip(self.analysis_filts, outs)], axis=-1
        )


class MDN(BaseModel):
    """FFN-MDN (reference nnsvs/model.py:538)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 1
    num_gaussians: int = 8
    dim_wise: bool = False
    init_type: str = "none"

    def prediction_type(self):
        return PredictionType.PROBABILISTIC

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        init = kernel_initializer(self.init_type)
        h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=init)(x))
        for _ in range(self.num_layers - 1):
            h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=init)(h))
        return MDNLayer(self.out_dim, self.num_gaussians, self.dim_wise)(h)

    def inference(self, x, lengths=None):
        log_pi, log_sigma, mu = self(x, lengths)
        sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
        return mu, sigma


class MDNv2(BaseModel):
    """FFN-MDN with dropout (reference nnsvs/model.py:621)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 1
    dropout: float = 0.5
    num_gaussians: int = 8
    dim_wise: bool = False
    init_type: str = "none"

    def prediction_type(self):
        return PredictionType.PROBABILISTIC

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        init = kernel_initializer(self.init_type)
        h = x
        for _ in range(self.num_layers):
            h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=init)(h))
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return MDNLayer(self.out_dim, self.num_gaussians, self.dim_wise)(h)

    def inference(self, x, lengths=None):
        log_pi, log_sigma, mu = self(x, lengths)
        sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
        return mu, sigma


class RMDN(BaseModel):
    """LSTM-MDN (reference nnsvs/model.py:451)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 1
    bidirectional: bool = True
    dropout: float = 0.0
    num_gaussians: int = 8
    dim_wise: bool = False
    init_type: str = "none"

    def prediction_type(self):
        return PredictionType.PROBABILISTIC

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        init = kernel_initializer(self.init_type)
        h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=init)(x))
        h = LSTM(
            self.hidden_dim,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            dropout=self.dropout,
        )(h, lengths, train=train)
        return MDNLayer(self.out_dim, self.num_gaussians, self.dim_wise)(h)

    def inference(self, x, lengths=None):
        log_pi, log_sigma, mu = self(x, lengths)
        sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
        return mu, sigma


class Conv1dResnet(BaseModel):
    """MelGAN-inspired conv resnet, optional MDN head
    (reference nnsvs/model.py:56)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 4
    init_type: str = "none"
    use_mdn: bool = False
    num_gaussians: int = 8
    dim_wise: bool = False
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        if self.embed_dim is not None:
            x = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(x)
        h = ReflectConv1d(self.hidden_dim, kernel_size=7, use_weight_norm=True)(x)
        for n in range(self.num_layers):
            h = ResnetBlock(self.hidden_dim, dilation=2**n)(h)
        h = nn.leaky_relu(h, 0.2)
        last_dim = self.hidden_dim if self.use_mdn else self.out_dim
        h = ReflectConv1d(last_dim, kernel_size=7, use_weight_norm=True)(h)
        if self.use_mdn:
            return MDNLayer(self.out_dim, self.num_gaussians, self.dim_wise)(h)
        return h

    def inference(self, x, lengths=None):
        if self.use_mdn:
            log_pi, log_sigma, mu = self(x, lengths)
            sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
            return mu, sigma
        return self(x, lengths)


class Conv1dResnetSAR(BaseModel):
    """Conv1dResnet with shallow AR output filters
    (reference nnsvs/model.py:226)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 4
    stream_sizes: Sequence[int] = (180, 3, 1, 15)
    ar_orders: Sequence[int] = (20, 200, 20, 20)
    init_type: str = "none"

    def setup(self):
        self.backbone = Conv1dResnet(
            in_dim=self.in_dim,
            hidden_dim=self.hidden_dim,
            out_dim=self.out_dim,
            num_layers=self.num_layers,
        )
        self.analysis_filts = [
            TrTimeInvFIRFilter(s, K + 1, name=f"filt{i}")
            for i, (s, K) in enumerate(zip(self.stream_sizes, self.ar_orders))
        ]

    def __call__(self, x, lengths=None, y=None, train: bool = False):
        for f in self.analysis_filts:
            f.coefs()
        return self.backbone(x, lengths, train=train)

    def preprocess_target(self, y):
        ys = split_streams(y, list(self.stream_sizes))
        return jnp.concatenate(
            [f(yi) for f, yi in zip(self.analysis_filts, ys)], axis=-1
        )

    def inference(self, x, lengths=None):
        out = self(x, lengths)
        outs = split_streams(out, list(self.stream_sizes))
        return jnp.concatenate(
            [f.inverse(oi) for f, oi in zip(self.analysis_filts, outs)], axis=-1
        )


class _ConvBNReLUStack(nn.Module):
    """Conv1d(k=7) + masked BatchNorm + ReLU x3 (Sinsy conv stack)."""

    hidden_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        for _ in range(self.num_layers):
            x = ReflectConv1d(self.hidden_dim, kernel_size=7)(x)
            x = MaskedBatchNorm()(x, mask=mask, use_running_average=not train)
            x = nn.relu(x)
        return x


class FFConvLSTM(BaseModel):
    """Sinsy-style FFN -> Conv(+BN) -> biLSTM model
    (reference nnsvs/model.py:779; hono2021sinsy without residual F0)."""

    in_dim: int
    ff_hidden_dim: int = 2048
    conv_hidden_dim: int = 1024
    lstm_hidden_dim: int = 256
    out_dim: int = 67
    dropout: float = 0.0
    num_lstm_layers: int = 2
    bidirectional: bool = True
    init_type: str = "none"
    use_mdn: bool = False
    dim_wise: bool = True
    num_gaussians: int = 4
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    @nn.compact
    def __call__(
        self, x, lengths=None, y=None, spk_embs=None, train: bool = False
    ):
        if self.embed_dim is not None:
            x = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(x)
        if spk_embs is not None:
            x = x + spk_embs
        init = kernel_initializer(self.init_type)
        h = x
        for _ in range(3):
            h = nn.relu(nn.Dense(self.ff_hidden_dim, kernel_init=init)(h))
        mask = None
        if lengths is not None:
            mask = jnp.arange(h.shape[1])[None, :] < jnp.asarray(lengths)[:, None]
        h = _ConvBNReLUStack(self.conv_hidden_dim)(h, mask=mask, train=train)
        h = LSTM(
            self.lstm_hidden_dim,
            num_layers=self.num_lstm_layers,
            bidirectional=self.bidirectional,
            dropout=self.dropout,
        )(h, lengths, train=train)
        if self.use_mdn:
            return MDNLayer(self.out_dim, self.num_gaussians, self.dim_wise)(h)
        return nn.Dense(self.out_dim, kernel_init=init)(h)

    def inference(self, x, lengths=None, spk_embs=None):
        if self.use_mdn:
            log_pi, log_sigma, mu = self(x, lengths, spk_embs=spk_embs)
            sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
            return mu, sigma
        return self(x, lengths, spk_embs=spk_embs)


class MultiSpeakerFFConvLSTM(BaseModel):
    """FFConvLSTM with an internal speaker embedding
    (reference nnsvs/model.py:929)."""

    in_dim: int
    speaker_embedding: Any  # config dict or SpeakerEmbedding module
    ff_hidden_dim: int = 2048
    conv_hidden_dim: int = 1024
    lstm_hidden_dim: int = 256
    out_dim: int = 67
    dropout: float = 0.0
    num_lstm_layers: int = 2
    bidirectional: bool = True
    init_type: str = "none"
    use_mdn: bool = False
    dim_wise: bool = True
    num_gaussians: int = 4
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    def setup(self):
        self.spk_emb = _as_module(self.speaker_embedding, SpeakerEmbedding)
        self.backbone = FFConvLSTM(
            in_dim=self.in_dim,
            ff_hidden_dim=self.ff_hidden_dim,
            conv_hidden_dim=self.conv_hidden_dim,
            lstm_hidden_dim=self.lstm_hidden_dim,
            out_dim=self.out_dim,
            dropout=self.dropout,
            num_lstm_layers=self.num_lstm_layers,
            bidirectional=self.bidirectional,
            init_type=self.init_type,
            use_mdn=self.use_mdn,
            dim_wise=self.dim_wise,
            num_gaussians=self.num_gaussians,
            in_ph_start_idx=self.in_ph_start_idx,
            in_ph_end_idx=self.in_ph_end_idx,
            embed_dim=self.embed_dim,
        )

    def __call__(self, x, spks, lengths=None, y=None, train: bool = False):
        spk_embs = self.spk_emb(spks)  # (B, 1, E) or (B, E)
        if spk_embs.ndim == 2:
            spk_embs = spk_embs[:, None, :]
        spk_embs = jnp.broadcast_to(
            spk_embs, (x.shape[0], x.shape[1], spk_embs.shape[-1])
        )
        # NOTE: reference adds spk emb AFTER phoneme embedding; FFConvLSTM
        # applies its own embedding first, so pass via spk_embs hook
        return self.backbone(x, lengths, y, spk_embs=spk_embs, train=train)

    def inference(self, x, spks, lengths=None):
        if self.use_mdn:
            log_pi, log_sigma, mu = self(x, spks, lengths)
            sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
            return mu, sigma
        return self(x, spks, lengths)


def _as_module(node, default_cls):
    """Accept either an instantiated module or a config dict."""
    if isinstance(node, nn.Module):
        return node
    if isinstance(node, dict):
        kwargs = {k: v for k, v in node.items() if k != "_target_"}
        if "_target_" in node:
            from ensemble_svs_with_interactions_tpu.utils.config import (
                resolve_target,
            )

            return resolve_target(node["_target_"])(**kwargs)
        return default_cls(**kwargs)
    raise TypeError(f"cannot build module from {type(node)}")


class VariancePredictor(BaseModel):
    """FastSpeech-style Conv+ReLU+LayerNorm stack (+MDN)
    (reference nnsvs/model.py:1030)."""

    in_dim: int
    out_dim: int
    num_layers: int = 5
    hidden_dim: int = 256
    kernel_size: int = 5
    dropout: float = 0.5
    init_type: str = "none"
    use_mdn: bool = False
    num_gaussians: int = 1
    dim_wise: bool = False
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None
    mask_indices: Optional[Sequence[int]] = None

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        if self.mask_indices:
            keep = jnp.ones((x.shape[-1],), x.dtype)
            keep = keep.at[jnp.asarray(list(self.mask_indices))].set(0.0)
            x = x * keep
        if self.embed_dim is not None:
            x = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(x)
        init = kernel_initializer(self.init_type)
        h = x
        for _ in range(self.num_layers):
            h = nn.Conv(
                self.hidden_dim,
                (self.kernel_size,),
                padding="SAME",
                kernel_init=init,
            )(h)
            h = nn.relu(h)
            # reference uses its custom LayerNorm with eps=1e-12
            # (nnsvs/layers/layer_norm.py:10)
            h = nn.LayerNorm(epsilon=1e-12)(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if self.use_mdn:
            return MDNLayer(self.out_dim, self.num_gaussians, self.dim_wise)(h)
        return nn.Dense(self.out_dim, kernel_init=init)(h)

    def inference(self, x, lengths=None):
        if self.use_mdn:
            log_pi, log_sigma, mu = self(x, lengths)
            sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
            return mu, sigma
        return self(x, lengths)


class MultiTrackVariancePredictor(BaseModel):
    """VariancePredictor over concatenated two-track inputs + two speaker
    embeddings — THE multitrack timelag/duration model
    (reference nnsvs/model.py:1180, forward :1277-1327).

    Input ``x`` is ``concat([x_main, x_sub], axis=-1)`` (each track already
    note-merged/zero-padded on host); ``spks = (spk_main, spk_sub)``.
    """

    in_dim: int
    out_dim: int
    num_speaker: int
    spk_embed_dim: int
    num_layers: int = 5
    hidden_dim: int = 256
    kernel_size: int = 5
    dropout: float = 0.5
    init_type: str = "none"
    use_mdn: bool = False
    num_gaussians: int = 1
    dim_wise: bool = False
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None
    mask_indices: Optional[Sequence[int]] = None

    def prediction_type(self):
        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    @nn.compact
    def __call__(self, x, spks, lengths=None, y=None, train: bool = False):
        if self.mask_indices:
            keep = jnp.ones((x.shape[-1],), x.dtype)
            keep = keep.at[jnp.asarray(list(self.mask_indices))].set(0.0)
            x = x * keep
        if self.embed_dim is not None:
            x = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(x)
        spk_table = nn.Embed(self.num_speaker, self.spk_embed_dim)
        spk0, spk1 = spks
        e0 = spk_table(spk0)
        e1 = spk_table(spk1)
        if e0.ndim == 2:
            e0, e1 = e0[:, None, :], e1[:, None, :]
        T = x.shape[1]
        e0 = jnp.broadcast_to(e0, (x.shape[0], T, e0.shape[-1]))
        e1 = jnp.broadcast_to(e1, (x.shape[0], T, e1.shape[-1]))
        h = jnp.concatenate([x, e0, e1], axis=-1)
        init = kernel_initializer(self.init_type)
        for _ in range(self.num_layers):
            h = nn.Conv(
                self.hidden_dim, (self.kernel_size,), padding="SAME", kernel_init=init
            )(h)
            h = nn.relu(h)
            # reference uses its custom LayerNorm with eps=1e-12
            # (nnsvs/layers/layer_norm.py:10)
            h = nn.LayerNorm(epsilon=1e-12)(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if self.use_mdn:
            return MDNLayer(self.out_dim, self.num_gaussians, self.dim_wise)(h)
        return nn.Dense(self.out_dim, kernel_init=init)(h)

    def inference(self, x, spks, lengths=None):
        if self.use_mdn:
            log_pi, log_sigma, mu = self(x, spks, lengths)
            sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
            return mu, sigma
        return self(x, spks, lengths)


class LSTMEncoder(BaseModel):
    """biLSTM encoder with optional phoneme embedding
    (reference nnsvs/model.py:1349)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 1
    bidirectional: bool = True
    dropout: float = 0.0
    init_type: str = "none"
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self, x, lengths=None, y=None, spk_embs=None, train: bool = False
    ):
        if self.embed_dim is not None:
            x = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(x)
        if spk_embs is not None:
            x = x + spk_embs
        h = LSTM(
            self.hidden_dim,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            dropout=self.dropout,
        )(x, lengths, train=train)
        return nn.Dense(self.out_dim, kernel_init=kernel_initializer(self.init_type))(h)


class MultiTrackLSTMEncoder(BaseModel):
    """Encodes main+sub tracks through a shared phoneme embedding, adds
    per-track speaker embeddings, concatenates, then biLSTM
    (reference nnsvs/model.py:1435, forward :1494-1537)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 1
    bidirectional: bool = True
    dropout: float = 0.0
    init_type: str = "none"
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self, x_main, x_sub, spk_embs, lengths=None, y=None, train: bool = False
    ):
        if self.embed_dim is not None:
            shared = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )
            x_main = shared(x_main)
            x_sub = shared(x_sub)
        x_main = x_main + spk_embs[0]
        x_sub = x_sub + spk_embs[1]
        x = jnp.concatenate([x_main, x_sub], axis=-1)
        h = LSTM(
            self.hidden_dim,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            dropout=self.dropout,
        )(x, lengths, train=train)
        return nn.Dense(self.out_dim, kernel_init=kernel_initializer(self.init_type))(h)


def _relative_to_absolute(x):
    """(B, H, L, 2L-1) relative logits -> (B, H, L, L) absolute scores
    (reference transformer/attentions.py:172-189, pad/reshape skew trick;
    all shapes static under jit)."""
    B, H, L, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(B, H, L * 2 * L)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, L - 1)))
    return x.reshape(B, H, L + 1, 2 * L - 1)[:, :, :L, L - 1 :]


def _absolute_to_relative(x):
    """(B, H, L, L) attention weights -> (B, H, L, 2L-1) relative layout
    (reference transformer/attentions.py:191-203)."""
    B, H, L, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, L - 1)))
    x = x.reshape(B, H, L * L + L * (L - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (L, 0)))
    return x.reshape(B, H, L, 2 * L)[:, :, :, 1:]


def _windowed_relative_embeddings(emb, length: int, window: int):
    """Slice/pad the (n_rel, 2w+1, d) table to (n_rel, 2L-1, d); relative
    distances beyond the window read zeros (attentions.py:156-170)."""
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad > 0:
        emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class _RelativeSelfAttention(nn.Module):
    """VITS-style multi-head self-attention with windowed relative-position
    key/value embeddings (reference nnsvs/transformer/attentions.py:22-137;
    heads_share=True, additive rel-key logits, rel-value output term)."""

    channels: int
    num_heads: int
    dropout: float
    window_size: int = 4

    @nn.compact
    def __call__(self, x, attn_mask, train: bool = False):
        B, L, D = x.shape
        H = self.num_heads
        dk = self.channels // H
        # 1x1 convs, as the reference (ports as conv1d units; XLA lowers
        # them to the same matmul a Dense would produce)
        glorot = nn.initializers.glorot_uniform()
        q = nn.Conv(self.channels, (1,), kernel_init=glorot, name="conv_q")(x)
        k = nn.Conv(self.channels, (1,), kernel_init=glorot, name="conv_k")(x)
        v = nn.Conv(self.channels, (1,), kernel_init=glorot, name="conv_v")(x)
        # channel dim splits [head, dk] (torch view(b, H, dk, t))
        q = q.reshape(B, L, H, dk).transpose(0, 2, 1, 3) / jnp.sqrt(
            jnp.asarray(dk, jnp.float32)
        )
        k = k.reshape(B, L, H, dk).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, dk).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k)
        if self.window_size is not None:
            w = self.window_size
            rel_init = nn.initializers.normal(stddev=dk**-0.5)
            emb_rel_k = self.param("emb_rel_k", rel_init, (1, 2 * w + 1, dk))
            emb_rel_v = self.param("emb_rel_v", rel_init, (1, 2 * w + 1, dk))
            rel_k = _windowed_relative_embeddings(emb_rel_k, L, w)
            rel_logits = jnp.einsum("bhld,nmd->bhlm", q, rel_k)
            scores = scores + _relative_to_absolute(rel_logits)
        scores = jnp.where(attn_mask, scores, -1e4)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.dropout, deterministic=not train)(p)
        out = jnp.einsum("bhlm,bhmd->bhld", p, v)
        if self.window_size is not None:
            rel_v = _windowed_relative_embeddings(emb_rel_v, L, w)
            out = out + jnp.einsum("bhlm,nmd->bhld", _absolute_to_relative(p), rel_v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.channels)
        return nn.Conv(self.channels, (1,), name="conv_o")(out)


class _TransformerBlock(nn.Module):
    """Post-LN encoder block (reference transformer/encoder.py:130-140:
    ``x = norm(x + drop(attn(x)))`` then ``x = norm(x + drop(ffn(x)))``);
    ``attention_dim`` is the FFN filter width (filter_channels), attention
    itself runs at ``hidden_dim``."""

    hidden_dim: int
    attention_dim: int
    num_heads: int
    kernel_size: int
    dropout: float
    window_size: int = 4

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # mask: (B, T) valid positions
        attn_mask = mask[:, None, None, :] & mask[:, None, :, None]
        fmask = mask[:, :, None]
        y = _RelativeSelfAttention(
            self.hidden_dim, self.num_heads, self.dropout, self.window_size,
            name="attn",
        )(x, attn_mask, train=train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_1")(x + y)
        # masked conv FFN with torch-style same padding (encoder.py:53-79)
        kl = (self.kernel_size - 1) // 2
        kr = self.kernel_size // 2
        y = nn.Conv(
            self.attention_dim, (self.kernel_size,), padding=((kl, kr),),
            name="ffn_conv1",
        )(x * fmask)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(y))
        y = nn.Conv(
            self.hidden_dim, (self.kernel_size,), padding=((kl, kr),),
            name="ffn_conv2",
        )(y * fmask)
        y = nn.Dropout(self.dropout, deterministic=not train)(y * fmask)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_2")(x + y)
        return x * fmask


class TransformerEncoder(BaseModel):
    """Transformer encoder with reduction factor
    (reference nnsvs/model.py:1540; core nnsvs/transformer/encoder.py:82)."""

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
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None
    window_size: int = 4

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        B, T = x.shape[0], x.shape[1]
        if lengths is None:
            lengths = jnp.full((B,), T, dtype=jnp.int32)
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        if self.embed_dim is not None:
            x = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(x)
        r = self.reduction_factor
        if r > 1:
            lengths = lengths // r
            if self.downsample_by_conv:
                x = nn.Conv(
                    x.shape[-1],
                    (r,),
                    strides=(r,),
                    feature_group_count=x.shape[-1],
                    padding="VALID",
                )(x)
            else:
                x = x[:, r - 1 :: r]
        h = nn.Dense(self.hidden_dim)(x)
        mask = jnp.arange(h.shape[1])[None, :] < lengths[:, None]
        h = h * mask[:, :, None]  # encoder entry mask (model.py:1667)
        for _ in range(self.num_layers):
            h = _TransformerBlock(
                self.hidden_dim,
                self.attention_dim,
                self.num_heads,
                self.kernel_size,
                self.dropout,
                self.window_size,
            )(h, mask, train=train)
        out = nn.Dense(self.out_dim * r)(h)
        return out.reshape(B, -1, self.out_dim)


class Conv1dResnetMDN(Conv1dResnet):
    """Conv1dResnet with an MDN head (reference nnsvs/model.py:701 —
    deprecated there in favor of Conv1dResnet(use_mdn=True); kept for
    config compatibility)."""

    use_mdn: bool = True
