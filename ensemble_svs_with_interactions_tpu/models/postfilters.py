"""Postfilters: GV variance scaling and learned conv postfilters.

Parity targets: /root/reference/nnsvs/postfilters.py:9 (variance_scaling),
:75 (Conv2dPostFilter), :200/:309 (MultistreamPostFilter).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.base import BaseModel
from ensemble_svs_with_interactions_tpu.models.layers import kernel_initializer
from ensemble_svs_with_interactions_tpu.ops.multistream import split_streams


def variance_scaling(gv, feats, offset: int = 2, note_frame_indices=None):
    """Global-variance postfilter (Silen et al. 2012): rescale per-dim
    utterance variance to the training-data global variance.

    Operates on NumPy arrays host-side (tiny), matching the reference's
    inference-time use at nnsvs/gen.py:1413.
    """
    feats = np.asarray(feats)
    gv = np.asarray(gv)
    if note_frame_indices is not None:
        if len(note_frame_indices) == 0:
            return feats
        sel = feats[note_frame_indices]
    else:
        sel = feats
    utt_gv = sel.var(0)
    utt_mu = sel.mean(0)
    out = feats.copy()
    scale = np.sqrt(gv[offset:] / np.maximum(utt_gv[offset:], 1e-12))
    if note_frame_indices is not None:
        out[note_frame_indices[:, None], np.arange(offset, feats.shape[1])[None, :]] = (
            scale * (feats[note_frame_indices][:, offset:] - utt_mu[offset:])
            + utt_mu[offset:]
        )
    else:
        out[:, offset:] = scale * (feats[:, offset:] - utt_mu[offset:]) + utt_mu[offset:]
    return out


class MovingAverage1d(nn.Module):
    """Fixed moving-average smoother over time (per channel)."""

    kernel_size: int

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (0, 0)), mode="reflect")
        kernel = jnp.ones((k,), x.dtype) / k
        out = jnp.zeros_like(x)
        for i in range(k):
            out = out + kernel[i] * xp[:, i : i + x.shape[1], :]
        return out


class Conv2dPostFilter(BaseModel):
    """Kaneko-style GAN postfilter on (B, T, D) features treated as images
    (reference nnsvs/postfilters.py:75-198): bin-wise (default) or
    frame-wise noise as a second image channel, four conv blocks each
    re-concatenating the input, residual output.  The moving-average
    smoother applies to the NOISE and only at inference."""

    channels: int = 128
    kernel_size: Sequence[int] = (5, 5)
    init_type: str = "kaiming_normal"  # reference postfilters.py:96 default
    noise_scale: float = 1.0
    noise_type: str = "bin_wise"
    smoothing_width: int = -1
    # accepted for reference-config compatibility (postfilters.py:84);
    # flax infers the feature dim from the input
    in_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x,
        lengths=None,
        y=None,
        train: bool = False,
        is_inference: bool = False,
    ):
        B, T, D = x.shape
        key = self.make_rng("noise") if self.has_rng("noise") else jax.random.PRNGKey(0)
        if self.noise_type == "bin_wise":
            z = jax.random.normal(key, (B, T, D)) * self.noise_scale
            if is_inference and self.smoothing_width > 0:
                z = MovingAverage1d(self.smoothing_width)(z)
        elif self.noise_type == "frame_wise":
            z = jax.random.normal(key, (B, T, 1)) * self.noise_scale
            if is_inference and self.smoothing_width > 0:
                z = MovingAverage1d(self.smoothing_width)(z)
            init = kernel_initializer(self.init_type)
            z = nn.Dense(D, kernel_init=init, name="fc")(z)
        else:
            raise ValueError(f"unknown noise type: {self.noise_type}")

        init = kernel_initializer(self.init_type)
        kh, kw = self.kernel_size
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        c = self.channels
        x_img = x[..., None]  # (B, T, D, 1)
        h = jnp.concatenate([x_img, z[..., None]], axis=-1)
        h = nn.relu(nn.Conv(c, (kh, kw), padding=pad, kernel_init=init, name="conv1")(h))
        h = jnp.concatenate([x_img, h], axis=-1)
        h = nn.relu(nn.Conv(c * 2, (kh, kw), padding=pad, kernel_init=init, name="conv2")(h))
        h = jnp.concatenate([x_img, h], axis=-1)
        h = nn.relu(nn.Conv(c, (kh, kw), padding=pad, kernel_init=init, name="conv3")(h))
        h = jnp.concatenate([x_img, h], axis=-1)
        residual = nn.Conv(1, (kh, kw), padding=pad, kernel_init=init, name="conv4")(h)[..., 0]
        return x + residual

    def inference(self, x, lengths=None):
        return self(x, lengths, is_inference=True)


class MultistreamPostFilter(BaseModel):
    """Route each stream (mgc/lf0/vuv/bap) through its own postfilter
    (reference nnsvs/postfilters.py:200-300): the first ``mgc_offset``
    mel-cepstrum dims (energy c0/c1) pass through unchanged."""

    mgc_postfilter: Optional[BaseModel]
    bap_postfilter: Optional[BaseModel]
    lf0_postfilter: Optional[BaseModel]
    stream_sizes: Sequence[int] = (60, 1, 1, 5)
    mgc_offset: int = 2
    bap_offset: int = 0

    def __call__(
        self,
        x,
        lengths=None,
        y=None,
        train: bool = False,
        is_inference: bool = False,
    ):
        def _run(pf, s):
            if is_inference:
                return pf.inference(s, lengths)
            return pf(s, lengths, train=train)

        streams = split_streams(x, list(self.stream_sizes))
        if len(streams) == 4:
            mgc, lf0, vuv, bap = streams
        else:
            raise ValueError(f"unsupported streams: {len(streams)}")
        if self.mgc_postfilter is not None:
            if self.mgc_offset > 0:
                mgc0 = mgc[:, :, : self.mgc_offset]
                mgc = jnp.concatenate(
                    [mgc0, _run(self.mgc_postfilter, mgc[:, :, self.mgc_offset :])],
                    axis=-1,
                )
            else:
                mgc = _run(self.mgc_postfilter, mgc)
        if self.bap_postfilter is not None:
            if self.bap_offset > 0:
                bap0 = bap[:, :, : self.bap_offset]
                bap = jnp.concatenate(
                    [bap0, _run(self.bap_postfilter, bap[:, :, self.bap_offset :])],
                    axis=-1,
                )
            else:
                bap = _run(self.bap_postfilter, bap)
        if self.lf0_postfilter is not None:
            lf0 = _run(self.lf0_postfilter, lf0)
        return jnp.concatenate([mgc, lf0, vuv, bap], axis=-1)

    def inference(self, x, lengths=None):
        return self(x, lengths, is_inference=True)


class MelF0MultistreamPostFilter(BaseModel):
    """3-stream (mel, lf0, vuv) postfilter router
    (reference nnsvs/postfilters.py:309-368): mel and lf0 run through
    their own postfilters (first ``mel_offset`` mel dims pass through),
    V/UV is untouched."""

    mel_postfilter: Optional[BaseModel]
    lf0_postfilter: Optional[BaseModel]
    stream_sizes: Sequence[int] = (80, 1, 1)
    mel_offset: int = 0

    def __call__(
        self,
        x,
        lengths=None,
        y=None,
        train: bool = False,
        is_inference: bool = False,
    ):
        def _run(pf, s):
            if is_inference:
                return pf.inference(s, lengths)
            return pf(s, lengths, train=train)

        streams = split_streams(x, list(self.stream_sizes))
        assert len(streams) == 3
        mel, lf0, vuv = streams
        if self.mel_postfilter is not None:
            if self.mel_offset > 0:
                mel0 = mel[:, :, : self.mel_offset]
                mel = jnp.concatenate(
                    [mel0, _run(self.mel_postfilter, mel[:, :, self.mel_offset :])],
                    axis=-1,
                )
            else:
                mel = _run(self.mel_postfilter, mel)
        if self.lf0_postfilter is not None:
            lf0 = _run(self.lf0_postfilter, lf0)
        return jnp.concatenate([mel, lf0, vuv], axis=-1)

    def inference(self, x, lengths=None):
        return self(x, lengths, is_inference=True)


def _reflect_pad2d(x, top: int, bottom: int, left: int, right: int):
    """Reflection-pad a (B, T, D, C) image on the T (top/bottom) and D
    (left/right) axes."""
    return jnp.pad(
        x, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="reflect"
    )


class _PadConv2dPostFilter(nn.Module):
    """One band of the low/mid/high split postfilter
    (reference nnsvs/postfilters.py:371-457): the feature axis is
    reflection-padded on only one side so adjacent bands overlap by the
    conv padding width."""

    in_dim: int
    channels: int = 128
    kernel_size: int = 5
    init_type: str = "kaiming_normal"
    padding_side: str = "left"

    @nn.compact
    def __call__(self, x, z):
        init = kernel_initializer(self.init_type)
        ks = self.kernel_size
        pad = (ks - 1) // 2
        C = self.channels

        # z: (B, T, 1) shared noise -> per-dim via a linear layer
        z = nn.Dense(self.in_dim, kernel_init=init, name="fc")(z)
        x_img = x[..., None]  # (B, T, D, 1)
        z_img = z[..., None]

        if self.padding_side == "left":
            lr = (pad, 0)
        elif self.padding_side == "none":
            lr = (0, 0)
        elif self.padding_side == "right":
            lr = (0, pad)
        else:
            raise ValueError("Invalid padding side")
        h = jnp.concatenate(
            [
                _reflect_pad2d(x_img, pad, pad, *lr),
                _reflect_pad2d(z_img, pad, pad, *lr),
            ],
            axis=-1,
        )
        h = nn.relu(
            nn.Conv(C, (ks, ks), padding="VALID", kernel_init=init, name="conv1")(h)
        )

        # the band output drops the overlap columns eaten by conv1
        if self.padding_side == "left":
            x_syn = x_img[:, :, :-pad]
        elif self.padding_side == "none":
            x_syn = x_img[:, :, pad:-pad]
        else:
            x_syn = x_img[:, :, pad:]

        def _conv(h, ch, kw, name):
            h = _reflect_pad2d(h, pad, pad, (kw - 1) // 2, (kw - 1) // 2)
            return nn.Conv(
                ch, (ks, kw), padding="VALID", kernel_init=init, name=name
            )(h)

        h = nn.relu(_conv(jnp.concatenate([x_syn, h], -1), C * 2, 3, "conv2"))
        h = nn.relu(_conv(jnp.concatenate([x_syn, h], -1), C, 3, "conv3"))
        residual = _conv(jnp.concatenate([x_syn, h], -1), 1, 1, "conv4")
        return (x_syn + residual)[..., 0]


class MultistreamConv2dPostFilter(BaseModel):
    """Conv2d MGC postfilter split into low/mid/high bands with
    kernel-width overlaps (reference nnsvs/postfilters.py:460-559)."""

    in_dim: Optional[int] = None
    channels: int = 128
    kernel_size: int = 5
    init_type: str = "kaiming_normal"
    noise_scale: float = 1.0
    stream_sizes: Sequence[int] = (8, 20, 30)

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        assert len(self.stream_sizes) == 3
        assert x.shape[-1] == sum(self.stream_sizes)
        pad = (self.kernel_size - 1) // 2
        s0, s1, _ = self.stream_sizes

        key = (
            self.make_rng("noise")
            if self.has_rng("noise")
            else jax.random.PRNGKey(0)
        )
        z = jax.random.normal(key, (x.shape[0], x.shape[1], 1)) * self.noise_scale

        kw = dict(
            channels=self.channels,
            kernel_size=self.kernel_size,
            init_type=self.init_type,
        )
        out1 = _PadConv2dPostFilter(
            s0 + pad, padding_side="left", name="low_postfilter", **kw
        )(x[:, :, : s0 + pad], z)
        out2 = _PadConv2dPostFilter(
            s1 + 2 * pad, padding_side="none", name="mid_postfilter", **kw
        )(x[:, :, s0 - pad : s0 + s1 + pad], z)
        out3 = _PadConv2dPostFilter(
            sum(self.stream_sizes[2:]) + pad,
            padding_side="right",
            name="high_postfilter",
            **kw,
        )(x[:, :, s0 + s1 - pad :], z)
        return jnp.concatenate([out1, out2, out3], axis=-1)

    def inference(self, x, lengths=None):
        return self(x, lengths)
