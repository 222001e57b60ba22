"""Vocoder GAN discriminators: PWG, HiFiGAN multi-period/multi-scale,
UnivNet multi-resolution spectral.

Parity targets: /root/reference/nnsvs/usfgan/models/discriminator.py:28-980.
Audio is (B, T, 1) feature-last; each discriminator returns a list of
feature maps with the final logits last (feature-matching taps).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.base import BaseModel


class PWGDiscriminator(BaseModel):
    """Parallel WaveGAN discriminator: stacked dilated convs
    (discriminator.py:28)."""

    layers: int = 10
    conv_channels: int = 64
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        h = x
        for i in range(self.layers - 1):
            dilation = i if i > 0 else 1
            h = nn.Conv(
                self.conv_channels,
                (self.kernel_size,),
                kernel_dilation=(dilation,),
                padding="SAME",
            )(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        h = nn.Conv(1, (self.kernel_size,), padding="SAME")(h)
        feats.append(h)
        return feats


class HiFiGANPeriodDiscriminator(BaseModel):
    """Period discriminator: fold time into (T/p, p) and conv2d
    (discriminator.py:146)."""

    period: int = 3
    channels: int = 32
    kernel_size: int = 5
    max_downsample_channels: int = 1024  # reference discriminator.py:157
    downsample_scales: Sequence[int] = (3, 3, 3, 3, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, _ = x.shape
        pad = (self.period - T % self.period) % self.period
        if pad:
            x = jnp.concatenate([x, x[:, T - pad : T]], axis=1)  # reflect-ish
        T2 = x.shape[1]
        h = x.reshape(B, T2 // self.period, self.period, 1)
        feats = []
        ch = self.channels
        for scale in self.downsample_scales:
            h = nn.Conv(
                ch, (self.kernel_size, 1), strides=(scale, 1), padding="SAME"
            )(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
            ch = min(ch * 4, self.max_downsample_channels)
        h = nn.Conv(1, (3, 1), padding="SAME")(h)
        feats.append(h)
        return feats


class HiFiGANMultiPeriodDiscriminator(BaseModel):
    """(discriminator.py:282)"""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return [
            HiFiGANPeriodDiscriminator(period=p, channels=self.channels,
                                       name=f"period{p}")(x)
            for p in self.periods
        ]


class HiFiGANScaleDiscriminator(BaseModel):
    """Scale discriminator: grouped 1-D convs over (possibly pooled) audio
    (discriminator.py:343)."""

    # defaults == reference discriminator.py:343-355
    channels: int = 128
    max_downsample_channels: int = 1024
    max_groups: int = 16
    downsample_scales: Sequence[int] = (2, 2, 4, 4, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        h = nn.Conv(self.channels, (15,), padding="SAME")(x)
        h = nn.leaky_relu(h, 0.1)
        feats.append(h)
        ch = self.channels
        groups = 4
        for scale in self.downsample_scales:
            ch_next = min(ch * 2, self.max_downsample_channels)
            g = min(groups, self.max_groups)
            h = nn.Conv(
                ch_next, (41,), strides=(scale,), padding="SAME",
                feature_group_count=g if ch % g == 0 else 1,
            )(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
            ch = ch_next
            groups *= 4
        h = nn.Conv(ch, (5,), padding="SAME")(h)
        h = nn.leaky_relu(h, 0.1)
        feats.append(h)
        h = nn.Conv(1, (3,), padding="SAME")(h)
        feats.append(h)
        return feats


def _avg_pool1d(x, window: int, stride: int):
    return nn.avg_pool(x, (window,), strides=(stride,), padding="SAME")


class HiFiGANMultiScaleDiscriminator(BaseModel):
    """(discriminator.py:508)"""

    scales: int = 3
    downsample_pooling_window: int = 4
    downsample_pooling_stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        h = x
        for i in range(self.scales):
            outs.append(HiFiGANScaleDiscriminator(name=f"scale{i}")(h))
            h = _avg_pool1d(
                h, self.downsample_pooling_window, self.downsample_pooling_stride
            )
        return outs


class HiFiGANMultiScaleMultiPeriodDiscriminator(BaseModel):
    """(discriminator.py:590)"""

    scales: int = 3
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, x, train: bool = False):
        msd = HiFiGANMultiScaleDiscriminator(scales=self.scales, name="msd")(x)
        mpd = HiFiGANMultiPeriodDiscriminator(periods=self.periods, name="mpd")(x)
        return msd + mpd


def _stft_mag(x, fft_size: int, hop: int, win_length: int):
    """|STFT| of (B, T) -> (B, frames, fft//2+1)."""
    B, T = x.shape
    n_frames = max((T - win_length) // hop + 1, 1)
    idx = jnp.arange(win_length)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = x[:, idx]  # (B, frames, win)
    window = jnp.hanning(win_length)
    spec = jnp.fft.rfft(frames * window, n=fft_size, axis=-1)
    return jnp.sqrt(jnp.maximum(jnp.abs(spec) ** 2, 1e-9))


class UnivNetSpectralDiscriminator(BaseModel):
    """Spectral discriminator over |STFT| (discriminator.py:686)."""

    fft_size: int = 1024
    hop_size: int = 120
    win_length: int = 600
    channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mag = _stft_mag(x[..., 0], self.fft_size, self.hop_size, self.win_length)
        h = mag[..., None]  # (B, frames, bins, 1)
        feats = []
        for strides in ((1, 1), (1, 2), (1, 2), (1, 2), (1, 1)):
            h = nn.Conv(self.channels, (3, 9), strides=strides, padding="SAME")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        h = nn.Conv(1, (3, 3), padding="SAME")(h)
        feats.append(h)
        return feats


class UnivNetMultiResolutionSpectralDiscriminator(BaseModel):
    """(discriminator.py:828)"""

    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return [
            UnivNetSpectralDiscriminator(
                fft_size=f, hop_size=h, win_length=w, name=f"spec{i}"
            )(x)
            for i, (f, h, w) in enumerate(
                zip(self.fft_sizes, self.hop_sizes, self.win_lengths)
            )
        ]


class UnivNetMultiResolutionMultiPeriodDiscriminator(BaseModel):
    """Combined multi-resolution spectral + multi-period discriminator
    (reference usfgan/models/discriminator.py:901)."""

    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    period_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = UnivNetMultiResolutionSpectralDiscriminator(
            fft_sizes=tuple(self.fft_sizes),
            hop_sizes=tuple(self.hop_sizes),
            win_lengths=tuple(self.win_lengths),
            name="spectral",
        )(x)
        outs += HiFiGANMultiPeriodDiscriminator(
            periods=tuple(self.periods),
            channels=self.period_channels,
            name="period",
        )(x)
        return outs
