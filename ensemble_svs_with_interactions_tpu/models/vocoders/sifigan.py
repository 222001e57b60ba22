"""SiFiGAN-style source-filter HiFiGAN generator.

The reference trains SiFiGAN through the external ``sifigan`` package
(recipe stage 13, recipes/_common/spsvs/train_sifigan.sh); this is a
first-party TPU design of the same idea (Yoneyama et al., "Source-Filter
HiFi-GAN", ICASSP 2023): a HiFiGAN-like filter network upsamples the
frame-rate acoustic features, and a source network processes the sine
excitation with pitch-dependent (quasi-periodic) convolutions at each
resolution, injecting harmonic structure into the filter path after
every upsampling stage.

Contract matches the other source-filter generators here:
``__call__(x, c, d) -> (waveform, source_signal)`` with x (B, T, S)
excitation at audio rate, c (B, T', aux) frame features, d (B, T)
pitch-dependent dilation factors — so ``train.vocoder_trainer`` and
``svs.load_vocoder`` work unchanged.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.base import BaseModel
from ensemble_svs_with_interactions_tpu.models.vocoders.usfgan import pd_indexing

__all__ = ["HiFiGANGenerator", "SiFiGANGenerator"]


class _ResBlock(nn.Module):
    """HiFiGAN-style dilated residual block (leaky-relu convs)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, dil in enumerate(self.dilations):
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(dil,),
                padding="SAME",
                name=f"conv{i}a",
            )(h)
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(
                self.channels, (self.kernel_size,), padding="SAME", name=f"conv{i}b"
            )(h)
            x = x + h
        return x


class _QPResBlock(nn.Module):
    """Quasi-periodic residual block: pitch-dependent past/future gathers
    mixed with the center tap (the SiFiGAN source-network primitive)."""

    channels: int

    @nn.compact
    def __call__(self, x, d):
        h = nn.leaky_relu(x, 0.1)
        xP, xF = pd_indexing(h, d, 1)
        h = (
            nn.Conv(self.channels, (1,), name="convC")(h)
            + nn.Conv(self.channels, (1,), name="convP")(xP)
            + nn.Conv(self.channels, (1,), name="convF")(xF)
        )
        h = nn.leaky_relu(h, 0.1)
        h = nn.Conv(self.channels, (1,), name="convO")(h)
        return x + h


class SiFiGANGenerator(BaseModel):
    """Source-filter HiFiGAN generator.

    Filter path: frame features -> Conv -> [repeat-upsample + smoothing
    conv + multi-dilation ResBlocks] per stage.  Source path: the sine
    excitation is strided down to each stage's rate and processed with
    quasi-periodic blocks, then added into the filter path.
    """

    in_channels: int = 1
    out_channels: int = 1
    channels: int = 128
    aux_channels: int = 80
    upsample_scales: Sequence[int] = (5, 4, 3, 2)
    resblock_kernel_sizes: Sequence[int] = (3, 7)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5))

    @nn.compact
    def __call__(self, x, c, d, train: bool = False):
        """x: (B, T, S) excitation; c: (B, T', aux); d: (B, T).

        Returns (waveform (B, T, out), source_signal (B, T, out)).
        """
        scales = list(self.upsample_scales)
        total_up = int(np.prod(scales))
        assert x.shape[1] == c.shape[1] * total_up, (x.shape, c.shape)

        # source embedding at audio rate
        s = nn.Conv(self.channels // 4, (1,), name="source_in")(x)

        h = nn.Conv(self.channels, (7,), padding="SAME", name="conv_pre")(c)
        ch = self.channels
        rate = c.shape[1]
        for li, scale in enumerate(scales):
            ch = max(ch // 2, 8)
            rate = rate * scale
            h = nn.leaky_relu(h, 0.1)
            h = jnp.repeat(h, scale, axis=1)
            h = nn.Conv(
                ch, (2 * scale + 1,), padding="SAME", name=f"up{li}"
            )(h)

            # source injection at this resolution: stride-sample the
            # excitation features and dilation factors down to `rate`
            stride = x.shape[1] // rate
            s_l = s[:, ::stride][:, :rate]
            d_l = d[:, ::stride][:, :rate] / stride
            s_l = _QPResBlock(ch, name=f"qp{li}")(
                nn.Conv(ch, (1,), name=f"source_proj{li}")(s_l), d_l
            )
            h = h + s_l

            blocks = [
                _ResBlock(ch, k, tuple(dl), name=f"res{li}_{bi}")(h)
                for bi, (k, dl) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilations)
                )
            ]
            h = sum(blocks) / len(blocks)

        h = nn.leaky_relu(h, 0.1)
        wav = jnp.tanh(
            nn.Conv(self.out_channels, (7,), padding="SAME", name="conv_post")(h)
        )
        # source branch rendered to audio for the source regularization loss
        src = nn.Conv(self.out_channels, (1,), name="source_out")(
            nn.leaky_relu(
                _QPResBlock(self.channels // 4, name="qp_out")(s, d), 0.1
            )
        )
        return wav, src

    def inference(self, x, c, d):
        return self(x, c, d)[0]


class HiFiGANGenerator(BaseModel):
    """Plain HiFiGAN generator: frame features -> waveform (the V1
    architecture the reference loads from the external parallel_wavegan
    package via nnsvs/util.py:377-458).  Same filter path as
    :class:`SiFiGANGenerator` without the source branch."""

    out_channels: int = 1
    channels: int = 512
    aux_channels: int = 80
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )

    @nn.compact
    def __call__(self, c, train: bool = False):
        """c: (B, T', aux) -> (B, T' * prod(scales), out)."""
        h = nn.Conv(self.channels, (7,), padding="SAME", name="conv_pre")(c)
        ch = self.channels
        for li, scale in enumerate(self.upsample_scales):
            ch = max(ch // 2, 8)
            h = nn.leaky_relu(h, 0.1)
            h = jnp.repeat(h, scale, axis=1)
            h = nn.Conv(ch, (2 * scale + 1,), padding="SAME", name=f"up{li}")(h)
            blocks = [
                _ResBlock(ch, k, tuple(dl), name=f"res{li}_{bi}")(h)
                for bi, (k, dl) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilations)
                )
            ]
            h = sum(blocks) / len(blocks)
        h = nn.leaky_relu(h, 0.1)
        return jnp.tanh(
            nn.Conv(self.out_channels, (7,), padding="SAME", name="conv_post")(h)
        )

    def inference(self, c):
        if c.ndim == 2:
            return self(c[None])[0, :, 0]
        return self(c)[..., 0]
