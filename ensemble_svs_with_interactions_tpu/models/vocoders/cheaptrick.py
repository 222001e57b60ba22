"""Differentiable CheapTrick spectral-envelope estimator.

TPU re-design of the reference's torch layer
(/root/reference/nnsvs/usfgan/layers/cheaptrick.py:21-241): the
F0-adaptive windows and cepstral lifters are precomputed as host-side
tables indexed by the rounded per-frame F0, so the jitted forward is a
gather + batched rFFT/irFFT — fully static shapes, no per-frame Python.

Used by hn-uSFGAN source-regularization losses: the estimated log
envelope of the generated source signal is pushed toward flatness.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CheapTrickLayer", "source_regularization_loss"]


def _window_table(sample_rate, fft_size, f0_floor, f0_ceil):
    """(f0_ceil+1, fft_size) pitch-adaptive Hann-like analysis windows,
    unit RMS energy (cheaptrick.py:49-61)."""
    table = np.zeros((f0_ceil + 1, fft_size), dtype=np.float32)
    for f0 in range(f0_floor, f0_ceil + 1):
        half = round(1.5 * sample_rate / f0)
        base = np.arange(-half, half + 1, dtype=np.float64)
        position = base / 1.5 / sample_rate
        left = fft_size // 2 - half
        right = fft_size // 2 + half + 1
        win = np.zeros(fft_size)
        win[left:right] = 0.5 * np.cos(math.pi * position * f0) + 0.5
        win /= np.sqrt(np.sum(win * win))
        table[f0] = win
    return table


def _lifter_tables(sample_rate, fft_size, f0_floor, f0_ceil, q1=-0.15):
    """Smoothing (sinc) + compensation (q-lifter) cepstral lifters
    per integer F0 (cheaptrick.py:121-137)."""
    bins = fft_size // 2 + 1
    q0 = 1.0 - 2.0 * q1
    smooth = np.zeros((f0_ceil + 1, bins), dtype=np.float32)
    comp = np.zeros((f0_ceil + 1, bins), dtype=np.float32)
    quef = np.arange(1, bins, dtype=np.float64) / sample_rate
    for f0 in range(f0_floor, f0_ceil + 1):
        smooth[f0, 0] = 1.0
        smooth[f0, 1:] = np.sin(math.pi * f0 * quef) / (math.pi * f0 * quef)
        comp[f0, 0] = q0 + 2.0 * q1
        comp[f0, 1:] = q0 + 2.0 * q1 * np.cos(2.0 * math.pi * f0 * quef)
    return smooth, comp


class CheapTrickLayer:
    """Callable CheapTrick estimator with precomputed tables.

    Not a flax module — it has no learnable parameters; the tables are
    closed over as constants so the call can live inside any jitted loss.
    """

    def __init__(
        self,
        sample_rate: int,
        hop_size: int,
        fft_size: int,
        f0_floor: int = 70,
        f0_ceil: int = 340,
        uv_threshold: float = 0.0,
        q1: float = -0.15,
    ):
        assert fft_size > 3.0 * sample_rate / f0_floor
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.fft_size = fft_size
        self.f0_floor = f0_floor
        self.f0_ceil = f0_ceil
        self.uv_threshold = uv_threshold
        self.windows = jnp.asarray(
            _window_table(sample_rate, fft_size, f0_floor, f0_ceil)
        )
        sm, cp = _lifter_tables(sample_rate, fft_size, f0_floor, f0_ceil, q1)
        self.smoothing_lifter = jnp.asarray(sm)
        self.compensation_lifter = jnp.asarray(cp)

    def __call__(self, x, f0, power: bool = False, elim_0th: bool = False):
        """x: (B, T) waveform; f0: (B, T') frame-rate F0 in Hz.

        Returns (B, T', fft_size//2+1) log spectral envelopes.
        """
        B, T = x.shape
        n_frames = f0.shape[1]

        # unvoiced frames analyse with the ceil window (cheaptrick.py:231-236)
        voiced = f0 > self.uv_threshold
        f = jnp.where(voiced, f0, float(self.f0_ceil))
        f = jnp.round(jnp.clip(f, self.f0_floor, self.f0_ceil)).astype(jnp.int32)

        # frame the waveform centered on the hop grid
        half = self.fft_size // 2
        xp = jnp.pad(x, ((0, 0), (half, half)))
        starts = jnp.arange(n_frames) * self.hop_size
        idx = starts[:, None] + jnp.arange(self.fft_size)[None, :]
        idx = jnp.clip(idx, 0, xp.shape[1] - 1)
        frames = xp[:, idx]  # (B, T', fft)

        win = self.windows[f]  # (B, T', fft)
        spec = jnp.abs(jnp.fft.rfft(frames * win, axis=-1))
        if power:
            spec = spec**2

        # cepstral liftering on the log spectrum (cheaptrick.py:152-168)
        bins = self.fft_size // 2 + 1
        full = jnp.concatenate([spec, jnp.flip(spec[..., 1:-1], axis=-1)], axis=-1)
        cep = jnp.fft.rfft(jnp.log(jnp.maximum(full, 1e-7)), axis=-1).real
        if elim_0th:
            cep = cep.at[..., 0].set(0.0)
        cep = cep * self.smoothing_lifter[f] * self.compensation_lifter[f]
        env = jnp.fft.irfft(cep, axis=-1)[..., :bins]
        return env


def source_regularization_loss(layer: CheapTrickLayer, source, f0):
    """Flatness regularizer on the generated source signal: penalizes
    spectral-envelope structure so resonance stays in the filter network
    (hn-uSFGAN training objective; source (B, T), f0 (B, T'))."""
    env = layer(source, f0, elim_0th=True)
    return jnp.mean(env**2)
