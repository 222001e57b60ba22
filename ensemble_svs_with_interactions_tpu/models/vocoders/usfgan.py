"""Unified source-filter GAN vocoder (uSFGAN / QPPWG family).

Parity targets: /root/reference/nnsvs/usfgan/models/generator.py:20
(USFGANGenerator), layers/residual_block.py:75-339 (Fixed/Adaptive gated
blocks with pitch-dependent indexing), layers/upsample.py:61
(ConvInUpsampleNetwork), usfgan/utils.py (SignalGenerator sine source,
dilated_factor).

TPU design: the pitch-dependent "dilated" taps (QPPWG's pd_indexing, a
per-sample gather at t +/- round(d * dilation)) become a vectorized
``take_along_axis`` over the time axis — one gather per adaptive block, no
scalar indexing.  Audio is feature-last (B, T, C).

NOTE: the reference's ResidualBlocks.forward accumulates skip activations
but returns the residual-path output, discarding them
(residual_block.py:322-334); this implementation returns the skip sum (the
original QPPWG/uSFGAN design), and uses separate output heads for the
source and filter networks (the reference reuses one ``conv_last`` for
both, generator.py:103-141).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.base import BaseModel


# --------------------------------------------------------------------------
# Source signal + pitch-dependent dilation factors (host/numpy helpers)
# --------------------------------------------------------------------------


def dilated_factor(f0: np.ndarray, fs: int, dense_factor: int) -> np.ndarray:
    """Pitch-dependent dilation factor per frame: fs / (dense_factor * f0).

    Unvoiced frames (f0 == 0) substitute f0 = fs / dense_factor, i.e. a
    dilation factor of exactly 1.0 (reference
    nnsvs/usfgan/utils/features.py:56-75)."""
    f0 = np.asarray(f0, dtype=np.float64).reshape(-1)
    f0 = np.where(f0 > 0, f0, fs / dense_factor)
    return fs / (dense_factor * f0)


class SignalGenerator:
    """Sample-rate excitation signals from frame-rate F0 (sine and/or noise).

    Mirrors nnsvs/usfgan/utils.py SignalGenerator: a phase-continuous sine
    at the (continuous) F0 with additive noise; unvoiced frames get noise
    only.
    """

    def __init__(
        self,
        sample_rate: int = 24000,
        hop_size: int = 120,
        sine_amp: float = 0.1,
        noise_amp: float = 0.003,
        signal_types: Sequence[str] = ("sine",),
    ):
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.sine_amp = sine_amp
        self.noise_amp = noise_amp
        self.signal_types = list(signal_types)

    def __call__(self, f0: np.ndarray, seed: int = 0) -> np.ndarray:
        """f0: (T, 1) or (T,) frame-rate F0 -> (T*hop, n_signals)."""
        rng = np.random.default_rng(seed)
        f0 = np.asarray(f0, dtype=np.float64).reshape(-1)
        f0_samples = np.repeat(f0, self.hop_size)
        voiced = f0_samples > 0
        sigs = []
        for kind in self.signal_types:
            if kind == "sine":
                phase = 2 * np.pi * np.cumsum(f0_samples) / self.sample_rate
                sine = np.where(voiced, self.sine_amp * np.sin(phase), 0.0)
                if self.noise_amp > 0:
                    # reference sinusoid(): one noise draw, amplitude
                    # noise_amp at voiced frames, noise_amp/3 unvoiced
                    amp = np.where(
                        voiced, self.noise_amp, self.noise_amp / 3.0
                    )
                    sine = sine + amp * rng.standard_normal(len(f0_samples))
                sig = sine
            elif kind == "noise":
                # reference random_noise(): UNIT-variance gaussian (no
                # noise_amp scaling)
                sig = rng.standard_normal(len(f0_samples))
            elif kind == "uv":
                sig = voiced.astype(np.float64)
            else:
                raise ValueError(f"unknown signal type: {kind}")
            sigs.append(sig)
        return np.stack(sigs, axis=-1).astype(np.float32)


# --------------------------------------------------------------------------
# Blocks
# --------------------------------------------------------------------------


def pd_indexing(x, d, dilation: int):
    """Pitch-dependent past/future gathers.

    x: (B, T, C); d: (B, T) dilation factors.  Returns (x_past, x_future)
    gathered at t -/+ round(d * dilation); out-of-range positions read as
    ZERO, matching the reference's zero padding
    (nnsvs/usfgan/utils/index.py:30-52).
    """
    B, T, C = x.shape
    offs = jnp.rint(d * dilation).astype(jnp.int32)
    t = jnp.arange(T)[None, :]
    raw_p = t - offs
    raw_f = t + offs
    idx_p = jnp.clip(raw_p, 0, T - 1)[..., None]
    idx_f = jnp.clip(raw_f, 0, T - 1)[..., None]
    xP = jnp.take_along_axis(x, jnp.broadcast_to(idx_p, (B, T, C)), axis=1)
    xF = jnp.take_along_axis(x, jnp.broadcast_to(idx_f, (B, T, C)), axis=1)
    xP = jnp.where((raw_p >= 0)[..., None], xP, 0.0)
    xF = jnp.where((raw_f <= T - 1)[..., None], xF, 0.0)
    return xP, xF


class _FixedBlock(nn.Module):
    residual_channels: int
    gate_channels: int
    skip_channels: int
    aux_channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, c):
        residual = x
        pad = (self.kernel_size - 1) // 2 * self.dilation
        h = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        h = nn.Conv(
            self.gate_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
        )(h)
        if c is not None:
            h = h + nn.Conv(self.gate_channels, (1,), use_bias=False)(c)
        xa, xb = jnp.split(h, 2, axis=-1)
        h = jnp.tanh(xa) * jax.nn.sigmoid(xb)
        skip = nn.Conv(self.skip_channels, (1,))(h)
        out = (nn.Conv(self.residual_channels, (1,))(h) + residual) * math.sqrt(0.5)
        return out, skip


class _AdaptiveBlock(nn.Module):
    residual_channels: int
    gate_channels: int
    skip_channels: int
    aux_channels: int

    @nn.compact
    def __call__(self, xC, xP, xF, c):
        residual = xC
        h = (
            nn.Conv(self.gate_channels, (1,), name="convC")(xC)
            + nn.Conv(self.gate_channels, (1,), name="convP")(xP)
            + nn.Conv(self.gate_channels, (1,), name="convF")(xF)
        )
        if c is not None:
            h = h + nn.Conv(self.gate_channels, (1,), use_bias=False)(c)
        xa, xb = jnp.split(h, 2, axis=-1)
        h = jnp.tanh(xa) * jax.nn.sigmoid(xb)
        skip = nn.Conv(self.skip_channels, (1,))(h)
        out = (nn.Conv(self.residual_channels, (1,))(h) + residual) * math.sqrt(0.5)
        return out, skip


class _ResidualBlocks(nn.Module):
    blockA: int
    cycleA: int
    blockF: int
    cycleF: int
    cascade_mode: int = 0
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80

    @nn.compact
    def __call__(self, x, c, d):
        cycleA = max(self.cycleA, 1)
        cycleF = max(self.cycleF, 1)
        blockA_per_cycle = max(self.blockA // cycleA, 1)
        blockF_per_cycle = max(self.blockF // cycleF, 1)

        modes = (
            [True] * self.blockA + [False] * self.blockF
            if self.cascade_mode == 0
            else [False] * self.blockF + [True] * self.blockA
        )
        skips = 0.0
        a_idx = f_idx = 0
        for i, adaptive in enumerate(modes):
            if adaptive:
                dilation = 2 ** (a_idx % blockA_per_cycle)
                xP, xF = pd_indexing(x, d, dilation)
                x, s = _AdaptiveBlock(
                    self.residual_channels,
                    self.gate_channels,
                    self.skip_channels,
                    self.aux_channels,
                    name=f"adaptive{a_idx}",
                )(x, xP, xF, c)
                a_idx += 1
            else:
                dilation = 2 ** (f_idx % blockF_per_cycle)
                x, s = _FixedBlock(
                    self.residual_channels,
                    self.gate_channels,
                    self.skip_channels,
                    self.aux_channels,
                    dilation=dilation,
                    name=f"fixed{f_idx}",
                )(x, c)
                f_idx += 1
            skips = skips + s
        # the reference computes the scaled skip sum but RETURNS the
        # residual path (usfgan residual_block.py:322-336: `skips *= ...;
        # return x`) — the skip 1x1 convs never reach the output, so
        # reference-trained checkpoints have untrained skip weights and
        # parity requires discarding them here too
        del skips
        return x


class _ConvInUpsampleNetwork(nn.Module):
    """aux conv (context window) + nearest upsampling + smoothing convs."""

    upsample_scales: Sequence[int]
    aux_channels: int
    aux_context_window: int = 2

    @nn.compact
    def __call__(self, c):
        # c: (B, T', C)
        k = 2 * self.aux_context_window + 1
        c = jnp.pad(
            c,
            ((0, 0), (self.aux_context_window, self.aux_context_window), (0, 0)),
            mode="edge",
        )
        c = nn.Conv(self.aux_channels, (k,), padding="VALID", use_bias=False)(c)
        for scale in self.upsample_scales:
            c = jnp.repeat(c, scale, axis=1)
            # smoothing conv over 2*scale+1 window
            c = nn.Conv(
                self.aux_channels, (2 * scale + 1,), padding="SAME", use_bias=False
            )(c)
        return c


class USFGANGenerator(BaseModel):
    """Source network (pitch-adaptive blocks) -> excitation; filter network
    (fixed dilated blocks) -> waveform."""

    source_network_params: dict = None
    filter_network_params: dict = None
    in_channels: int = 1
    out_channels: int = 1
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    upsample_params: dict = None
    # accepted for reference-config compatibility: weight norm is a
    # training reparameterization the torch porter materializes into
    # plain kernels (reference generator.py remove_weight_norm)
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x, c, d, train: bool = False):
        """x: (B, T, in_channels) excitation; c: (B, T', aux) frame features;
        d: (B, T) pitch-dependent dilation factors.

        Returns (waveform (B, T, out), source_signal (B, T, out)).
        """
        src_params = dict(
            self.source_network_params
            or {"blockA": 30, "cycleA": 3, "blockF": 0, "cycleF": 0, "cascade_mode": 0}
        )
        filt_params = dict(
            self.filter_network_params
            or {"blockA": 0, "cycleA": 0, "blockF": 30, "cycleF": 3, "cascade_mode": 0}
        )
        ups = dict(self.upsample_params or {"upsample_scales": [5, 4, 3, 2]})

        c_up = _ConvInUpsampleNetwork(
            ups["upsample_scales"], self.aux_channels, self.aux_context_window,
            name="upsample",
        )(c)
        assert c_up.shape[1] == x.shape[1], (c_up.shape, x.shape)

        h = nn.Conv(self.residual_channels, (1,), name="conv_first")(x)

        common = dict(
            residual_channels=self.residual_channels,
            gate_channels=self.gate_channels,
            skip_channels=self.skip_channels,
            aux_channels=self.aux_channels,
        )
        h = _ResidualBlocks(**src_params, **common, name="source_network")(
            h, c_up, d
        )
        s = nn.Conv(self.out_channels, (1,), name="source_out")(
            nn.relu(nn.Conv(self.skip_channels, (1,), name="source_mid")(nn.relu(h)))
        )

        h = nn.Conv(self.skip_channels, (1,), name="conv_mid")(s)
        h = _ResidualBlocks(**filt_params, **common, name="filter_network")(
            h, c_up, d
        )
        out = nn.Conv(self.out_channels, (1,), name="filter_out")(
            nn.relu(nn.Conv(self.skip_channels, (1,), name="filter_mid")(nn.relu(h)))
        )
        return out, s

    def inference(self, x, c, d):
        return self(x, c, d)[0]


class USFGANWrapper:
    """Inference wrapper: frame F0 + aux features -> waveform
    (parity: nnsvs/usfgan/__init__.py:7-60)."""

    def __init__(
        self,
        module: USFGANGenerator,
        variables,
        sample_rate: int = 24000,
        hop_size: int = 120,
        sine_amp: float = 0.1,
        noise_amp: float = 0.003,
        signal_types: Sequence[str] = ("sine",),
        dense_factor: int = 4,
        sine_f0_type: str = "contf0",
    ):
        self.module = module
        self.variables = variables
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.dense_factor = dense_factor
        self.sine_f0_type = sine_f0_type
        self.signal_generator = SignalGenerator(
            sample_rate, hop_size, sine_amp, noise_amp, signal_types
        )
        self._jit = jax.jit(
            lambda v, x, c, d: module.apply(v, x, c, d, method="inference")
        )

    def inference(self, f0: np.ndarray, aux_feats: np.ndarray) -> np.ndarray:
        x = self.signal_generator(f0)[None]  # (1, T*hop, S)
        d = dilated_factor(f0, self.sample_rate, self.dense_factor)
        d = np.repeat(d, self.hop_size)[None]  # (1, T*hop)
        c = np.asarray(aux_feats, np.float32)[None]
        wav = self._jit(
            self.variables, jnp.asarray(x), jnp.asarray(c), jnp.asarray(d)
        )
        return np.asarray(wav)[0, :, 0]


class PWGGenerator(BaseModel):
    """Parallel WaveGAN generator: non-causal WaveNet over upsampled
    conditioning with a noise input (the external parallel_wavegan
    generator the reference loads via nnsvs/util.py:377-458)."""

    in_channels: int = 1
    out_channels: int = 1
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    kernel_size: int = 3
    upsample_scales: tuple = (5, 4, 3, 2)

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        """x: (B, T, 1) noise; c: (B, T', aux) -> (B, T, 1) waveform."""
        c_up = _ConvInUpsampleNetwork(
            list(self.upsample_scales), self.aux_channels,
            self.aux_context_window, name="upsample",
        )(c)
        assert c_up.shape[1] == x.shape[1]
        h = nn.Conv(self.residual_channels, (1,), name="conv_first")(x)
        layers_per_stack = self.layers // self.stacks
        skips = 0.0
        for layer in range(self.layers):
            dilation = 2 ** (layer % layers_per_stack)
            h, s = _FixedBlock(
                self.residual_channels,
                self.gate_channels,
                self.skip_channels,
                self.aux_channels,
                kernel_size=self.kernel_size,
                dilation=dilation,
                name=f"block{layer}",
            )(h, c_up)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / self.layers)
        out = nn.relu(skips)
        out = nn.relu(nn.Conv(self.skip_channels, (1,), name="conv_out1")(out))
        return nn.Conv(self.out_channels, (1,), name="conv_out2")(out)

    def inference(self, c, key=None):
        """Frame features -> waveform (noise input generated internally)."""
        T = c.shape[0] if c.ndim == 2 else c.shape[1]
        up = int(np.prod(self.upsample_scales))
        if c.ndim == 2:
            c = c[None]
        if key is None:
            key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (c.shape[0], c.shape[1] * up, 1))
        return self(x, c)[..., 0]


class PeriodicityEstimator(nn.Module):
    """Conv stack estimating per-sample periodicity gates in [0, 1]
    (reference nnsvs/usfgan/layers/residual_block.py:339-399: replicate
    padding, final conv with tiny-std init so gates start near 0.5)."""

    out_channels: int = 64
    conv_layers: int = 3
    kernel_size: int = 5
    dilation: int = 1

    @nn.compact
    def __call__(self, c):
        h = c
        pad = self.kernel_size // 2 * self.dilation
        for idx in range(self.conv_layers):
            last = idx == self.conv_layers - 1
            h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="edge")
            h = nn.Conv(
                self.out_channels,
                (self.kernel_size,),
                kernel_dilation=(self.dilation,),
                padding="VALID",
                kernel_init=(
                    nn.initializers.normal(stddev=1e-4)
                    if last
                    else nn.initializers.lecun_normal()
                ),
                name=f"conv{idx}",
            )(h)
            h = jax.nn.sigmoid(h) if last else nn.relu(h)
        return h


class _HnUSFGANBase(BaseModel):
    """Shared harmonic-plus-noise uSFGAN machinery (reference
    nnsvs/usfgan/models/generator.py:169-550).  Sub-networks operate on a
    skip-channel latent; 1x1 convs bridge back to residual channels
    between networks (the reference relies on residual==skip width)."""

    harmonic_network_params: dict = None
    noise_network_params: dict = None
    filter_network_params: dict = None
    periodicity_estimator_params: dict = None
    in_channels: int = 1
    out_channels: int = 1
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    upsample_params: dict = None
    # accepted for reference-config compatibility (see USFGANGenerator)
    use_weight_norm: bool = True

    _CASCADE = False

    def _defaults(self):
        harm = dict(
            self.harmonic_network_params
            or {"blockA": 20, "cycleA": 4, "blockF": 0, "cycleF": 0, "cascade_mode": 0}
        )
        noise = dict(
            self.noise_network_params
            or {"blockA": 0, "cycleA": 0, "blockF": 5, "cycleF": 5, "cascade_mode": 0}
        )
        filt = dict(
            self.filter_network_params
            or {"blockA": 0, "cycleA": 0, "blockF": 30, "cycleF": 3, "cascade_mode": 0}
        )
        pest = dict(
            self.periodicity_estimator_params
            or {"conv_layers": 3, "kernel_size": 5, "dilation": 1}
        )
        ups = dict(self.upsample_params or {"upsample_scales": [5, 4, 3, 2]})
        return harm, noise, filt, pest, ups

    @nn.compact
    def __call__(self, x, c, d, train: bool = False):
        """x: (B, T, 2) stacked [sine, noise] excitations; c: (B, T', aux);
        d: (B, T) pitch-dependent dilation factors.

        Returns (waveform, source_signal, harmonic_dbg, noise_dbg, gates)
        — the reference's 5-tuple; the dbg branches are stop-gradient.
        """
        harm, noise_p, filt, pest, ups = self._defaults()
        common = dict(
            residual_channels=self.residual_channels,
            gate_channels=self.gate_channels,
            skip_channels=self.skip_channels,
            aux_channels=self.aux_channels,
        )

        c_up = _ConvInUpsampleNetwork(
            ups["upsample_scales"], self.aux_channels, self.aux_context_window,
            name="upsample",
        )(c)
        assert c_up.shape[1] == x.shape[1], (c_up.shape, x.shape)

        a = PeriodicityEstimator(
            out_channels=self.skip_channels,
            conv_layers=int(pest.get("conv_layers", pest.get("conv_blocks", 3))),
            kernel_size=int(pest.get("kernel_size", 5)),
            dilation=int(pest.get("dilation", 1)),
            name="periodicity_estimator",
        )(c_up)

        sine, noise_in = jnp.split(x, 2, axis=-1)
        h = nn.Conv(self.residual_channels, (1,), name="conv_first_sine")(sine)
        n = nn.Conv(self.residual_channels, (1,), name="conv_first_noise")(noise_in)

        h = _ResidualBlocks(**harm, **common, name="harmonic_network")(h, c_up, d)
        if self._CASCADE:
            h = a * h
            n = nn.Conv(self.residual_channels, (1,), name="conv_merge")(
                jnp.concatenate([h, n], axis=-1)
            )
            n = _ResidualBlocks(**noise_p, **common, name="noise_network")(
                n, c_up, d
            )
            n = (1.0 - a) * n
        else:
            n = nn.Conv(self.residual_channels, (1,), name="conv_noise_proj")(n)
            n = _ResidualBlocks(**noise_p, **common, name="noise_network")(
                n, c_up, d
            )
            h = a * h
            n = (1.0 - a) * n
        s_latent = h + n

        x_out = nn.Conv(self.residual_channels, (1,), name="conv_filter_in")(
            s_latent
        )
        x_out = _ResidualBlocks(**filt, **common, name="filter_network")(
            x_out, c_up, d
        )

        # one shared output head for all four branches (generator.py:273-277)
        last_mid = nn.Conv(self.skip_channels, (1,), name="last_mid")
        last_out = nn.Conv(self.out_channels, (1,), name="last_out")

        def conv_last(z):
            return last_out(nn.relu(last_mid(nn.relu(z))))

        wav = conv_last(x_out)
        src = conv_last(s_latent)
        h_dbg = conv_last(jax.lax.stop_gradient(h))
        n_dbg = conv_last(jax.lax.stop_gradient(n))
        return wav, src, h_dbg, n_dbg, a

    def inference(self, x, c, d):
        return self(x, c, d)[0]


class CascadeHnUSFGANGenerator(_HnUSFGANBase):
    """Cascade hn-uSFGAN: the gated harmonic latent feeds the noise
    network through a merge conv (generator.py:169-338)."""

    _CASCADE = True


class ParallelHnUSFGANGenerator(_HnUSFGANBase):
    """Parallel hn-uSFGAN: harmonic and noise networks run independently
    and are mixed by the periodicity gates (generator.py:359-550)."""

    _CASCADE = False
