"""Reusable neural layers: masked LSTMs (lax.scan), masked batch norm,
reflection-padded convs, MelGAN resnet blocks, trainable FIR filters.

TPU design notes:
  * LSTMs are ``nn.scan``-wrapped OptimizedLSTMCells.  XLA has no cuDNN-style
    fused LSTM; a scan of (B, H) matmuls keeps the MXU busy when B*H is
    large.  Variable lengths are handled with masks (carry frozen at padded
    steps) — packed sequences do not exist in XLA.  Bidirectionality
    reverses each sequence *within its valid length* (gather), so results
    match PyTorch's pack_padded_sequence semantics exactly.
  * Convs use feature-last (B, T, C) layout, flax/XLA's preferred layout.
  * BatchNorm computes masked batch statistics and keeps running averages in
    the ``batch_stats`` collection; cross-device reduction happens
    automatically when ``axis_name`` is set under pjit/shard_map.

Parity targets: torch nn.LSTM + pack_padded_sequence (reference
nnsvs/model.py:392-394), nn.BatchNorm1d (model.py:849-858), MelGAN blocks
(nnsvs/layers/conv.py:5-9), channel LayerNorm (nnsvs/layers/layer_norm.py:10),
TrTimeInvFIRFilter (nnsvs/dsp.py:57,90).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

def scan_unroll() -> int:
    """Scan unroll factor: amortizes XLA while-loop overhead on
    accelerators (the per-step work of an LSTM cell is far below TPU loop
    dispatch cost); kept at 1 on CPU where it only bloats compile time.
    ESVS_SCAN_UNROLL overrides for A/B measurements.  v5e flagship
    acoustic stage (blocked): unroll 4 -> 0.25 s, 8 -> 0.20, 16 -> 0.25,
    32 -> 0.28 — 8 is the sweet spot."""
    import os

    import jax

    if jax.default_backend() == "cpu":
        return 1
    return int(os.environ.get("ESVS_SCAN_UNROLL") or 8)


# --------------------------------------------------------------------------
# Weight initialization (reference nnsvs/util.py:31-67 semantics)
# --------------------------------------------------------------------------


def kernel_initializer(init_type: str = "none", init_gain: float = 0.02):
    if init_type in ("none", None):
        return nn.initializers.lecun_normal()
    if init_type == "normal":
        return nn.initializers.normal(stddev=init_gain)
    if init_type == "xavier_normal":
        return nn.initializers.glorot_normal()
    if init_type == "kaiming_normal":
        return nn.initializers.he_normal()
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=init_gain)
    raise ValueError(f"unknown init type: {init_type}")


# --------------------------------------------------------------------------
# Sequence reversal within valid lengths
# --------------------------------------------------------------------------


def reverse_padded(x, lengths):
    """Reverse each (B, T, ...) sequence within its own valid length.

    Padded tail positions keep whatever ends up there (callers mask them).
    """
    T = x.shape[1]
    idx = lengths[:, None] - 1 - jnp.arange(T)[None, :]
    idx = jnp.clip(idx, 0, T - 1)
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)).astype(jnp.int32), axis=1
    )


# --------------------------------------------------------------------------
# LSTM
# --------------------------------------------------------------------------


class _MaskedLSTMLayer(nn.Module):
    """Single-direction LSTM over (B, T, C), outputs zeroed at pad steps.

    Two device paths sharing one parameter tree, bit-identical on valid
    steps: the pallas recurrence with its custom-VJP BPTT kernel
    (ops/pallas_lstm.py — the TRAINING default at H<=256), and XLA's
    fused scan with hoisted input projections (the inference default and
    the H>512 fallback).  ESVS_ENABLE_PALLAS_LSTM=1/0 forces either.
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        B = x.shape[0]
        cell = nn.OptimizedLSTMCell(self.hidden_dim)

        import os

        # Policy (measured, PALLAS_LSTM_SWEEP.json + bench_train A/B):
        # TRAINING defaults to the pallas kernel — its custom-VJP
        # reverse-time BPTT beats XLA's scan fwd+bwd 1.2-1.9x at every
        # H<=256 training shape and lifted the flagship step +9.3%
        # (84.3k -> 92.1k frames/s).  INFERENCE keeps XLA's scan (B=4-12
        # with T in the thousands measured 1.7x slower under pallas).
        # ESVS_ENABLE_PALLAS_LSTM=1/0 forces either way.
        env = os.environ.get("ESVS_ENABLE_PALLAS_LSTM", "").lower()
        # default ON only for single-device training: GSPMD partitioning
        # of the custom-call is unverified on multi-chip meshes (not
        # testable on this 1-chip box) — set =1 to force it there once
        # verified on real hardware
        wanted = (
            (train and jax.device_count() == 1)
            if env == ""
            else env in ("1", "true", "yes")
        )
        use_pallas = (
            wanted
            and jax.default_backend() != "cpu"
            # the VMEM wall: above H=256 the trainable kernel's batch
            # block shrinks to 4 (the resident W_h/dW_h pair is 8.4 MB
            # at H=512) and the per-step matmuls starve the MXU —
            # measured 2.3-2.7x SLOWER than XLA there, vs 1.2-1.9x
            # FASTER at H<=256 (PALLAS_LSTM_SWEEP.json)
            and self.hidden_dim <= 256
        )
        if use_pallas:
            # the TRAINABLE kernel (custom VJP: reverse-time BPTT in
            # pallas) so the opt-in works under jax.grad too; it auto-
            # pads T and picks a VMEM-fitting (chunk, batch-block).  At
            # the 64x256 training shapes with H<=128 it measured 1.3-1.9x
            # faster than XLA's scan fwd+bwd (docs/performance.md).
            from ensemble_svs_with_interactions_tpu.ops.pallas_lstm import (
                lstm_layer_pallas_trainable,
            )

            carry0 = cell.initialize_carry(
                jax.random.PRNGKey(0), (B, x.shape[-1])
            )
            _ = cell(carry0, x[:, 0])  # materialize params (shared naming)
            ys = lstm_layer_pallas_trainable(x, cell.variables["params"])
            return ys * mask.astype(ys.dtype)[:, :, None]

        # Input projections hoisted OUT of the recurrence: x @ Wi for all
        # timesteps is one large MXU-efficient matmul; the scan body keeps
        # only the recurrent h @ Wh matmul (the cuDNN LSTM trick).  Gate
        # math, parameter tree and masking semantics are identical to
        # scanning OptimizedLSTMCell (params are materialized through the
        # cell so checkpoints are unaffected).
        carry0 = cell.initialize_carry(jax.random.PRNGKey(0), (B, x.shape[-1]))
        _ = cell(carry0, x[:, 0])  # materialize params (shared naming)
        p = cell.variables["params"]
        Wi = jnp.concatenate(
            [p[k]["kernel"] for k in ("ii", "if", "ig", "io")], axis=1
        )
        Wh = jnp.concatenate(
            [p[k]["kernel"] for k in ("hi", "hf", "hg", "ho")], axis=1
        )
        b = jnp.concatenate([p[k]["bias"] for k in ("hi", "hf", "hg", "ho")])
        H = self.hidden_dim
        xp = x @ Wi  # (B, T, 4H)

        def body(carry, inputs):
            c, h = carry
            xp_t, m_t = inputs
            z = xp_t + (h @ Wh + b)
            i = nn.sigmoid(z[:, :H])
            f = nn.sigmoid(z[:, H : 2 * H])
            g = jnp.tanh(z[:, 2 * H : 3 * H])
            o = nn.sigmoid(z[:, 3 * H :])
            new_c = f * c + i * g
            new_h = o * jnp.tanh(new_c)
            m = m_t[:, None]
            return (
                (jnp.where(m > 0, new_c, c), jnp.where(m > 0, new_h, h)),
                new_h * m,
            )

        _, ys = jax.lax.scan(
            body,
            carry0,
            (xp.swapaxes(0, 1), mask.astype(x.dtype).swapaxes(0, 1)),
            unroll=scan_unroll(),
        )
        return ys.swapaxes(0, 1)


class LSTM(nn.Module):
    """Multi-layer (bi)LSTM with mask-based variable-length handling.

    Matches torch ``nn.LSTM(batch_first=True)`` + packed sequences:
    outputs at padded steps are zero and the backward direction starts at
    each sequence's own last valid frame.
    """

    hidden_dim: int
    num_layers: int = 1
    bidirectional: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        B, T = x.shape[0], x.shape[1]
        if lengths is None:
            lengths = jnp.full((B,), T, dtype=jnp.int32)
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        mask = (jnp.arange(T)[None, :] < lengths[:, None])

        h = x
        for layer in range(self.num_layers):
            fwd = _MaskedLSTMLayer(self.hidden_dim, name=f"l{layer}_fwd")(
                h, mask, train=train
            )
            if self.bidirectional:
                h_rev = reverse_padded(h, lengths)
                bwd = _MaskedLSTMLayer(self.hidden_dim, name=f"l{layer}_bwd")(
                    h_rev, mask, train=train
                )
                bwd = reverse_padded(bwd, lengths)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h * mask[:, :, None]


# --------------------------------------------------------------------------
# Normalization
# --------------------------------------------------------------------------


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (B, T, C) using masked batch statistics.

    Running stats live in the ``batch_stats`` collection.  Under a device
    mesh, set ``axis_name`` so statistics are psum-reduced across data
    shards.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                mask = jnp.ones(x.shape[:2], dtype=x.dtype)
            m = mask.astype(x.dtype)[:, :, None]
            count = jnp.maximum(jnp.sum(m), 1.0)
            xsum = jnp.sum(x * m, axis=(0, 1))
            x2sum = jnp.sum((x * x) * m, axis=(0, 1))
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                xsum = jax.lax.psum(xsum, self.axis_name)
                x2sum = jax.lax.psum(x2sum, self.axis_name)
            mean = xsum / count
            var = jnp.maximum(x2sum / count - mean * mean, 0.0)
            if not self.is_initializing():
                # running stats use the UNBIASED variance like torch
                # BatchNorm1d (Bessel correction over the valid count)
                var_unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var_unbiased
                )
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class ChannelLayerNorm(nn.LayerNorm):
    """LayerNorm over the channel (last) dim of (B, T, C) features."""


# --------------------------------------------------------------------------
# Convolutions
# --------------------------------------------------------------------------


def reflect_pad_time(x, pad: int):
    """Reflection-pad the time axis of (B, T, C)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class ReflectConv1d(nn.Module):
    """Conv1d with reflection padding (MelGAN-style), feature-last layout."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_weight_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = reflect_pad_time(x, pad)
        conv = nn.Conv(
            self.features,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            kernel_init=self.kernel_init,
        )
        if self.use_weight_norm:
            conv = nn.WeightNorm(conv)
        return conv(x)


class ResnetBlock(nn.Module):
    """MelGAN-style dilated residual block (reference nnsvs/layers/conv.py:9)."""

    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, 0.2)
        h = ReflectConv1d(
            self.dim, kernel_size=3, dilation=self.dilation, use_weight_norm=True
        )(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.WeightNorm(nn.Conv(self.dim, (1,), padding="VALID"))(h)
        shortcut = nn.WeightNorm(nn.Conv(self.dim, (1,), padding="VALID"))(x)
        return shortcut + h


# --------------------------------------------------------------------------
# Trainable FIR analysis filter + IIR synthesis (shallow-AR models)
# --------------------------------------------------------------------------


class TrTimeInvFIRFilter(nn.Module):
    """Trainable causal FIR filter  H(z) = 1 + sum_k b_k z^-k  per channel.

    ``tanh`` keeps learned coefficients in (-1, 1) for stability; the 0th
    tap is fixed to 1 when ``fixed_0th``.  (reference nnsvs/dsp.py:90-139)
    """

    channels: int
    filt_dim: int
    causal: bool = True
    tanh: bool = True
    fixed_0th: bool = True

    def setup(self):
        self.taps = self.param(
            "taps",
            lambda key, shape: jax.random.normal(key, shape) / self.filt_dim,
            (self.channels, self.filt_dim),
        )

    def coefs(self):
        """(channels, filt_dim) filter taps, index 0 = current sample."""
        b = jnp.tanh(self.taps) if self.tanh else self.taps
        if self.fixed_0th:
            b = b.at[:, 0].set(1.0)
        return b

    def __call__(self, x):
        """Apply the FIR filter to (B, T, C).  Causal: y[t] = Σ b_k x[t−k];
        non-causal shifts the window by (K−1)//2 like the reference's
        symmetric Conv1d padding (nnsvs/dsp.py:110-118)."""
        b = self.coefs()  # (C, K)
        K = self.filt_dim
        shift = 0 if self.causal else (K - 1) // 2
        x_pad = jnp.pad(x, ((0, 0), (K - 1 - shift, shift), (0, 0)))
        # y[t] = sum_k b[k] x[t-k+shift]; with left pad K-1-shift the
        # x_pad slice offset for tap k is K-1-k regardless of shift
        out = jnp.zeros_like(x)
        for k in range(K):
            lo = K - 1 - k
            out = out + b[None, None, :, k].squeeze(0) * x_pad[
                :, lo : lo + x.shape[1], :
            ]
        return out

    def inverse(self, x):
        """Apply the inverse IIR filter 1/H(z) via lax.scan (inference).

        y[t] = x[t] - sum_{k>=1} b_k y[t-k]
        """
        assert self.causal, "inverse IIR filtering requires a causal filter"
        b = self.coefs()  # (C, K)
        K = self.filt_dim
        if K == 1:
            # order-0 filter: divide by the single tap (1 when fixed_0th)
            return x / b[:, 0][None, None, :]
        taps = b[:, 1:]  # (C, K-1)

        def step(carry, x_t):
            # carry: (B, K-1, C) past outputs, newest first
            y_t = x_t - jnp.einsum("bkc,ck->bc", carry, taps)
            carry = jnp.concatenate([y_t[:, None, :], carry[:, :-1, :]], axis=1)
            return carry, y_t

        B, _, C = x.shape
        carry0 = jnp.zeros((B, K - 1, C), x.dtype)
        _, ys = jax.lax.scan(step, carry0, jnp.moveaxis(x, 1, 0))
        return jnp.moveaxis(ys, 0, 1)


# --------------------------------------------------------------------------
# Phoneme-context embedding input block
# --------------------------------------------------------------------------


class PhonemeContextEmbedding(nn.Module):
    """Replace the one-hot phoneme block of linguistic features with a
    learned embedding: emb(argmax(onehot)) + fc([leading | trailing]).

    Mirrors the ``embed_dim`` path used across the reference model zoo
    (e.g. nnsvs/model.py:158-171).
    """

    in_dim: int
    embed_dim: int
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50

    @nn.compact
    def __call__(self, x):
        num_vocab = self.in_ph_end_idx - self.in_ph_start_idx
        x_first = x[..., : self.in_ph_start_idx]
        onehot = x[..., self.in_ph_start_idx : self.in_ph_end_idx]
        x_last = x[..., self.in_ph_end_idx :]
        ph = jnp.argmax(onehot, axis=-1)
        emb = nn.Embed(num_vocab, self.embed_dim)(ph)
        rest = nn.Dense(self.embed_dim)(
            jnp.concatenate([x_first, x_last], axis=-1)
        )
        return emb + rest


