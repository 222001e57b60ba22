"""GAN discriminators for the postfilter training.

Parity target: /root/reference/nnsvs/discriminators.py:14 (Conv2dD, the
Kaneko-style 2-D conv discriminator over (B, T, D) feature maps).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ensemble_svs_with_interactions_tpu.base import BaseModel
from ensemble_svs_with_interactions_tpu.models.layers import kernel_initializer


class Conv2dD(BaseModel):
    """2-D conv discriminator treating (B, T, D) features as 1-channel
    images; returns per-layer feature maps (for feature matching) with the
    final logit map last."""

    in_dim: Optional[int] = None
    channels: int = 64
    kernel_size: Sequence[int] = (5, 3)
    padding: Optional[Sequence[int]] = (0, 0)
    last_sigmoid: bool = False
    init_type: str = "kaiming_normal"

    @nn.compact
    def __call__(self, x, c=None, lengths=None, train: bool = False):
        init = kernel_initializer(self.init_type)
        kh, kw = self.kernel_size
        if self.padding is None:
            pad = ((kh - 1) // 2, (kw - 1) // 2)
        else:
            pad = tuple(self.padding)
        pad2d = ((pad[0], pad[0]), (pad[1], pad[1]))
        h = x[..., None]  # (B, T, D, 1)
        C = self.channels
        feats = []
        for ch, stride in ((C, 1), (2 * C, 2), (4 * C, 2), (2 * C, 2)):
            h = nn.Conv(
                ch, (kh, kw), strides=(stride, 1), padding=pad2d, kernel_init=init
            )(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        h = nn.Conv(1, (kh, kw), strides=(1, 1), padding=pad2d, kernel_init=init)(h)
        if self.last_sigmoid:
            h = jax.nn.sigmoid(h)
        feats.append(h)
        return feats
