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
    (reference nnsvs/postfilters.py:75)."""

    channels: int = 128
    kernel_size: Sequence[int] = (5, 5)
    init_type: str = "none"
    noise_scale: float = 1.0
    smoothing_width: int = -1

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        B, T, D = x.shape
        key = self.make_rng("noise") if self.has_rng("noise") else jax.random.PRNGKey(0)
        z = jax.random.normal(key, (B, T, 1)) * self.noise_scale
        h = jnp.concatenate([x, jnp.broadcast_to(z, (B, T, 1))], axis=-1)
        # treat as (B, T, D, C=1) image
        h = h[..., None]
        kh, kw = self.kernel_size
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        c = self.channels
        h1 = nn.relu(nn.Conv(c, (kh, kw), padding=pad)(h))
        h1 = nn.relu(nn.Conv(c, (kh, kw), padding=pad)(h1))
        residual = nn.Conv(1, (kh, kw), padding=pad)(h1)[..., 0]
        # trim the noise channel column back to D dims
        residual = residual[:, :, :D]
        out = x + residual
        if self.smoothing_width > 0:
            out = MovingAverage1d(self.smoothing_width)(out)
        return out

    def inference(self, x, lengths=None):
        return self(x, lengths)


class MultistreamPostFilter(BaseModel):
    """Route each stream (mgc/lf0/vuv/bap or mel) through its own postfilter
    (reference nnsvs/postfilters.py:200)."""

    mgc_postfilter: Optional[BaseModel]
    bap_postfilter: Optional[BaseModel]
    lf0_postfilter: Optional[BaseModel]
    stream_sizes: Sequence[int] = (60, 1, 1, 5)

    def __call__(self, x, lengths=None, y=None, train: bool = False):
        streams = split_streams(x, list(self.stream_sizes))
        if len(streams) == 4:
            mgc, lf0, vuv, bap = streams
        else:
            raise ValueError(f"unsupported streams: {len(streams)}")
        if self.mgc_postfilter is not None:
            mgc = self.mgc_postfilter(mgc, lengths, train=train)
        if self.bap_postfilter is not None:
            bap = self.bap_postfilter(bap, lengths, train=train)
        if self.lf0_postfilter is not None:
            lf0 = self.lf0_postfilter(lf0, lengths, train=train)
        return jnp.concatenate([mgc, lf0, vuv, bap], axis=-1)

    def inference(self, x, lengths=None):
        return self(x, lengths)
