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
