"""Device-side acoustic postprocessing: the host pipeline of
``gen.postprocess_acoustic`` (GV postfilter, stream split, V/UV-gated F0
reconstruction, interpolation, trajectory smoothing) as one jitted XLA
program, so ensemble synthesis can go acoustic-model -> vocoder without
the (B, T, D) feature tensor ever crossing the device->host link.

Semantics match the host path (reference nnsvs/gen.py:1899-2019 +
postprocess chain) to float32 rounding:

  * ``variance_scaling_masked``  == postfilters.variance_scaling over
    note frames (Silen et al. 2012 GV postfilter).
  * ``interp_lf0``               == nnmnkwii-style interp1d of log-F0
    over unvoiced gaps (np.interp semantics: linear inside, edge-held
    outside).
  * ``filtfilt``                 == scipy.signal.filtfilt with the
    default odd extension (padlen 18) and lfilter_zi initial states,
    implemented as two ``lax.scan`` IIR passes with per-channel
    coefficients; ragged batch handled by roll/flip time reversal.

Only the static-stream WORLD configuration is fused (the paper's
flagship model: stream_sizes [60, 1, 1, 5], no dynamic features,
relative_f0 off); other configurations use the host path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_BIG = np.int32(1 << 30)


def scaler_affine(scaler, dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """Represent any affine scaler's inverse_transform as (a, b):
    inverse(x) = x * a + b.  Probed numerically so it works for both
    StandardScaler and MinMaxScaler."""
    zero = np.zeros((1, dim), np.float64)
    one = np.ones((1, dim), np.float64)
    b = np.asarray(scaler.inverse_transform(zero), np.float64)[0]
    a = np.asarray(scaler.inverse_transform(one), np.float64)[0] - b
    return a.astype(np.float32), b.astype(np.float32)


def filtfilt_coeffs(cutoffs_hz, fs: int, order: int = 5):
    """Per-channel Butterworth (b, a, zi) rows for the fused filtfilt.

    cutoffs_hz: per-channel cutoff frequency (one row per channel).
    Returns float32 arrays (C, order+1), (C, order+1), (C, order).
    """
    from scipy.signal import butter, lfilter_zi

    bs, azs, zis = [], [], []
    cache = {}
    for c in cutoffs_hz:
        key = float(c)
        if key not in cache:
            b, a = butter(order, key / (fs // 2), "lowpass")
            cache[key] = (b, a, lfilter_zi(b, a))
        bs.append(cache[key][0])
        azs.append(cache[key][1])
        zis.append(cache[key][2])
    return (
        np.asarray(bs, np.float32),
        np.asarray(azs, np.float32),
        np.asarray(zis, np.float32),
    )


def _lfilter_scan(x, b, a, z0):
    """Batched IIR direct-form-II-transposed: x (T, C), b/a (C, K+1),
    z0 (C, K) initial conditions.  Returns y (T, C)."""
    import jax
    import jax.numpy as jnp

    K = b.shape[1] - 1

    def step(z, xt):
        yt = b[:, 0] * xt + z[:, 0]
        z_new = jnp.stack(
            [
                b[:, k + 1] * xt
                + (z[:, k + 1] if k + 1 < K else 0.0)
                - a[:, k + 1] * yt
                for k in range(K)
            ],
            axis=1,
        )
        return z_new, yt

    _, y = jax.lax.scan(step, z0, x)
    return y


def _filtfilt_ragged(x, length, b, a, zi, pad: int = 18):
    """scipy.filtfilt (odd ext, zi*x0 init) for one (T_pad, C) track whose
    valid data is x[:length]; output frames >= length are garbage."""
    import jax.numpy as jnp
    from jax import lax

    T, C = x.shape
    L = T + 2 * pad
    last = length - 1

    # head odd extension: 2*x[0] - x[pad..1]
    head = 2.0 * x[0][None, :] - x[1 : pad + 1][::-1]
    buf = jnp.concatenate([head, x, jnp.zeros((pad, C), x.dtype)], axis=0)
    # tail odd extension at the traced boundary: 2*x[last] - x[last-1-j]
    x_last = x[jnp.clip(last, 0, T - 1)]
    tail_src = x[jnp.clip(last - 1 - jnp.arange(pad), 0, T - 1)]
    tail = 2.0 * x_last[None, :] - tail_src
    buf = lax.dynamic_update_slice(buf, tail, (pad + length, 0))

    valid_len = length + 2 * pad
    y1 = _lfilter_scan(buf, b, a, zi * buf[0][:, None])
    # time-reverse the ragged valid region: flip puts it at the tail,
    # rolling left by the garbage amount brings it to the front
    y1r = jnp.roll(y1[::-1], -(L - valid_len), axis=0)
    y2 = _lfilter_scan(y1r, b, a, zi * y1r[0][:, None])
    y = jnp.roll(y2[::-1], -(L - valid_len), axis=0)
    return y[pad : pad + T]


def interp_lf0(lf0_voiced, voiced_mask):
    """np.interp-style fill of log-F0 over unvoiced gaps, one track.

    lf0_voiced (T,): log-F0 values (only voiced positions are read);
    voiced_mask (T,) bool.  Linear between voiced frames, edge-held
    outside, zeros when nothing is voiced.
    """
    import jax.numpy as jnp
    from jax import lax

    T = lf0_voiced.shape[0]
    idx = jnp.arange(T, dtype=jnp.int32)
    prev = lax.cummax(jnp.where(voiced_mask, idx, -_BIG))
    nxt = lax.cummin(jnp.where(voiced_mask, idx, _BIG), reverse=True)
    v_prev = lf0_voiced[jnp.clip(prev, 0, T - 1)]
    v_next = lf0_voiced[jnp.clip(nxt, 0, T - 1)]
    span = jnp.maximum(nxt - prev, 1)
    w = (idx - prev).astype(lf0_voiced.dtype) / span.astype(lf0_voiced.dtype)
    mid = v_prev + w * (v_next - v_prev)
    out = jnp.where(prev < 0, v_next, jnp.where(nxt >= _BIG, v_prev, mid))
    out = jnp.where(nxt == prev, v_prev, out)
    return jnp.where(voiced_mask.any(), out, jnp.zeros_like(out))


def variance_scaling_masked(x, gv, mask, offset: int = 2):
    """GV postfilter over masked frames, one track: x (T, D), gv (D,),
    mask (T,) bool (note frames within the valid length)."""
    import jax.numpy as jnp

    m = mask[:, None].astype(x.dtype)
    cnt = jnp.maximum(m.sum(), 1.0)
    mu = (x * m).sum(axis=0) / cnt
    var = (((x - mu) ** 2) * m).sum(axis=0) / cnt
    scale = jnp.sqrt(gv / jnp.maximum(var, 1e-12))
    scaled = scale * (x - mu) + mu
    dims = jnp.arange(x.shape[1]) >= offset
    out = jnp.where(mask[:, None] & dims[None, :], scaled, x)
    return jnp.where(mask.any(), out, x)


def fused_world_postprocess(
    pred,
    lengths,
    note_mask,
    affine_a,
    affine_b,
    gv,
    filt_b,
    filt_a,
    filt_zi,
    *,
    stream_sizes: Tuple[int, ...],
    apply_gv: bool,
    gate_threshold: float,
    smooth: bool,
):
    """Normalized acoustic predictions -> device (mgc, lf0, vuv, bap).

    pred (N, T_pad, D) normalized model outputs (float16/32);
    lengths (N,) valid frame counts; note_mask (N, T_pad) GV note frames;
    affine (D,) scaler inverse; gv (mgc_dim,) target variances;
    filt_* per-channel smoothing coefficients over [mgc | bap | lf0]
    channels.  Matches gen.postprocess_acoustic for the static-stream
    WORLD configuration (post_filter_type 'gv'/'off', relative_f0 off,
    trajectory smoothing on).
    """
    import jax
    import jax.numpy as jnp

    s_mgc, s_lf0, s_vuv, s_bap = stream_sizes
    T = pred.shape[1]
    feats = pred.astype(jnp.float32) * affine_a + affine_b

    mgc = feats[..., :s_mgc]
    lf0_s = feats[..., s_mgc : s_mgc + s_lf0]
    vuv = feats[..., s_mgc + s_lf0 : s_mgc + s_lf0 + s_vuv]
    bap = feats[..., s_mgc + s_lf0 + s_vuv :]

    if apply_gv:
        mgc = jax.vmap(
            lambda x, m: variance_scaling_masked(x, gv, m, offset=2)
        )(mgc, note_mask)

    # V/UV-gated F0 + interp1d of log-F0 (gen_spsvs_static_features)
    idx = jnp.arange(T, dtype=jnp.int32)
    valid = idx[None, :] < lengths[:, None]
    voiced = (vuv[..., 0] > gate_threshold) & valid
    lf0 = jax.vmap(interp_lf0)(lf0_s[..., 0], voiced)[..., None]

    if smooth:
        stacked = jnp.concatenate([mgc, bap, lf0], axis=-1)
        smoothed = jax.vmap(
            lambda x, n: _filtfilt_ragged(x, n, filt_b, filt_a, filt_zi)
        )(stacked, lengths)
        mgc = smoothed[..., :s_mgc]
        bap = smoothed[..., s_mgc : s_mgc + s_bap]
        lf0 = smoothed[..., s_mgc + s_bap :]

    bap = jnp.clip(bap, -60.0, 0.0)
    return mgc, lf0, vuv, bap


def jit_fused_world_postprocess():
    """The jitted entry point (static config via static_argnames)."""
    import jax

    return jax.jit(
        fused_world_postprocess,
        static_argnames=(
            "stream_sizes",
            "apply_gv",
            "gate_threshold",
            "smooth",
        ),
    )
