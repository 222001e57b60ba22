"""Mel-cepstrum <-> spectrum transforms (SPTK equivalents), TPU-first.

Replaces pysptk's ``sp2mc`` / ``mc2sp`` / ``mcepalpha`` (used by the
reference at /root/reference/nnsvs/gen.py:1643-1666,2054-2061 and
nnsvs/data/data_source.py:466-491).

Key insight: SPTK's ``freqt`` frequency-warping recursion is *linear* in the
input cepstrum, so the whole transform is a (cached) warping matrix — the
per-frame conversion becomes one matmul plus an (i)rfft, both of which XLA
maps straight onto the MXU / fused FFT kernels.  The recursion itself runs
once on the host per (in_len, order, alpha) triple to build the matrix.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def mcepalpha(fs: int) -> float:
    """All-pass constant approximating the mel scale for a sampling rate.

    Computed by minimizing the RMS error between the warped frequency axis
    and the mel scale (same method as pysptk.util.mcepalpha).
    """
    alpha_candidates = np.arange(0.0, 1.0, 0.001)
    n = 256
    omega = np.arange(1, n + 1) * np.pi / n
    mel = np.log(1.0 + (omega / np.pi) * (fs / 2.0) / 1000.0)
    mel = mel / mel.max()
    best_alpha, best_err = 0.0, np.inf
    for a in alpha_candidates:
        warped = np.arctan2(
            (1 - a * a) * np.sin(omega), (1 + a * a) * np.cos(omega) - 2 * a
        )
        warped = np.where(warped < 0, warped + 2 * np.pi, warped)
        warped = warped / warped.max()
        err = np.sum((warped - mel) ** 2)
        if err < best_err:
            best_err, best_alpha = err, a
    return float(best_alpha)


def _freqt_single(c: np.ndarray, order: int, alpha: float) -> np.ndarray:
    """Reference scalar freqt recursion (Oppenheim) for one cepstrum."""
    prev = np.zeros(order + 1)
    for i in reversed(range(len(c))):
        g = np.zeros(order + 1)
        g[0] = c[i] + alpha * prev[0]
        if order >= 1:
            g[1] = (1.0 - alpha * alpha) * prev[0] + alpha * prev[1]
        for m in range(2, order + 1):
            g[m] = prev[m - 1] + alpha * (prev[m] - g[m - 1])
        prev = g
    return prev


@lru_cache(maxsize=16)
def freqt_matrix(in_len: int, order: int, alpha: float) -> np.ndarray:
    """(order+1, in_len) matrix A with freqt(c) == A @ c.

    Built by running the (linear) recursion on the identity basis, all
    columns simultaneously.
    """
    prev = np.zeros((order + 1, in_len))
    eye = np.eye(in_len)
    for i in reversed(range(in_len)):
        g = np.zeros_like(prev)
        g[0] = eye[i] + alpha * prev[0]
        if order >= 1:
            g[1] = (1.0 - alpha * alpha) * prev[0] + alpha * prev[1]
        for m in range(2, order + 1):
            g[m] = prev[m - 1] + alpha * (prev[m] - g[m - 1])
        prev = g
    return prev


def freqt(c, order: int, alpha: float):
    """Warped cepstrum via cached matrix; c is (..., in_len)."""
    A = freqt_matrix(c.shape[-1], order, float(alpha))
    if isinstance(c, np.ndarray):
        return c @ A.T
    return c @ jnp.asarray(A.T, dtype=c.dtype)


def sp2mc(powerspec, order: int, alpha: float):
    """Power spectrum (..., fftlen//2+1) -> mel-cepstrum (..., order+1).

    Matches pysptk.sp2mc: log -> real cepstrum -> freqt.
    """
    xp = jnp if not isinstance(powerspec, np.ndarray) else np
    logsp = xp.log(powerspec)
    c = xp.fft.irfft(logsp, axis=-1)  # (..., fftlen)
    half = powerspec.shape[-1]  # fftlen//2 + 1
    c = c[..., :half]
    if xp is np:
        c = c.copy()
        c[..., 0] /= 2.0
    else:
        c = c.at[..., 0].divide(2.0)
    return freqt(c, order, alpha)


def mc2sp(mc, alpha: float, fftlen: int):
    """Mel-cepstrum (..., order+1) -> power spectrum (..., fftlen//2+1).

    Matches pysptk.mc2sp: inverse-warp, symmetrize, exp(2 * Re(rfft)).
    """
    xp = jnp if not isinstance(mc, np.ndarray) else np
    half = fftlen // 2
    c = freqt(mc, half, -alpha)  # (..., half+1)
    if xp is np:
        c = c.copy()
        c[..., 0] *= 2.0
    else:
        c = c.at[..., 0].multiply(2.0)
    # symmetric cepstrum -> rfft gives real log amplitude; power = exp(2*amp)
    sym = xp.concatenate([c, c[..., -2:0:-1]], axis=-1)  # (..., fftlen)
    logamp = xp.real(xp.fft.rfft(sym, axis=-1)) / 2.0
    return xp.exp(2.0 * logamp)


def mc2b(mc, alpha: float):
    """Mel-cepstrum -> MLSA filter coefficients (for completeness)."""
    xp = jnp if not isinstance(mc, np.ndarray) else np
    b = xp.zeros_like(mc)
    order = mc.shape[-1] - 1
    if xp is np:
        b = mc.copy()
        for i in reversed(range(order)):
            b[..., i] = mc[..., i] - alpha * b[..., i + 1]
        return b
    b = b.at[..., order].set(mc[..., order])
    for i in reversed(range(order)):
        b = b.at[..., i].set(mc[..., i] - alpha * b[..., i + 1])
    return b
