"""Maximum-likelihood parameter generation (MLPG) as a jitted TPU kernel.

Replaces the reference's dependency on nnmnkwii's Cython MLPG
(``nnmnkwii.paramgen.mlpg``, called from
/root/reference/nnsvs/multistream.py:221).  Given per-frame means and
variances of static+dynamic features, MLPG solves the banded SPD normal
equations

    (W^T Sigma^-1 W) y = W^T Sigma^-1 u

for the smooth static trajectory ``y``.  With the standard delta windows
([1], [-0.5, 0, 0.5], [1, -2, 1]) the system is pentadiagonal, so we
factorize with a banded Cholesky implemented as a ``lax.scan`` over time —
the per-step work is fully vectorized across feature dimensions (VPU), and
the band construction is a handful of shifted elementwise multiplies that
XLA fuses.

Feature layout matches the reference: ``means[:, w*D:(w+1)*D]`` holds the
w-th window's features (static first).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Window = Tuple[int, int, np.ndarray]

_VAR_FLOOR = 1e-12


def window_coeffs(windows: Sequence[Window]) -> List[np.ndarray]:
    """Normalize window specs to symmetric odd-length coefficient arrays."""
    out = []
    for left, right, coefs in windows:
        coefs = np.asarray(coefs, dtype=np.float64)
        width = max(left, right)
        full = np.zeros(2 * width + 1)
        # place coefficients: they span [-left, right]
        full[width - left : width + right + 1] = coefs
        out.append(full)
    return out


def build_banded_system(means, precisions, windows: Sequence[Window]):
    """Construct the compact banded normal equations.

    Args:
        means: (T, W*D) per-frame window means (static first).
        precisions: (T, W*D) per-frame precisions 1/sigma^2.
        windows: MLPG window specs.

    Returns:
        band: (k+1, T, D) where band[delta, t] = A[t, t+delta];
        rhs: (T, D).
    """
    coeff_list = window_coeffs(windows)
    W = len(coeff_list)
    T = means.shape[0]
    D = means.shape[1] // W
    k = 2 * max((len(c) - 1) // 2 for c in coeff_list)

    band = [jnp.zeros((T, D), dtype=means.dtype) for _ in range(k + 1)]
    rhs = jnp.zeros((T, D), dtype=means.dtype)

    def shifted(x, j):
        """x[t - j] with zeros outside [0, T)."""
        if j == 0:
            return x
        if j > 0:
            return jnp.concatenate([jnp.zeros((j,) + x.shape[1:], x.dtype), x[:-j]])
        return jnp.concatenate([x[-j:], jnp.zeros((-j,) + x.shape[1:], x.dtype)])

    for w, coefs in enumerate(coeff_list):
        half = (len(coefs) - 1) // 2
        p_w = precisions[:, w * D : (w + 1) * D]
        u_w = means[:, w * D : (w + 1) * D]
        pu_w = p_w * u_w
        for j in range(-half, half + 1):
            c_j = float(coefs[j + half])
            if c_j == 0.0:
                continue
            rhs = rhs + c_j * shifted(pu_w, j)
            for delta in range(0, k + 1):
                jd = j + delta
                if jd < -half or jd > half:
                    continue
                c_jd = float(coefs[jd + half])
                if c_jd == 0.0:
                    continue
                band[delta] = band[delta] + c_j * c_jd * shifted(p_w, j)

    return jnp.stack(band, axis=0), rhs


def banded_cholesky_solve(band, rhs):
    """Solve A y = rhs for a symmetric positive-definite banded A.

    Args:
        band: (k+1, T, D): band[delta, t] = A[t, t+delta] (per feature dim).
        rhs: (T, D).

    Returns:
        y: (T, D).

    Implemented as two ``lax.scan`` passes (factorize+forward, then backward),
    each step O(k^2) elementwise ops vectorized over D.
    """
    kp1, T, D = band.shape
    k = kp1 - 1
    dtype = rhs.dtype

    # --- factorize + forward substitution --------------------------------
    # carry: cols: (k, k+1, D) columns t-1..t-k of L (cols[m-1][delta] =
    #        L[t-m+delta, t-m]); zs: (k, D) previous z values z[t-1..t-k].
    def fwd_step(carry, inputs):
        cols, zs = carry
        a_t, b_t = inputs  # (k+1, D), (D,)

        # diag: A[t,t] - sum_m L[t, t-m]^2 ; L[t, t-m] = cols[m-1, m]
        lt_prev = jnp.stack([cols[m - 1, m] for m in range(1, k + 1)])  # (k, D)
        diag = a_t[0] - jnp.sum(lt_prev * lt_prev, axis=0)
        diag = jnp.maximum(diag, _VAR_FLOOR)
        l_tt = jnp.sqrt(diag)

        new_col = [l_tt]
        for delta in range(1, k + 1):
            # L[t+delta, t-m] = cols[m-1, m+delta] (0 beyond band)
            acc = a_t[delta]
            for m in range(1, k + 1):
                if m + delta <= k:
                    acc = acc - cols[m - 1, m + delta] * lt_prev[m - 1]
            new_col.append(acc / l_tt)
        new_col = jnp.stack(new_col)  # (k+1, D)

        z_t = (b_t - jnp.sum(lt_prev * zs, axis=0)) / l_tt

        cols = jnp.concatenate([new_col[None], cols[:-1]], axis=0)
        zs = jnp.concatenate([z_t[None], zs[:-1]], axis=0)
        return (cols, zs), (new_col, z_t)

    cols0 = jnp.zeros((k, k + 1, D), dtype)
    zs0 = jnp.zeros((k, D), dtype)
    band_t = jnp.moveaxis(band, 1, 0)  # (T, k+1, D)
    (_, _), (l_cols, z) = jax.lax.scan(fwd_step, (cols0, zs0), (band_t, rhs))

    # --- backward substitution -------------------------------------------
    # carry: ys: (k, D) next y values y[t+1..t+k]
    def bwd_step(ys, inputs):
        col_t, z_t = inputs  # (k+1, D), (D,)
        # y[t] = (z[t] - sum_m L[t+m, t] y[t+m]) / L[t, t]
        lt_next = col_t[1:]  # (k, D): L[t+m, t]
        y_t = (z_t - jnp.sum(lt_next * ys, axis=0)) / col_t[0]
        ys = jnp.concatenate([y_t[None], ys[:-1]], axis=0)
        return ys, y_t

    ys0 = jnp.zeros((k, D), dtype)
    _, y_rev = jax.lax.scan(bwd_step, ys0, (l_cols, z), reverse=True)
    return y_rev


@partial(jax.jit, static_argnames=("num_windows",))
def _mlpg_jit(means, variances, num_windows: int):
    windows = default_windows(num_windows)
    precisions = 1.0 / jnp.maximum(variances, _VAR_FLOOR)
    band, rhs = build_banded_system(means, precisions, windows)
    return banded_cholesky_solve(band, rhs)


def default_windows(num_windows: int = 3) -> List[Window]:
    """Standard static/delta/delta-delta windows (reference:
    /root/reference/nnsvs/multistream.py:8-26)."""
    windows: List[Window] = [(0, 0, np.array([1.0]))]
    if num_windows >= 2:
        windows.append((1, 1, np.array([-0.5, 0.0, 0.5])))
    if num_windows >= 3:
        windows.append((1, 1, np.array([1.0, -2.0, 1.0])))
    if num_windows >= 4:
        raise ValueError(f"unsupported number of windows: {num_windows}")
    return windows


def _build_banded_system_np(means, precisions, windows: Sequence[Window]):
    """NumPy twin of :func:`build_banded_system` for the host solver."""
    coeff_list = window_coeffs(windows)
    W = len(coeff_list)
    T = means.shape[0]
    D = means.shape[1] // W
    k = 2 * max((len(c) - 1) // 2 for c in coeff_list)

    band = np.zeros((k + 1, T, D), dtype=np.float64)
    rhs = np.zeros((T, D), dtype=np.float64)

    def shifted(x, j):
        if j == 0:
            return x
        out = np.zeros_like(x)
        if j > 0:
            out[j:] = x[:-j]
        else:
            out[:j] = x[-j:]
        return out

    for w, coefs in enumerate(coeff_list):
        half = (len(coefs) - 1) // 2
        p_w = precisions[:, w * D : (w + 1) * D]
        u_w = means[:, w * D : (w + 1) * D]
        pu_w = p_w * u_w
        for j in range(-half, half + 1):
            c_j = float(coefs[j + half])
            if c_j == 0.0:
                continue
            rhs += c_j * shifted(pu_w, j)
            for delta in range(0, k + 1):
                jd = j + delta
                if jd < -half or jd > half:
                    continue
                c_jd = float(coefs[jd + half])
                if c_jd == 0.0:
                    continue
                band[delta] += c_j * c_jd * shifted(p_w, j)
    return band, rhs


def _mlpg_host(means, variances, num_windows: int) -> np.ndarray:
    """Host-side MLPG via LAPACK's SPD banded solver (scipy solveh_banded).

    For inference-pipeline arrays (timing streams of a few hundred notes,
    acoustic statics of a few thousand frames) this is far cheaper than
    dispatching the scan kernel to a remote accelerator: the solve itself
    is microseconds and there is no device round trip.
    """
    from scipy.linalg import solveh_banded

    windows = default_windows(num_windows)
    precisions = 1.0 / np.maximum(np.asarray(variances, np.float64), _VAR_FLOOR)
    band, rhs = _build_banded_system_np(
        np.asarray(means, np.float64), precisions, windows
    )
    k = band.shape[0] - 1
    T, D = rhs.shape
    y = np.empty((T, D))
    ab = np.zeros((k + 1, T))
    for d in range(D):
        for delta in range(k + 1):
            ab[k - delta, delta:] = band[delta, : T - delta, d]
            if delta:
                ab[k - delta, :delta] = 0.0
        y[:, d] = solveh_banded(ab, rhs[:, d], lower=False)
    return y


def mlpg(means, variances, windows: Sequence[Window] | int = 3):
    """MLPG for a single sequence.

    Args:
        means: (T, W*D) window means.
        variances: (T, W*D) per-frame variances, or (W*D,) global variances.
        windows: window specs or window count.

    Returns:
        (T, D) static trajectory.

    Host NumPy inputs are solved on the host (LAPACK banded Cholesky);
    device arrays go through the jitted scan kernel so MLPG can live
    inside larger XLA programs.
    """
    if isinstance(windows, int):
        num_windows = windows
    else:
        num_windows = len(windows)
        # the banded kernels are specialized to the standard delta /
        # delta-delta windows; reject silently-different coefficients
        expected = default_windows(num_windows)
        for (l1, r1, c1), (l2, r2, c2) in zip(windows, expected):
            if (l1, r1) != (l2, r2) or not np.allclose(c1, c2):
                raise NotImplementedError(
                    "mlpg only supports the standard delta windows "
                    f"(default_windows({num_windows})); got {windows}"
                )
    if num_windows == 1:
        return means
    if isinstance(means, np.ndarray):
        v = np.asarray(variances)
        if v.ndim == 1:
            v = np.broadcast_to(v[None, :], means.shape)
        return _mlpg_host(means, v, num_windows)
    means = jnp.asarray(means)
    variances = jnp.asarray(variances)
    if variances.ndim == 1:
        variances = jnp.broadcast_to(variances[None, :], means.shape)
    return _mlpg_jit(means, variances, num_windows)


def apply_delta_windows(x: np.ndarray, windows: Sequence[Window]) -> np.ndarray:
    """Compute static+dynamic features by applying delta windows (host side).

    Replaces nnmnkwii.util.apply_delta_windows (used at data-prep time,
    /root/reference/nnsvs/data/data_source.py:12).  Edge frames replicate
    the boundary value (same convention as nnmnkwii's delta computation).
    """
    x = np.asarray(x)
    T, D = x.shape
    outs = []
    for left, right, coefs in windows:
        coefs = np.asarray(coefs, dtype=x.dtype)
        width = max(left, right)
        if width == 0:
            outs.append(x * float(coefs[0]))
            continue
        padded = np.pad(x, ((width, width), (0, 0)), mode="edge")
        full = np.zeros(2 * width + 1, dtype=x.dtype)
        full[width - left : width + right + 1] = coefs
        acc = np.zeros_like(x)
        for j, c in enumerate(full):
            if c == 0.0:
                continue
            acc += c * padded[j : j + T]
        outs.append(acc)
    return np.concatenate(outs, axis=1)
