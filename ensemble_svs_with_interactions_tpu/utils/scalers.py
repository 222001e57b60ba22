"""Feature scalers with sklearn-compatible attributes and streaming fit.

Parity targets: /root/reference/nnsvs/util.py:252-339 (transform-only
Standard/MinMax scalers loaded from .npy stats) plus the fit side that the
reference delegates to sklearn in nnsvs/bin/fit_scaler.py.  Scalers operate
on NumPy or JAX arrays transparently (pure arithmetic).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ensemble_svs_with_interactions_tpu.ops.multistream import (
    get_static_features,
)


class StandardScaler:
    """Standardization scaler: (x - mean) / scale.

    ``scale_`` is stored separately from sqrt(var_) to match stats files
    produced by sklearn (which floors near-zero scales).
    """

    def __init__(self, mean=None, var=None, scale=None):
        self.mean_ = mean
        self.var_ = var
        self.scale_ = scale
        # streaming-fit accumulators
        self._count = 0.0
        self._m2 = None

    def partial_fit(self, x: np.ndarray) -> "StandardScaler":
        x = np.asarray(x, dtype=np.float64)
        if self.mean_ is None or self._count == 0:
            self.mean_ = np.zeros(x.shape[-1])
            self._m2 = np.zeros(x.shape[-1])
            self._count = 0.0
        n_b = x.shape[0]
        mean_b = x.mean(axis=0)
        m2_b = ((x - mean_b) ** 2).sum(axis=0)
        n_a, mean_a, m2_a = self._count, self.mean_, self._m2
        n = n_a + n_b
        delta = mean_b - mean_a
        self.mean_ = mean_a + delta * (n_b / n)
        self._m2 = m2_a + m2_b + delta**2 * (n_a * n_b / n)
        self._count = n
        self.var_ = self._m2 / self._count
        self.scale_ = np.sqrt(np.where(self.var_ < 1e-10, 1.0, self.var_))
        return self

    def fit(self, x: np.ndarray) -> "StandardScaler":
        self._count = 0.0
        return self.partial_fit(x)

    def transform(self, x):
        if isinstance(x, np.ndarray) and x.dtype == np.float32:
            # f32 fast path: float64 params would upcast the whole array
            # (3-7x slower on the featurization hot path; the result is
            # cast back to f32 by every consumer anyway)
            out = x - np.asarray(self.mean_, np.float32)
            out /= np.asarray(self.scale_, np.float32)
            return out
        return (x - self.mean_) / self.scale_

    def inverse_transform(self, x):
        if isinstance(x, np.ndarray) and x.dtype == np.float32:
            out = x * np.asarray(self.scale_, np.float32)
            out += np.asarray(self.mean_, np.float32)
            return out
        return x * self.scale_ + self.mean_


class MinMaxScaler:
    """Min-max scaler: scale_ * x + min_ maps data range to feature_range."""

    def __init__(
        self,
        min=None,
        scale=None,
        data_min=None,
        data_max=None,
        feature_range: Tuple[float, float] = (0.0, 1.0),
    ):
        self.min_ = min
        self.scale_ = scale
        self.data_min_ = data_min
        self.data_max_ = data_max
        self.feature_range = feature_range

    def partial_fit(self, x: np.ndarray) -> "MinMaxScaler":
        x = np.asarray(x, dtype=np.float64)
        dmin = x.min(axis=0)
        dmax = x.max(axis=0)
        if self.data_min_ is None:
            self.data_min_, self.data_max_ = dmin, dmax
        else:
            self.data_min_ = np.minimum(self.data_min_, dmin)
            self.data_max_ = np.maximum(self.data_max_, dmax)
        fmin, fmax = self.feature_range
        rng = self.data_max_ - self.data_min_
        rng = np.where(rng == 0.0, 1.0, rng)
        self.scale_ = (fmax - fmin) / rng
        self.min_ = fmin - self.data_min_ * self.scale_
        return self

    def fit(self, x: np.ndarray) -> "MinMaxScaler":
        self.data_min_ = None
        return self.partial_fit(x)

    def transform(self, x):
        if isinstance(x, np.ndarray) and x.dtype == np.float32:
            out = x * np.asarray(self.scale_, np.float32)
            out += np.asarray(self.min_, np.float32)
            return out
        return self.scale_ * x + self.min_

    def inverse_transform(self, x):
        if isinstance(x, np.ndarray) and x.dtype == np.float32:
            out = x - np.asarray(self.min_, np.float32)
            out /= np.asarray(self.scale_, np.float32)
            return out
        return (x - self.min_) / self.scale_


def extract_static_scaler(
    out_scaler: StandardScaler,
    stream_sizes: Sequence[int],
    has_dynamic_features: Sequence[bool],
    num_windows: int,
) -> StandardScaler:
    """Build a static-features-only scaler from a static+dynamic scaler."""

    def _static(v):
        parts = get_static_features(
            np.asarray(v).reshape(1, 1, -1),
            num_windows,
            list(stream_sizes),
            list(has_dynamic_features),
        )
        # (D,) like every other scaler (and the .npy stats files this
        # gets saved into by the packer)
        return np.concatenate(parts, axis=-1).reshape(-1)

    return StandardScaler(
        _static(out_scaler.mean_),
        _static(out_scaler.var_),
        _static(out_scaler.scale_),
    )


def load_standard_scaler(prefix) -> StandardScaler:
    """Load a StandardScaler from ``{prefix}_{mean,var,scale}.npy`` files."""
    return StandardScaler(
        np.load(f"{prefix}_mean.npy"),
        np.load(f"{prefix}_var.npy"),
        np.load(f"{prefix}_scale.npy"),
    )


def save_scaler(scaler, prefix) -> None:
    """Save scaler stats as .npy files (packed-model layout)."""
    if isinstance(scaler, StandardScaler):
        np.save(f"{prefix}_mean.npy", scaler.mean_)
        np.save(f"{prefix}_var.npy", scaler.var_)
        np.save(f"{prefix}_scale.npy", scaler.scale_)
    elif isinstance(scaler, MinMaxScaler):
        np.save(f"{prefix}_min.npy", scaler.min_)
        np.save(f"{prefix}_scale.npy", scaler.scale_)
    else:
        raise TypeError(f"unknown scaler type: {type(scaler)}")
