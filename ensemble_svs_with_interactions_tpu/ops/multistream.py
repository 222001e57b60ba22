"""Multi-stream feature utilities (stream split/select, static extraction,
per-stream MLPG).

Behavioral contract mirrors /root/reference/nnsvs/multistream.py:8-224 with
array-library-agnostic slicing (works on np.ndarray and jnp.Array alike —
all slices are static, so everything stays jit-friendly).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.ops.mlpg import default_windows, mlpg

get_windows = default_windows


def _start_indices(stream_sizes: Sequence[int]) -> List[int]:
    out = [0]
    for s in stream_sizes[:-1]:
        out.append(out[-1] + int(s))
    return out


def split_streams(inputs, stream_sizes: Optional[Sequence[int]] = None):
    """Split concatenated multi-stream features into a list of streams."""
    if stream_sizes is None:
        stream_sizes = [60, 1, 1, 1]
    ret = []
    for start, size in zip(_start_indices(stream_sizes), stream_sizes):
        ret.append(inputs[..., start : start + int(size)])
    return ret


def select_streams(
    inputs,
    stream_sizes: Optional[Sequence[int]] = None,
    streams: Optional[Sequence[bool]] = None,
    concat: bool = True,
):
    """Select a subset of streams (optionally re-concatenated)."""
    if stream_sizes is None:
        stream_sizes = [60, 1, 1, 1]
    if streams is None:
        streams = [True] * len(stream_sizes)
    ret = []
    for start, size, enabled in zip(
        _start_indices(stream_sizes), stream_sizes, streams
    ):
        if not enabled:
            continue
        ret.append(inputs[..., start : start + int(size)])
    if not concat:
        return ret
    if isinstance(inputs, np.ndarray):
        return np.concatenate(ret, axis=-1)
    return jnp.concatenate(ret, axis=-1)


def get_static_stream_sizes(
    stream_sizes: Sequence[int],
    has_dynamic_features: Sequence[bool],
    num_windows: int,
) -> np.ndarray:
    """Static-only sizes for streams that carry delta features."""
    sizes = np.asarray(stream_sizes, dtype=np.int64).copy()
    mask = np.asarray(has_dynamic_features, dtype=bool)
    sizes[mask] = sizes[mask] // num_windows
    return sizes


def get_static_features(
    inputs,
    num_windows: int,
    stream_sizes: Optional[Sequence[int]] = None,
    has_dynamic_features: Optional[Sequence[bool]] = None,
    streams: Optional[Sequence[bool]] = None,
):
    """Extract the static parts of static+dynamic multi-stream features.

    Returns a list of per-stream static features (matching the reference's
    behavior at /root/reference/nnsvs/multistream.py:116-163).
    """
    if stream_sizes is None:
        stream_sizes = [180, 3, 1, 15]
    if has_dynamic_features is None:
        has_dynamic_features = [True, True, False, True]
    if streams is None:
        streams = [True] * len(stream_sizes)

    D = inputs.shape[-1]
    if len(stream_sizes) == 1:
        if has_dynamic_features[0]:
            return inputs[..., : D // num_windows]
        return inputs

    ret = []
    for start, size, dyn, enabled in zip(
        _start_indices(stream_sizes), stream_sizes, has_dynamic_features, streams
    ):
        if not enabled:
            continue
        size = int(size)
        if dyn:
            ret.append(inputs[..., start : start + size // num_windows])
        else:
            ret.append(inputs[..., start : start + size])
    return ret


def multi_stream_mlpg(
    inputs,
    variances,
    windows,
    stream_sizes: Optional[Sequence[int]] = None,
    has_dynamic_features: Optional[Sequence[bool]] = None,
    streams: Optional[Sequence[bool]] = None,
):
    """Per-stream MLPG over concatenated multi-stream features.

    Args:
        inputs: (T, D) static+dynamic means.
        variances: (T, D) per-frame variances or (D,) global variances.
        windows: MLPG window specs (list) or window count (int).
        stream_sizes / has_dynamic_features / streams: stream layout.

    Returns:
        (T, sum(static sizes of enabled streams)) generated static features.
    """
    if stream_sizes is None:
        stream_sizes = [180, 3, 1, 3]
    if has_dynamic_features is None:
        has_dynamic_features = [True, True, False, True]
    if streams is None:
        streams = [True] * len(stream_sizes)
    T, D = inputs.shape
    if D != int(np.sum(stream_sizes)):
        raise RuntimeError(
            f"stream sizes {stream_sizes} do not sum to feature dim {D}"
        )

    # keep host arrays on the host: mlpg() picks the LAPACK banded solver
    # for NumPy inputs (no device round trip) and the scan kernel for
    # device arrays
    if isinstance(inputs, np.ndarray):
        variances = np.asarray(variances)
    else:
        variances = jnp.asarray(variances)
    per_frame_var = variances.ndim == 2

    ret = []
    for start, size, dyn, enabled in zip(
        _start_indices(stream_sizes), stream_sizes, has_dynamic_features, streams
    ):
        if not enabled:
            continue
        size = int(size)
        x = inputs[:, start : start + size]
        var = (
            variances[:, start : start + size]
            if per_frame_var
            else variances[start : start + size]
        )
        if dyn:
            ret.append(np.asarray(mlpg(x, var, windows)))
        else:
            ret.append(np.asarray(x))
    return np.concatenate(ret, axis=-1)
