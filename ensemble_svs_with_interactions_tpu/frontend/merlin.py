"""Merlin-style linguistic feature extraction from HTS labels.

First-party replacement for ``nnmnkwii.frontend.merlin`` (an external Cython/
NumPy dependency of the reference; used at
/root/reference/nnsvs/data/data_source.py:96-103 and
/root/reference/nnsvs/gen.py:108-115).

Produces, per phone (or per frame when ``add_frame_features=True``):
  [binary QS answers | numeric CQS answers | optional subphone features]

The dev question set yields 50 binary + 32 numeric = 82 phone-level dims, and
86 frame-level dims with ``subphone_features="coarse_coding"`` (3 coarse-coded
position features + 1 frame-count feature), matching
recipes/_common/hed/jp_dev_latest.hed:1-5 in the reference.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ensemble_svs_with_interactions_tpu.io.hts import (
    HTSLabels,
    numeric_feature_value,
)


def get_frame_feature_size(subphone_features: Optional[str] = None) -> int:
    if subphone_features is None:
        return 0
    sp = subphone_features.strip().lower()
    sizes = {
        "full": 9,
        "state_only": 1,
        "frame_only": 1,
        "uniform_state": 2,
        "minimal_phoneme": 3,
        "coarse_coding": 4,
    }
    if sp not in sizes:
        raise ValueError(f"unknown subphone feature type: {subphone_features}")
    return sizes[sp]


def _binary_answers(binary_dict, context: str) -> np.ndarray:
    out = np.zeros(len(binary_dict), dtype=np.float32)
    for i in range(len(binary_dict)):
        _, regexes = binary_dict[i]
        for rx in regexes:
            if rx.search(context) is not None:
                out[i] = 1.0
                break
    return out


def _numeric_answers(numeric_dict, context: str) -> np.ndarray:
    out = np.full(len(numeric_dict), -1.0, dtype=np.float32)
    for i in range(len(numeric_dict)):
        _, regex = numeric_dict[i]
        m = regex.search(context)
        if m is not None:
            out[i] = numeric_feature_value(m.group(1))
    return out


# --------------------------------------------------------------------------
# Coarse-coded subphone position features (Merlin-compatible)
# --------------------------------------------------------------------------

_CC_NPOINTS = 600


def _compute_coarse_coding_curves() -> np.ndarray:
    """Three overlapping Gaussian bumps over normalized phone position."""
    curves = np.zeros((3, _CC_NPOINTS))
    x1 = np.linspace(-1.5, 1.5, _CC_NPOINTS)
    x2 = np.linspace(-1.0, 2.0, _CC_NPOINTS)
    x3 = np.linspace(-0.5, 2.5, _CC_NPOINTS)
    sigma = 0.4
    for row, (x, mu) in enumerate(((x1, 0.0), (x2, 0.5), (x3, 1.0))):
        curves[row] = np.exp(-((x - mu) ** 2) / (2.0 * sigma**2))
    return curves


_CC_CURVES = _compute_coarse_coding_curves()


def _coarse_coding_features(num_frames: int) -> np.ndarray:
    """(num_frames, 3) coarse-coded relative-position features."""
    out = np.zeros((num_frames, 3), dtype=np.float32)
    for i in range(num_frames):
        rel = int((200.0 / num_frames) * i)
        out[i, 0] = _CC_CURVES[0, 300 + rel]
        out[i, 1] = _CC_CURVES[1, 200 + rel]
        out[i, 2] = _CC_CURVES[2, 100 + rel]
    return out


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


def linguistic_features(
    labels: HTSLabels,
    binary_dict,
    numeric_dict,
    add_frame_features: bool = False,
    subphone_features: Optional[str] = None,
    frame_shift: int = 50000,
) -> np.ndarray:
    """Extract linguistic features from HTS labels.

    Args:
        labels: HTS labels (full-context).
        binary_dict, numeric_dict: question sets from
            :func:`ensemble_svs_with_interactions_tpu.io.hts.load_question_set`.
        add_frame_features: emit one row per frame instead of per phone.
        subphone_features: ``None``, ``"coarse_coding"`` (3 position
            features + phone frame count appended per frame) or
            ``"minimal_phoneme"`` (fraction through the phone forward /
            backward + phone frame count, nnmnkwii's other phone-level
            mode).  The state-level modes ("full", "state_only", ...)
            require HMM state alignments, which singing labels never
            carry — they raise, matching nnmnkwii's behavior for
            phone-level alignment labels.
        frame_shift: frame shift in 100 ns units.

    Returns:
        (N, D) float32 array, N = num phones or num frames.
    """
    dict_size = len(binary_dict) + len(numeric_dict)
    frame_size = get_frame_feature_size(subphone_features)
    if subphone_features not in (None, "coarse_coding", "minimal_phoneme"):
        raise NotImplementedError(
            "subphone feature type not supported for phone-level alignment "
            f"labels: {subphone_features}"
        )
    if subphone_features is not None and not add_frame_features:
        raise ValueError("subphone features require add_frame_features=True")

    dim = dict_size + frame_size
    rows = []
    for s, e, context in labels:
        phone_vec = np.concatenate(
            [
                _binary_answers(binary_dict, context),
                _numeric_answers(numeric_dict, context),
            ]
        )
        if not add_frame_features:
            rows.append(phone_vec[None, :])
            continue
        nframes = int(e / frame_shift) - int(s / frame_shift)
        block = np.zeros((nframes, dim), dtype=np.float32)
        block[:, :dict_size] = phone_vec[None, :]
        if subphone_features == "coarse_coding":
            block[:, dict_size : dict_size + 3] = _coarse_coding_features(nframes)
            block[:, dict_size + 3] = float(nframes)
        elif subphone_features == "minimal_phoneme":
            frac = (np.arange(nframes) + 1) / max(nframes, 1)
            block[:, dict_size] = frac                  # forward fraction
            block[:, dict_size + 1] = frac[::-1]        # backward fraction
            block[:, dict_size + 2] = float(nframes)    # phone duration
        rows.append(block)
    return np.concatenate(rows, axis=0).astype(np.float32)


def duration_features(labels: HTSLabels, frame_shift: int = 50000) -> np.ndarray:
    """Per-phone durations in frames, shape (N, 1) float32."""
    s = np.asarray(labels.start_times) // frame_shift
    e = np.asarray(labels.end_times) // frame_shift
    return (e - s).astype(np.float32).reshape(-1, 1)
