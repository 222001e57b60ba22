"""Training losses: masked feature criteria, multistream dispatch, MDN NLL,
pitch regularization.

Parity targets: /root/reference/nnsvs/bin/train.py:47-120 (generic step),
train_acoustic.py:33-276 (multistream/MDN/diffusion dispatch + pitch reg),
train_util.py:1773-1817 (pitch regularization weights).
All functions are pure jnp and run inside the jitted train step.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.ops.mdn import mdn_loss
from ensemble_svs_with_interactions_tpu.ops.multistream import split_streams


def masked_mean(x, mask):
    """Mean of x over positions where mask (broadcastable) is 1."""
    mask = jnp.broadcast_to(mask, x.shape)
    total = jnp.sum(x * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def feats_criterion(pred, target, mask, kind: str = "mse"):
    if kind in ("l2", "mse"):
        err = (pred - target) ** 2
    elif kind in ("l1", "mae"):
        err = jnp.abs(pred - target)
    else:
        raise ValueError(f"unsupported criterion: {kind}")
    return masked_mean(err, mask)


def mdn_stream_loss(pred, target, mask):
    """Masked MDN NLL; pred = (log_pi, log_sigma, mu)."""
    log_pi, log_sigma, mu = pred
    nll = mdn_loss(log_pi, log_sigma, mu, target, reduce=False)
    m = mask if nll.ndim == 3 else mask[..., 0]
    return masked_mean(nll, m)


def get_stream_weight(
    stream_weights: Optional[Sequence[float]], stream_sizes: Sequence[int]
):
    if stream_weights is not None:
        return list(stream_weights)
    # proportional to stream dims (reference semantics: average by elements)
    total = float(sum(stream_sizes))
    return [s / total for s in stream_sizes]


def is_refinement_list(pred, stream_sizes: Sequence[int]) -> bool:
    """True when ``pred`` is a Post-Net wrapper's ``[coarse, fine, ...]``
    list of CONCATENATED outputs (each item full-width), as opposed to a
    per-stream list whose item widths match ``stream_sizes``."""
    if not isinstance(pred, list) or not pred:
        return False
    widths = [
        p.shape[-1] if hasattr(p, "shape") and getattr(p, "ndim", 0) else None
        for p in pred
    ]
    if len(pred) == len(stream_sizes) and widths == list(stream_sizes):
        return False
    total = sum(stream_sizes)
    return all(w == total for w in widths)


def multistream_loss(
    pred_streams,
    out_feats,
    mask,
    stream_sizes: Sequence[int],
    criterion: str = "mse",
    stream_wise: bool = False,
    stream_weights: Optional[Sequence[float]] = None,
):
    """Sum of per-stream losses; each stream may be a plain array (MSE),
    a 3-tuple (MDN NLL) or a 2-tuple (DDPM noise/x_recon MSE)."""
    streams = split_streams(out_feats, list(stream_sizes))
    assert len(streams) == len(pred_streams)
    if stream_wise:
        weights = get_stream_weight(stream_weights, stream_sizes)
    else:
        weights = None

    loss = 0.0
    total_n = 0.0
    for i, (pred, target) in enumerate(zip(pred_streams, streams)):
        if isinstance(pred, list):
            # Post-Net sub-decoder: [coarse, fine] — supervise both;
            # stage losses SUM with no division (reference
            # train_acoustic.py:148-170 accumulates per prediction)
            for p in pred:
                err = (
                    (p - target) ** 2
                    if criterion in ("l2", "mse")
                    else jnp.abs(p - target)
                )
                m = jnp.broadcast_to(mask, err.shape)
                if stream_wise:
                    loss = loss + weights[i] * masked_mean(err, m)
                else:
                    loss = loss + jnp.sum(err * m)
                    total_n = total_n + jnp.sum(m)
            continue
        if isinstance(pred, tuple) and len(pred) == 3:
            log_pi, log_sigma, mu = pred
            nll = mdn_loss(log_pi, log_sigma, mu, target, reduce=False)
            m = jnp.broadcast_to(
                mask if nll.ndim == 3 else mask[..., 0], nll.shape
            )
            if stream_wise:
                loss = loss + weights[i] * masked_mean(nll, m)
            else:
                loss = loss + jnp.sum(nll * m)
                total_n = total_n + jnp.sum(m)
        elif isinstance(pred, tuple) and len(pred) == 2:
            noise, x_recon = pred
            err = (noise - x_recon) ** 2
            m = jnp.broadcast_to(mask, err.shape)
            if stream_wise:
                loss = loss + weights[i] * masked_mean(err, m)
            else:
                loss = loss + jnp.sum(err * m)
                total_n = total_n + jnp.sum(m)
        else:
            if criterion in ("l2", "mse"):
                err = (pred - target) ** 2
            else:
                err = jnp.abs(pred - target)
            m = jnp.broadcast_to(mask, err.shape)
            if stream_wise:
                loss = loss + weights[i] * masked_mean(err, m)
            else:
                loss = loss + jnp.sum(err * m)
                total_n = total_n + jnp.sum(m)
    if not stream_wise:
        loss = loss / jnp.maximum(total_n, 1.0)
    return loss


def pitch_regularization_loss(lf0_residual, mask, pitch_reg_dyn_ws=1.0):
    """L1 penalty on the residual log-F0 with per-frame dynamic weights."""
    if isinstance(lf0_residual, (list, tuple)):
        return sum(
            masked_mean(pitch_reg_dyn_ws * jnp.abs(r), mask) for r in lf0_residual
        )
    return masked_mean(pitch_reg_dyn_ws * jnp.abs(lf0_residual), mask)


# --------------------------------------------------------------------------
# Pitch regularization weights (host-side, per-batch)
# --------------------------------------------------------------------------


def compute_pitch_regularization_weight(
    lf0_score_denorm: np.ndarray, decay_size: int = 25, max_w: float = 0.5
) -> np.ndarray:
    """(B, T) denormalized score log-F0 -> (B, T, 1) weights.

    Vectorized re-design of the reference's per-utterance loop
    (train_util.py:1773-1817): full weight inside notes, linear decay of
    ``decay_size`` frames at note edges, zero for very short notes.
    """
    from ensemble_svs_with_interactions_tpu.ops.pitch import note_segments

    B, T = lf0_score_denorm.shape
    w = np.zeros((B, T), dtype=np.float32)
    for b in range(B):
        for s, e in note_segments(lf0_score_denorm[b]):
            L = e - s
            if L > decay_size * 2:
                w[b, s:e] = max_w
                w[b, s : s + decay_size] *= np.arange(decay_size) / decay_size
                w[b, e - decay_size : e] *= (
                    np.arange(decay_size - 1, -1, -1) / decay_size
                )
            else:
                w[b, s:e] = 0.0
    return w[:, :, None]
