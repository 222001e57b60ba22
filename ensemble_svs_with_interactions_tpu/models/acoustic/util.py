"""Residual-F0 machinery shared by acoustic models.

Parity target: /root/reference/nnsvs/acoustic_models/util.py:8-57
(predict_lf0_with_residual).  The reference's pad_inference
(:60-151) is host-side plumbing around torch models; in this framework the
equivalent reduction-factor padding happens in the generation pipeline
(gen.py) with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def point_estimate(pred):
    """Point estimate of a sub-model output.

    MDN heads return ``(log_pi, log_sigma, mu)`` (3-tuple) and AR MDN
    decoders return ``(mu, sigma)`` (2-tuple) at inference; the reference
    conditions downstream streams on the selected mean in both cases
    (nnsvs/acoustic_models/multistream.py:1151-1157 ``lf0_cond = lf0[0]``,
    tacotron_f0.py:511-514 returning the mu trajectory).
    """
    if isinstance(pred, list):
        # Post-Net decoders return [coarse, fine]; condition on the fine
        # trajectory (reference pad_inference, acoustic_models/util.py:146)
        pred = pred[-1]
    if isinstance(pred, tuple) and len(pred) == 3:
        from ensemble_svs_with_interactions_tpu.ops.mdn import (
            mdn_get_most_probable_sigma_and_mu,
        )

        return mdn_get_most_probable_sigma_and_mu(*pred)[1]
    if isinstance(pred, tuple) and len(pred) == 2:
        return pred[0]
    return pred


def concat_stream_outputs(parts, out_dim: int):
    """Concatenate per-stream decoder outputs into the full feature vector.

    If any decoder returned a ``[coarse, fine]`` list (a Post-Net decoder),
    the result is a LIST of concatenated outputs — one per refinement
    stage — so the trainer supervises both, exactly like the reference's
    ``has_postnet_output`` branch (nnsvs/acoustic_models/multistream.py:
    148-167).  Otherwise a single (B, T, out_dim) array.
    """
    if any(isinstance(p, list) for p in parts):
        n = max(len(p) for p in parts if isinstance(p, list))
        outs = []
        for idx in range(n):
            row = [p[idx] if isinstance(p, list) else p for p in parts]
            out = jnp.concatenate(row, axis=-1)
            assert out.shape[-1] == out_dim
            outs.append(out)
        return outs
    out = jnp.concatenate(list(parts), axis=-1)
    assert out.shape[-1] == out_dim
    return out


def predict_lf0_with_residual(
    in_feats,
    out_feats,
    in_lf0_idx: int = 300,
    in_lf0_min: float = 5.3936276,
    in_lf0_max: float = 6.491111,
    out_lf0_idx: int = 180,
    out_lf0_mean: float = 5.953093881972361,
    out_lf0_scale: float = 0.23435173188961034,
    residual_f0_max_cent: float = 600.0,
):
    """Compute lf0 = score_lf0 + scaled-tanh(residual), renormalized.

    Args:
        in_feats: (B, T, D_in) normalized (min-max) input features.
        out_feats: (B, T, D_out) raw outputs or (B, T, G, D_out) MDN means.

    Returns:
        (lf0_pred, lf0_residual): lf0_pred is normalized to the output
        scaler's domain; shapes (B, T, 1)/(B, T, G) matching out_feats.
    """
    lf0_score = in_feats[:, :, in_lf0_idx][..., None]
    lf0_score_denorm = lf0_score * (in_lf0_max - in_lf0_min) + in_lf0_min

    # bound the residual to +/- residual_f0_max_cent cents via scaled tanh
    max_lf0_ratio = residual_f0_max_cent * np.log(2) / 1200.0

    if out_feats.ndim == 4:
        lf0_residual = out_feats[:, :, :, out_lf0_idx]  # (B, T, G)
    else:
        lf0_residual = out_feats[:, :, out_lf0_idx][..., None]  # (B, T, 1)
    lf0_residual = max_lf0_ratio * jnp.tanh(lf0_residual)

    lf0_pred_denorm = lf0_score_denorm + lf0_residual
    lf0_pred = (lf0_pred_denorm - out_lf0_mean) / out_lf0_scale
    return lf0_pred, lf0_residual


def set_lf0_column(out_feats, lf0_pred, out_lf0_idx: int):
    """Inject predicted lf0 into the lf0 column of (B,T,D) or (B,T,G,D)."""
    if out_feats.ndim == 4:
        return out_feats.at[:, :, :, out_lf0_idx].set(lf0_pred)
    return out_feats.at[:, :, out_lf0_idx].set(lf0_pred[..., 0])
