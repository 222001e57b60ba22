"""Dev-set rendering during training: synthesized audio + parameter plots.

Parity targets: /root/reference/nnsvs/train_util.py:2111-2196 (synthesize),
:2340 (eval_spss_model), :3148 (plot_spsvs_params) — the reference renders
dev-utterance audio and matplotlib spectrogram/F0 figures into TensorBoard
each eval epoch.  Here outputs are written as wav/png files under
``{out_dir}/eval/epoch{N}`` (and to TensorBoard when available).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from ensemble_svs_with_interactions_tpu.ops import world
from ensemble_svs_with_interactions_tpu.ops.multistream import (
    get_static_features,
    get_static_stream_sizes,
    split_streams,
)


def synthesize_from_static(
    static_feats: np.ndarray,
    stream_sizes: Sequence[int],
    sample_rate: int,
    frame_period: float = 5.0,
    vuv_threshold: float = 0.3,
    use_world_codec: bool = True,
):
    """Static (mgc, lf0, vuv, bap) features -> waveform via the WORLD kernel."""
    mgc, lf0, vuv, bap = split_streams(static_feats, list(stream_sizes))
    wav = np.asarray(
        world.synthesize_from_streams(
            mgc.astype(np.float32),
            lf0.astype(np.float32),
            vuv.astype(np.float32),
            np.clip(bap, -60, 0).astype(np.float32),
            sample_rate,
            frame_period,
            vuv_threshold=vuv_threshold,
        )
    )
    peak = np.abs(wav).max()
    return wav / peak if peak > 1.0 else wav


def plot_spsvs_params(
    out_path,
    pred_static: np.ndarray,
    target_static: np.ndarray,
    stream_sizes: Sequence[int],
    sample_rate: int,
):
    """Predicted-vs-target F0 track and mgc heatmaps, saved as a png."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p_mgc, p_lf0, p_vuv, _ = split_streams(pred_static, list(stream_sizes))
    t_mgc, t_lf0, t_vuv, _ = split_streams(target_static, list(stream_sizes))

    fig, axes = plt.subplots(3, 1, figsize=(10, 8))
    t_axis = np.arange(len(p_lf0)) * 0.005
    f0_pred = np.exp(p_lf0[:, 0]) * (p_vuv[:, 0] > 0.5)
    f0_tgt = np.exp(t_lf0[:, 0]) * (t_vuv[:, 0] > 0.5)
    axes[0].plot(t_axis, f0_tgt, label="target", linewidth=1)
    axes[0].plot(t_axis, f0_pred, label="predicted", linewidth=1, alpha=0.8)
    axes[0].set_ylabel("F0 [Hz]")
    axes[0].legend()
    axes[1].imshow(t_mgc.T, aspect="auto", origin="lower", interpolation="none")
    axes[1].set_ylabel("target mgc")
    axes[2].imshow(p_mgc.T, aspect="auto", origin="lower", interpolation="none")
    axes[2].set_ylabel("predicted mgc")
    axes[2].set_xlabel("frame")
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)


def render_eval_outputs(
    out_dir,
    epoch: int,
    pred_out_feats: np.ndarray,
    target_out_feats: np.ndarray,
    lengths: Sequence[int],
    out_scaler,
    stream_sizes: Sequence[int],
    has_dynamic_features: Sequence[bool],
    num_windows: int,
    sample_rate: int,
    max_utts: int = 2,
    writer=None,
):
    """Render up to ``max_utts`` dev utterances: wav + plot per utterance."""
    from scipy.io import wavfile

    out_dir = Path(out_dir) / "eval" / f"epoch{epoch:04d}"
    out_dir.mkdir(parents=True, exist_ok=True)
    static_sizes = [
        int(s)
        for s in get_static_stream_sizes(
            stream_sizes, has_dynamic_features, num_windows
        )
    ]

    pred = np.asarray(out_scaler.inverse_transform(np.asarray(pred_out_feats)))
    target = np.asarray(out_scaler.inverse_transform(np.asarray(target_out_feats)))

    def _static(x):
        parts = get_static_features(
            x[None], num_windows, list(stream_sizes), list(has_dynamic_features)
        )
        return np.concatenate([np.asarray(p)[0] for p in parts], axis=-1)

    for i in range(min(max_utts, len(pred))):
        L = int(lengths[i])
        if L == 0:
            continue
        p = _static(pred[i, :L]) if any(has_dynamic_features) else pred[i, :L]
        t = _static(target[i, :L]) if any(has_dynamic_features) else target[i, :L]
        if len(static_sizes) == 4:
            wav = None  # don't reuse a previous utterance's waveform
            try:
                wav = synthesize_from_static(p, static_sizes, sample_rate)
                wavfile.write(
                    out_dir / f"utt{i}_pred.wav",
                    sample_rate,
                    (np.clip(wav, -1, 1) * 32767).astype(np.int16),
                )
            except Exception:  # noqa: BLE001 — rendering must not kill training
                pass
            plot_spsvs_params(
                out_dir / f"utt{i}_params.png", p, t, static_sizes, sample_rate
            )
            if writer is not None and writer.tb is not None and wav is not None:
                try:
                    wav = wav.astype(np.float32)
                    import torch

                    writer.tb.add_audio(
                        f"eval/utt{i}", torch.from_numpy(wav[None]), epoch,
                        sample_rate=sample_rate,
                    )
                except Exception:  # noqa: BLE001
                    pass
