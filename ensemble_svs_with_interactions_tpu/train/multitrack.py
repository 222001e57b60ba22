"""Multi-track training: interaction losses and train steps.

Parity targets: /root/reference/nnsvs/bin/train_acoustic_multitrack.py:40-392
(stream losses + the paper's interaction losses: inter-singer log-F0
difference on frames voiced in BOTH tracks, and 0-th mel-cepstrum (loudness)
difference; optional exponential weight schedule 2^((epoch-N)/10) at :537-540;
``sub_require_grad=False`` detaches the sub track :112-113) and
nnsvs/bin/train_multitrack.py (timelag/duration on note-merged inputs).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ensemble_svs_with_interactions_tpu.base import PredictionType
from ensemble_svs_with_interactions_tpu.ops.multistream import split_streams
from ensemble_svs_with_interactions_tpu.train import losses as L
from ensemble_svs_with_interactions_tpu.train.loop import (
    MetricsWriter,
    amp_cast,
    amp_uncast,
    build_optimizer,
    load_params_shape_filtered,
    save_checkpoint,
    TrainState,
)
from ensemble_svs_with_interactions_tpu.utils.config import Config, instantiate
from ensemble_svs_with_interactions_tpu.utils.logger import getLogger
from ensemble_svs_with_interactions_tpu.utils.misc import init_seed


def interaction_weight(spec, epoch: int, nepochs: int) -> float:
    """Resolve a static or 'exponential'-scheduled interaction weight."""
    if spec == "exponential":
        return float(2.0 ** ((epoch - nepochs) / 10.0))
    return float(spec if spec is not None else 0.0)


def _stream_to_point(pred_stream):
    """Reduce a stream prediction to a point estimate (mu for MDN)."""
    if isinstance(pred_stream, list):
        # Post-Net sub-decoder: take the refined stage
        pred_stream = pred_stream[-1]
    if isinstance(pred_stream, tuple) and len(pred_stream) == 3:
        from ensemble_svs_with_interactions_tpu.ops.mdn import (
            mdn_get_most_probable_sigma_and_mu,
        )

        return mdn_get_most_probable_sigma_and_mu(*pred_stream)[1]
    if isinstance(pred_stream, tuple) and len(pred_stream) == 2:
        return pred_stream[1]
    return pred_stream


def multitrack_acoustic_loss(
    pred_main,
    pred_sub,
    out_main,
    out_sub,
    mask,
    stream_sizes,
    criterion: str = "mse",
    logf0_diff_weight: float = 1.0,
    mgc_diff_weight: float = 1.0,
    sub_require_grad: bool = True,
    prediction_type=PredictionType.MULTISTREAM_HYBRID,
):
    """Feature + interaction losses for a multitrack acoustic model.

    pred_main/pred_sub are either concatenated (B, T, D) predictions or
    per-stream tuples/lists (MULTISTREAM_HYBRID).  Returns
    (loss_feats, loss_lf0_inter, loss_mgc0th_inter).
    """
    if not sub_require_grad:
        pred_sub = jax.tree_util.tree_map(jax.lax.stop_gradient, pred_sub)

    streams_main = split_streams(out_main, list(stream_sizes))
    streams_sub = split_streams(out_sub, list(stream_sizes))

    # A full-width LIST is a Post-Net wrapper's [coarse, fine] pair of
    # concatenated outputs: every stage is supervised (summed, reference
    # train_acoustic_multitrack.py:199-240) while the interaction terms
    # read the LAST stage (the reference overwrites loss_lf0_interaction
    # per stage, so only the final stage's value survives); per-stream
    # lists pass through untouched
    pred_main_stages = None
    if L.is_refinement_list(pred_main, list(stream_sizes)):
        pred_main_stages = pred_main
        pred_main = pred_main[-1]
    if L.is_refinement_list(pred_sub, list(stream_sizes)):
        pred_sub = pred_sub[-1]

    if prediction_type == PredictionType.MULTISTREAM_HYBRID:
        # per-stream predictions (may be tuples, or already concatenated by
        # the wrapper) — main track loss only, as in the reference (the sub
        # track is trained through the interaction terms)
        if not isinstance(pred_main, (list, tuple)):
            pred_main = split_streams(pred_main, list(stream_sizes))
        if not isinstance(pred_sub, (list, tuple)):
            pred_sub = split_streams(pred_sub, list(stream_sizes))
        loss_feats = L.multistream_loss(
            pred_main, out_main, mask, stream_sizes, criterion=criterion
        )
        pred_lf0_main = _stream_to_point(pred_main[1])
        pred_lf0_sub = _stream_to_point(pred_sub[1])
        pred_mgc_main = _stream_to_point(pred_main[0])
        pred_mgc_sub = _stream_to_point(pred_sub[0])
    else:
        stages = pred_main_stages if pred_main_stages is not None else [pred_main]
        loss_feats = sum(
            L.feats_criterion(p, out_main, mask, criterion) for p in stages
        )
        pm = split_streams(pred_main, list(stream_sizes))
        ps = split_streams(pred_sub, list(stream_sizes))
        pred_lf0_main, pred_lf0_sub = pm[1], ps[1]
        pred_mgc_main, pred_mgc_sub = pm[0], ps[0]

    # --- inter-singer log-F0 difference (both-voiced frames only) ---------
    vuv_both = ((streams_main[2] > 0) & (streams_sub[2] > 0)).astype(jnp.float32)
    inter_mask = mask * vuv_both
    pred_lf0_diff = pred_lf0_main - pred_lf0_sub
    lf0_diff = streams_main[1] - streams_sub[1]
    if criterion in ("l2", "mse"):
        err = (pred_lf0_diff - lf0_diff) ** 2
    else:
        err = jnp.abs(pred_lf0_diff - lf0_diff)
    loss_lf0_inter = L.masked_mean(err, inter_mask)

    # --- 0th mel-cepstrum (loudness) difference ----------------------------
    # the reference computes this only in its generic (non-hybrid) branch;
    # for MULTISTREAM_HYBRID models it stays 0 via the locals() fallback
    # (train_acoustic_multitrack.py:257-266 vs :291-292)
    if prediction_type == PredictionType.MULTISTREAM_HYBRID:
        loss_mgc0_inter = jnp.asarray(0.0)
    else:
        pred_mgc0_diff = pred_mgc_main[..., :1] - pred_mgc_sub[..., :1]
        mgc0_diff = streams_main[0][..., :1] - streams_sub[0][..., :1]
        if criterion in ("l2", "mse"):
            err0 = (pred_mgc0_diff - mgc0_diff) ** 2
        else:
            err0 = jnp.abs(pred_mgc0_diff - mgc0_diff)
        loss_mgc0_inter = L.masked_mean(err0, mask)

    return loss_feats, loss_lf0_inter, loss_mgc0_inter


def create_multitrack_acoustic_train_step(
    module,
    optimizer,
    model_config: Dict,
    clip_norm: float = 1.0,
    feats_criterion: str = "mse",
    pitch_reg_weight: float = 1.0,
    sub_require_grad: bool = True,
    use_amp: bool = False,
    donate: bool = True,
):
    """Jitted train/eval step for the multitrack acoustic model.

    Interaction weights are traced scalars (so the exponential schedule
    does not retrigger compilation every epoch).  ``use_amp`` runs the
    forward/backward in bfloat16 with f32 master params and f32 losses
    (see train/loop.py amp_cast).
    """
    stream_sizes = list(model_config.get("stream_sizes", [60, 1, 1, 5]))
    prediction_type = module.prediction_type()

    def loss_fn(params, batch_stats, batch, weights, rng, train: bool):
        in0, in1 = batch["in_feats0"], batch["in_feats1"]
        out0, out1 = batch["out_feats0"], batch["out_feats1"]
        lengths = batch["lengths"]
        T = in0.shape[1]
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)[
            :, :, None
        ]
        spks = (batch["spks0"], batch["spks1"])

        # AMP: bf16 model inputs/params; f32 loss targets (out0/out1 stay)
        if use_amp:
            params_m = amp_cast(params)
            batch_stats_m = amp_cast(batch_stats)
            in0_m, in1_m = amp_cast(in0), amp_cast(in1)
            out0_m, out1_m = amp_cast(out0), amp_cast(out1)
        else:
            params_m, batch_stats_m = params, batch_stats
            in0_m, in1_m, out0_m, out1_m = in0, in1, out0, out1
        variables = {"params": params_m}
        if batch_stats_m:
            variables["batch_stats"] = batch_stats_m

        rngs = None
        if train:
            r1, r2, r3 = jax.random.split(rng, 3)
            rngs = {"dropout": r1, "prenet": r2, "zoneout": r3}
        else:
            rngs = {"prenet": jax.random.PRNGKey(0)}
        mutable = ["batch_stats"] if (train and batch_stats_m) else False
        outs = module.apply(
            variables,
            in0_m,
            in1_m,
            spks,
            lengths,
            (out0_m, out1_m),
            train=train,
            rngs=rngs,
            mutable=mutable,
        )
        if mutable:
            outs, updates = outs
            new_batch_stats = amp_uncast(updates.get("batch_stats", batch_stats))
        else:
            new_batch_stats = batch_stats
        if use_amp:
            outs = amp_uncast(outs)

        (pred_main, lf0_res_main), (pred_sub, lf0_res_sub) = outs

        loss_feats, loss_lf0_inter, loss_mgc0_inter = multitrack_acoustic_loss(
            pred_main,
            pred_sub,
            out0,
            out1,
            mask,
            stream_sizes,
            criterion=feats_criterion,
            sub_require_grad=sub_require_grad,
            prediction_type=prediction_type,
        )

        dyn_ws = batch.get("pitch_reg_dyn_ws", 1.0)
        loss_pitch = (
            L.pitch_regularization_loss(lf0_res_main, mask, dyn_ws)
            if pitch_reg_weight > 0
            else jnp.asarray(0.0)
        )

        loss = (
            loss_feats
            + pitch_reg_weight * loss_pitch
            + weights["logf0_diff"] * loss_lf0_inter
            + weights["mgc_diff"] * loss_mgc0_inter
        )
        aux = {
            "loss_feats": loss_feats,
            "loss_pitch": loss_pitch,
            "loss_lf0_inter": loss_lf0_inter,
            "loss_mgc0_inter": loss_mgc0_inter,
            "batch_stats": new_batch_stats,
            "pred_main": pred_main,
        }
        return loss, aux

    def train_step(state, batch, weights, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], state["batch_stats"], batch, weights, rng, True
        )
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        clip = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
        updates, new_opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        new_params = optax.apply_updates(state["params"], updates)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_params, state["params"]
        )
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            new_opt_state,
            state["opt_state"],
        )
        new_state = {
            "params": new_params,
            "batch_stats": aux["batch_stats"],
            "opt_state": new_opt_state,
            "step": state["step"] + 1,
        }
        metrics = {
            "Loss": loss,
            "Loss_Feats": aux["loss_feats"],
            "Loss_Pitch": aux["loss_pitch"],
            "Loss_LogF0_Interaction": aux["loss_lf0_inter"],
            "Loss_MGC-0th_Interaction": aux["loss_mgc0_inter"],
            "GradNorm": gnorm,
        }
        return new_state, metrics

    def eval_step(state, batch, weights):
        loss, aux = loss_fn(
            state["params"],
            state["batch_stats"],
            batch,
            weights,
            jax.random.PRNGKey(0),
            False,
        )
        return (
            {
                "Loss": loss,
                "Loss_Feats": aux["loss_feats"],
                "Loss_Pitch": aux["loss_pitch"],
                "Loss_LogF0_Interaction": aux["loss_lf0_inter"],
                "Loss_MGC-0th_Interaction": aux["loss_mgc0_inter"],
            },
            aux["pred_main"],
        )

    # state donated: buffers reused in place (see train/loop.py);
    # donate=False exists for the training benchmark's donation A/B
    return (
        jax.jit(train_step, donate_argnums=(0,) if donate else ()),
        jax.jit(eval_step),
    )


def create_multitrack_timing_train_step(
    module,
    optimizer,
    clip_norm: float = 1.0,
    use_amp: bool = False,
):
    """Jitted train/eval step for multitrack timelag/duration models.

    Input = concat(x0, x1) over the note-merged timeline; target = the main
    track's values at positions where the main track is present
    (reference bin/train_multitrack.py semantics).
    """
    prediction_type = module.prediction_type()

    def loss_fn(params, batch, rng, train: bool):
        x = jnp.concatenate([batch["in_feats0"], batch["in_feats1"]], axis=-1)
        spks = (batch["spks0"], batch["spks1"])
        lengths = batch["lengths"]
        T = x.shape[1]
        valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
        mask = (valid * batch["mask0"].astype(jnp.float32))[:, :, None]

        params_m = amp_cast(params) if use_amp else params
        if use_amp:
            x = amp_cast(x)
        rngs = {"dropout": rng} if train else None
        pred = module.apply(
            {"params": params_m}, x, spks, lengths, train=train, rngs=rngs
        )
        if use_amp:
            pred = amp_uncast(pred)
        if prediction_type == PredictionType.PROBABILISTIC:
            loss = L.mdn_stream_loss(pred, batch["out_feats0"], mask)
        else:
            loss = L.feats_criterion(pred, batch["out_feats0"], mask, "mse")
        return loss

    def train_step(state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state["params"], batch, rng, True
        )
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        clip = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
        updates, new_opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        new_params = optax.apply_updates(state["params"], updates)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_params, state["params"]
        )
        new_state = {
            "params": new_params,
            "batch_stats": state["batch_stats"],
            "opt_state": new_opt_state,
            "step": state["step"] + 1,
        }
        return new_state, {"Loss": loss, "GradNorm": gnorm}

    def eval_step(state, batch):
        loss = loss_fn(state["params"], batch, jax.random.PRNGKey(0), False)
        return {"Loss": loss}

    # state donated: buffers reused in place (see train/loop.py)
    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)
