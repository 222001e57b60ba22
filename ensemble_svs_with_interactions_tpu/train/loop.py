"""Training loop: optimizer factory, jitted DP train step, checkpointing.

Parity targets: /root/reference/nnsvs/train_util.py:1387-1518 (setup),
:1290-1384 (save_checkpoint/_resume), nnsvs/bin/train.py and
train_acoustic.py train steps.  TPU design:

  * one jitted ``train_step`` per model covering forward, loss, grad,
    clipping and the NaN-skip (a ``jnp.where`` on the global grad-norm
    finiteness — no host round-trip);
  * data parallelism by sharding the batch over a 1-D ``data`` mesh; XLA
    inserts the gradient all-reduce over ICI;
  * checkpoints are flax-msgpack pytrees with best/latest/epoch%04d
    semantics and shape-filtered partial restore (warm starts from
    single-track checkpoints into multitrack models).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization
from flax import traverse_util

from ensemble_svs_with_interactions_tpu.base import BaseModel, PredictionType
from ensemble_svs_with_interactions_tpu.train import losses as L
from ensemble_svs_with_interactions_tpu.utils.logger import getLogger


# --------------------------------------------------------------------------
# Optimizers / schedulers from config (torch.optim-style names)
# --------------------------------------------------------------------------


def build_lr_schedule(
    optimizer_cfg: Dict,
    scheduler_cfg: Optional[Dict],
    steps_per_epoch: int = 1,
):
    """Torch-style scheduler config -> optax schedule (per optimizer step).

    The reference steps its torch schedulers once per EPOCH
    (train_util.py / bin/train.py); the epoch-quantized parameters
    (StepLR step_size, ExponentialLR gamma, cosine T_max) are therefore
    scaled by ``steps_per_epoch``.  Noam is inherently per-step.
    """
    base_lr = float(optimizer_cfg.get("params", {}).get("lr", 1e-3))
    if not scheduler_cfg or not scheduler_cfg.get("name"):
        return base_lr
    name = scheduler_cfg["name"].lower()
    p = scheduler_cfg.get("params", {})
    spe = max(int(steps_per_epoch), 1)
    if name == "steplr":
        return optax.exponential_decay(
            base_lr,
            transition_steps=int(p.get("step_size", 10)) * spe,
            decay_rate=float(p.get("gamma", 0.5)),
            staircase=True,
        )
    if name == "exponentiallr":
        return optax.exponential_decay(
            base_lr, transition_steps=spe, decay_rate=float(p.get("gamma", 0.99)),
            staircase=True,
        )
    if name in ("cosineannealinglr", "cosine"):
        return optax.cosine_decay_schedule(
            base_lr, decay_steps=int(p.get("T_max", 100000)) * spe
        )
    if name in ("noamlr", "noam"):
        warmup = int(p.get("warmup_steps", 4000))
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, warmup),
                lambda step: base_lr * (warmup**0.5) * ((step + warmup) ** -0.5),
            ],
            [warmup],
        )
    raise ValueError(f"unknown lr scheduler: {name}")


def build_optimizer(
    optimizer_cfg: Dict,
    scheduler_cfg: Optional[Dict] = None,
    steps_per_epoch: int = 1,
    accum_steps: int = 1,
):
    """Torch-style optimizer config -> optax transform.

    ``accum_steps > 1`` wraps the optimizer in :class:`optax.MultiSteps`
    (gradient accumulation): the train step is called per microbatch, but
    parameters update once every ``accum_steps`` calls with the averaged
    gradient — the TPU way to reach large effective batch sizes without
    the HBM for the full batch's activations.  No reference analogue (the
    reference scales batch size with GPUs via DDP instead).
    """
    name = optimizer_cfg.get("name", "Adam").lower()
    p = dict(optimizer_cfg.get("params", {}))
    lr = build_lr_schedule(optimizer_cfg, scheduler_cfg, steps_per_epoch)
    betas = tuple(p.get("betas", (0.9, 0.999)))
    weight_decay = float(p.get("weight_decay", 0.0))
    if name == "adam":
        if weight_decay > 0:
            opt = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
        else:
            opt = optax.adam(lr, b1=betas[0], b2=betas[1])
    elif name == "adamw":
        opt = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    elif name == "sgd":
        opt = optax.sgd(lr, momentum=float(p.get("momentum", 0.0)))
    elif name == "radam":
        opt = optax.radam(lr)
    else:
        raise ValueError(f"unknown optimizer: {name}")
    if int(accum_steps) > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=int(accum_steps))
    return opt


# --------------------------------------------------------------------------
# Train state + checkpointing
# --------------------------------------------------------------------------


@dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0

    def as_pytree(self):
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "step": jnp.asarray(self.step),
        }


def save_checkpoint(
    out_dir,
    state: TrainState,
    epoch: int,
    is_best: bool = False,
    postfix: str = "",
    save_interval: int = 0,
):
    """best_loss / latest / epoch%04d checkpoint files
    (reference train_util.py:1290-1335 semantics)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    blob = serialization.to_bytes(state.as_pytree())
    (out_dir / f"latest{postfix}.ckpt").write_bytes(blob)
    if is_best:
        (out_dir / f"best_loss{postfix}.ckpt").write_bytes(blob)
    if save_interval > 0 and epoch % save_interval == 0:
        (out_dir / f"epoch{epoch:04d}{postfix}.ckpt").write_bytes(blob)


def load_checkpoint(path, template: TrainState) -> TrainState:
    tree = serialization.from_bytes(
        template.as_pytree(), Path(path).read_bytes()
    )
    return TrainState(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        step=int(tree["step"]),
    )


def write_dev_metrics(out_dir, best_epoch, best_metrics, final_metrics):
    """Persist end-of-training dev metrics (incl. ObjEval_* distortions —
    MGC-MCD / BAP-MCD / VUV% / F0-RMSE, reference train_util.py:1821-1893)
    as ``dev_metrics.json`` next to the checkpoints.  Recipe stage 11
    aggregates these into the run's QUALITY.json so objective quality is a
    CI-checkable artifact, not just a log line."""
    import json

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "best_epoch": int(best_epoch),
        "best": {k: float(v) for k, v in (best_metrics or {}).items()},
        "final": {k: float(v) for k, v in (final_metrics or {}).items()},
    }
    (out_dir / "dev_metrics.json").write_text(json.dumps(payload, indent=1))


def load_params_shape_filtered(path, template_variables) -> Any:
    """Partial restore: copy only params whose path+shape match the template
    (reference _resume train_util.py:1360-1384 — enables warm-starting
    multitrack models from single-track checkpoints)."""
    raw = Path(path).read_bytes()
    loaded = serialization.msgpack_restore(raw)
    loaded_params = loaded.get("params", loaded)
    flat_t = traverse_util.flatten_dict(template_variables["params"])
    flat_l = traverse_util.flatten_dict(loaded_params)
    out = {}
    copied = 0
    for k, v in flat_t.items():
        if k in flat_l and np.asarray(flat_l[k]).shape == np.asarray(v).shape:
            out[k] = jnp.asarray(flat_l[k])
            copied += 1
        else:
            out[k] = v
    params = traverse_util.unflatten_dict(out)
    return {**template_variables, "params": params}, copied


# --------------------------------------------------------------------------
# Train step factory
# --------------------------------------------------------------------------


def amp_cast(tree, dtype=jnp.bfloat16):
    """Cast every float32 leaf of a pytree to ``dtype``.

    Mixed-precision forward cast (reference ``config.train.use_amp``,
    train_util.py:1428-1433 + torch.cuda.amp autocast in bin/train.py:86).
    TPU-idiomatic AMP: the forward/backward runs in bfloat16 (MXU-native,
    halves HBM traffic for activations and the LSTM scans), while the
    MASTER params, optimizer state and loss stay float32 — the cast sits
    inside ``loss_fn`` so ``jax.grad`` transposes it back to f32 gradients
    automatically.  bfloat16 keeps float32's exponent range, so the
    reference's GradScaler has no equivalent here (nothing to underflow).
    """

    def _c(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_c, tree)


def amp_uncast(tree):
    """Cast bfloat16 leaves back to float32 (model outputs before losses,
    batch-stat updates before they re-enter the f32 train state)."""

    def _c(x):
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16:
            return x.astype(jnp.float32)
        return x

    return jax.tree_util.tree_map(_c, tree)


def create_train_step(
    module,
    optimizer,
    model_config: Dict,
    clip_norm: float = 1.0,
    feats_criterion: str = "mse",
    pitch_reg_weight: float = 1.0,
    stream_wise_loss: bool = False,
    stream_weights=None,
    axis: Optional[str] = None,
    use_amp: bool = False,
    donate: bool = True,
):
    """Build a jitted train/eval step for a single-track model.

    The returned step takes (state, batch, rng, train) where batch contains
    in_feats (B,T,Din), out_feats (B,T,Dout), lengths (B,), optional spks
    and pitch_reg_dyn_ws (B,T,1); ``train`` is a static python bool.
    ``use_amp`` runs the forward/backward in bfloat16 (see :func:`amp_cast`).
    """
    prediction_type = module.prediction_type()
    has_res_lf0 = module.has_residual_lf0_prediction()
    stream_sizes = list(model_config.get("stream_sizes", []))
    # shallow-AR models train against analysis-filtered targets
    # (reference bin/train.py:81-83 model.preprocess_target)
    has_target_filter = (
        type(module).preprocess_target is not BaseModel.preprocess_target
    )

    def loss_fn(params, batch_stats, batch, rng, train: bool):
        in_feats = batch["in_feats"]
        out_feats = batch["out_feats"]
        lengths = batch["lengths"]
        T = in_feats.shape[1]
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)[
            :, :, None
        ]

        # AMP: the model (params, stats, float features) runs in bf16; the
        # loss below compares f32-uncast predictions against f32 targets
        if use_amp:
            params_m = amp_cast(params)
            batch_stats_m = amp_cast(batch_stats)
            in_feats = amp_cast(in_feats)
            out_feats_m = amp_cast(out_feats)
        else:
            params_m, batch_stats_m, out_feats_m = params, batch_stats, out_feats
        variables = {"params": params_m}
        if batch_stats_m:
            variables["batch_stats"] = batch_stats_m

        if has_target_filter:
            # filter BEFORE the forward pass: teacher forcing and the loss
            # both see the filtered target, as in the reference
            out_feats_m = module.apply(
                {"params": params_m}, out_feats_m, method="preprocess_target"
            )
            out_feats = amp_uncast(out_feats_m)

        kwargs = dict(train=train)
        args = [in_feats]
        if "spks" in batch:
            args.append(batch["spks"])
        args.append(lengths)

        mutable = ["batch_stats"] if (train and batch_stats_m) else False
        # AR decoders draw from "prenet" (active even at eval — prenet
        # dropout stays on at inference) and "zoneout"; thread all streams
        # like the multitrack step (train/multitrack.py)
        if train:
            r1, r2, r3, r4 = jax.random.split(rng, 4)
            rngs = {"dropout": r1, "prenet": r2, "zoneout": r3, "diffusion": r4}
        else:
            rngs = {
                "prenet": jax.random.PRNGKey(0),
                "diffusion": jax.random.PRNGKey(0),
            }
        outs = module.apply(
            variables, *args, out_feats_m, rngs=rngs, mutable=mutable, **kwargs
        )
        if mutable:
            outs, updates = outs
            new_batch_stats = amp_uncast(updates.get("batch_stats", batch_stats))
        else:
            new_batch_stats = batch_stats
        if use_amp:
            outs = amp_uncast(outs)

        if has_res_lf0:
            pred_out, lf0_residual = outs
        else:
            pred_out, lf0_residual = outs, None

        if prediction_type == PredictionType.MULTISTREAM_HYBRID:
            # wrappers with all-deterministic sub-decoders return an
            # already-concatenated (B, T, D) array — split it back into
            # streams; Post-Net wrappers return a LIST of concatenated
            # refinement stages, each supervised (same as
            # train/multitrack.py)
            pred_streams = pred_out
            if L.is_refinement_list(pred_streams, list(stream_sizes)):
                # stage losses SUM (the reference accumulates per
                # prediction with no division, train_acoustic.py:148-170)
                loss_feats = sum(
                    L.multistream_loss(
                        L.split_streams(p, list(stream_sizes)),
                        out_feats,
                        mask,
                        stream_sizes,
                        criterion=feats_criterion,
                        stream_wise=stream_wise_loss,
                        stream_weights=stream_weights,
                    )
                    for p in pred_streams
                )
            else:
                if not isinstance(pred_streams, (list, tuple)):
                    pred_streams = L.split_streams(
                        pred_streams, list(stream_sizes)
                    )
                loss_feats = L.multistream_loss(
                    pred_streams,
                    out_feats,
                    mask,
                    stream_sizes,
                    criterion=feats_criterion,
                    stream_wise=stream_wise_loss,
                    stream_weights=stream_weights,
                )
        elif prediction_type == PredictionType.PROBABILISTIC:
            loss_feats = L.mdn_stream_loss(pred_out, out_feats, mask)
        elif prediction_type == PredictionType.DIFFUSION:
            # denoiser loss between the drawn noise and its reconstruction
            # (reference bin/train_acoustic.py:96-99)
            noise, x_recon = pred_out
            loss_feats = L.feats_criterion(
                x_recon, noise, mask, feats_criterion
            )
        else:
            # Post-Net decoders return [coarse, fine]: supervise every
            # refinement stage; stage losses SUM with no division
            # (reference train_acoustic.py:145-170)
            preds = pred_out if isinstance(pred_out, list) else [pred_out]
            loss_feats = sum(
                L.feats_criterion(p, out_feats, mask, feats_criterion)
                for p in preds
            )

        if pitch_reg_weight > 0 and lf0_residual is not None:
            dyn_ws = batch.get("pitch_reg_dyn_ws", 1.0)
            loss_pitch = L.pitch_regularization_loss(lf0_residual, mask, dyn_ws)
        else:
            loss_pitch = jnp.asarray(0.0)

        loss = loss_feats + pitch_reg_weight * loss_pitch
        aux = {
            "loss_feats": loss_feats,
            "loss_pitch": loss_pitch,
            "batch_stats": new_batch_stats,
            "pred_out": pred_out,
        }
        return loss, aux

    def train_step(state: Dict, batch: Dict, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], state["batch_stats"], batch, rng, True
        )
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        clip = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
        updates, new_opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        new_params = optax.apply_updates(state["params"], updates)
        # NaN-skip: keep old params/opt state when gradients are not finite
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
            "GradNorm": gnorm,
        }
        return new_state, metrics

    def eval_step(state: Dict, batch: Dict):
        loss, aux = loss_fn(
            state["params"], state["batch_stats"], batch, jax.random.PRNGKey(0), False
        )
        return (
            {
                "Loss": loss,
                "Loss_Feats": aux["loss_feats"],
                "Loss_Pitch": aux["loss_pitch"],
            },
            aux["pred_out"],
        )

    # Donate the state (params/opt-state buffers are reused in place —
    # halves peak HBM for the largest tensors; callers rebind
    # ``state, metrics = train_step(state, ...)`` immediately).
    donate_argnums = (0,) if donate else ()
    return (
        jax.jit(train_step, donate_argnums=donate_argnums),
        jax.jit(eval_step),
    )


# --------------------------------------------------------------------------
# Metrics writer
# --------------------------------------------------------------------------


class MetricsWriter:
    """JSONL metrics log + optional TensorBoard or MLflow backend.

    Mirrors the reference's mutually-exclusive TensorBoard/MLflow writers
    (nnsvs/train_util.py:1477-1489).  MLflow is optional in this
    environment: when the package is missing the writer degrades to
    JSONL-only with a warning (the JSONL stream is always on — it is the
    source of truth for sweeps and plot_metrics).
    """

    def __init__(
        self,
        out_dir,
        use_tensorboard: bool = True,
        use_mlflow: bool = False,
        mlflow_experiment: str = "default",
        mlflow_run_name: str = None,
        mlflow_params: Dict = None,
    ):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.out_dir / "metrics.jsonl", "a")
        self.tb = None
        self.mlflow = None
        if use_mlflow:
            try:
                import mlflow

                mlflow.set_tracking_uri(
                    f"file://{Path(self.out_dir).resolve()}/mlruns"
                )
                mlflow.set_experiment(mlflow_experiment)
                mlflow.start_run(run_name=mlflow_run_name)
                if mlflow_params:
                    mlflow.log_params(_flatten_params(mlflow_params))
                self.mlflow = mlflow
            except ImportError:
                import warnings

                warnings.warn(
                    "mlflow requested but not installed; metrics go to "
                    "JSONL (and TensorBoard if enabled) only"
                )
        if self.mlflow is None and use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.out_dir / "tensorboard"))
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        rec = {"step": step, **{f"{prefix}{k}": float(v) for k, v in metrics.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{prefix}{k}", float(v), step)
        if self.mlflow is not None:
            self.mlflow.log_metrics(
                {
                    f"{prefix}{k}".replace("/", "_"): float(v)
                    for k, v in metrics.items()
                },
                step=step,
            )

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
        if self.mlflow is not None:
            self.mlflow.end_run()


def _flatten_params(tree, prefix: str = "", out=None) -> Dict[str, str]:
    """Flatten a nested config into dotted MLflow param keys (reference
    train_util.py:73-88)."""
    out = {} if out is None else out
    from collections.abc import Mapping

    if isinstance(tree, Mapping):
        for k, v in tree.items():
            _flatten_params(v, f"{prefix}{k}.", out)
    else:
        out[prefix[:-1]] = str(tree)
    return out
