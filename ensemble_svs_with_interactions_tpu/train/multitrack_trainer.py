"""Multi-track training orchestration (timing + acoustic).

Mirrors the reference's bin/train_multitrack.py and
bin/train_acoustic_multitrack.py train loops on top of the multitrack
datasets and jitted steps.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.data.multitrack import (
    MultiTrackBatchIterator,
    MultiTrackFeatsDataset,
)
from ensemble_svs_with_interactions_tpu.data.dataset import prefetch_batches
from ensemble_svs_with_interactions_tpu.parallel import make_mesh, shard_batch
from ensemble_svs_with_interactions_tpu.train import metrics as M
from ensemble_svs_with_interactions_tpu.train.loop import (
    MetricsWriter,
    build_optimizer,
    load_params_shape_filtered,
    save_checkpoint,
    TrainState,
    write_dev_metrics,
)
from ensemble_svs_with_interactions_tpu.train.multitrack import (
    _stream_to_point,
    create_multitrack_acoustic_train_step,
    create_multitrack_timing_train_step,
    interaction_weight,
)
from ensemble_svs_with_interactions_tpu.train.losses import (
    compute_pitch_regularization_weight,
)
from ensemble_svs_with_interactions_tpu.train.trainer import load_out_scaler
from ensemble_svs_with_interactions_tpu.utils.config import Config, instantiate
from ensemble_svs_with_interactions_tpu.utils.logger import getLogger
from ensemble_svs_with_interactions_tpu.utils.misc import init_seed


def _init_multitrack_variables(module, config, acoustic: bool, seed: int = 0):
    in_dim = config.model.netG.get("in_dim", 86)
    out_dim = config.model.netG.get("out_dim", 67)
    B, T = 2, 16
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "dropout": jax.random.PRNGKey(seed + 1),
        "prenet": jax.random.PRNGKey(seed + 2),
        "zoneout": jax.random.PRNGKey(seed + 3),
    }
    lengths = jnp.asarray([T, T])
    spks = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
    if acoustic:
        x0 = jnp.zeros((B, T, in_dim))
        x1 = jnp.zeros((B, T, in_dim))
        ys = (jnp.zeros((B, T, out_dim)), jnp.zeros((B, T, out_dim)))
        return module.init(rngs, x0, x1, spks, lengths, ys, train=True)
    # timing models consume concat(x0, x1) -> 2*in_dim features
    # (reference model.py:1246-1247)
    x = jnp.zeros((B, T, 2 * in_dim))
    return module.init(rngs, x, spks, lengths, train=True)


def train_multitrack_model(config: Config, is_acoustic: bool) -> Dict[str, float]:
    logger = getLogger(verbose=config.get("verbose", 1), name="train_mt")
    init_seed(int(config.get("seed", 1234)))
    # multi-host: join the cluster before touching jax.devices()
    # (reference NCCL init at bin/train_acoustic_multitrack.py:639-643)
    dist_cfg = dict(config.get("distributed", None) or {})
    from ensemble_svs_with_interactions_tpu.parallel.mesh import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed(
        dist_cfg.get("coordinator"),
        dist_cfg.get("num_processes"),
        dist_cfg.get("process_id"),
    )
    if config.train.get("use_detect_anomaly", False):
        from ensemble_svs_with_interactions_tpu.utils.profiling import (
            enable_detect_anomaly,
        )

        enable_detect_anomaly()
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))

    module = instantiate(config.model.netG)
    variables = _init_multitrack_variables(module, config, is_acoustic)

    resume_path = config.get_path("train.resume.checkpoint")
    if resume_path:
        variables, copied = load_params_shape_filtered(resume_path, variables)
        logger.info("warm-started %d tensors from %s", copied, resume_path)

    spk_names = list(config.data.get("spk_names", []) or [])
    datasets = {}
    for split in ("train_no_dev", "dev"):
        d = config.data[split]
        datasets[split] = MultiTrackFeatsDataset(
            d["in_dir"],
            d["out_dir"],
            spk_names,
            max_frames=int(config.data.get("filter_num_frames", 6000)),
            load_times=not is_acoustic,
        )
        logger.info("%s: %d track pairs", split, len(datasets[split]))

    # epoch-quantized torch schedulers tick per EPOCH in the reference;
    # scale optax transition counts by the planned batches per epoch
    steps_per_epoch = max(
        len(
            MultiTrackBatchIterator(
                datasets["train_no_dev"],
                sync="frames" if is_acoustic else "notes",
                max_tokens=int(config.data.get("batch_max_frames", 32000)),
                shuffle=False,
                seed=0,
            )
        ),
        1,
    )
    optimizer = build_optimizer(
        dict(config.train.optim.optimizer),
        dict(config.train.optim.get("lr_scheduler", {}) or {}),
        steps_per_epoch=steps_per_epoch,
        accum_steps=int(config.train.optim.get("accum_steps", 1)),
    )
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": optimizer.init(variables["params"]),
        "step": jnp.asarray(0),
    }

    clip_norm = float(config.train.optim.get("clip_norm", 1.0))
    if is_acoustic:
        train_step, eval_step = create_multitrack_acoustic_train_step(
            module,
            optimizer,
            dict(config.model),
            clip_norm=clip_norm,
            feats_criterion=config.train.get("feats_criterion", "mse"),
            pitch_reg_weight=float(config.train.get("pitch_reg_weight", 1.0)),
            sub_require_grad=bool(config.train.get("sub_require_grad", True)),
            use_amp=bool(config.train.get("use_amp", False)),
        )
    else:
        train_step, eval_step = create_multitrack_timing_train_step(
            module, optimizer, clip_norm=clip_norm,
            use_amp=bool(config.train.get("use_amp", False)),
        )

    out_scaler = None
    prefix = config.data.get("out_scaler_prefix")
    if prefix and is_acoustic:
        out_scaler = load_out_scaler(prefix)

    out_dir = Path(config.train.out_dir)
    writer = MetricsWriter(
        out_dir,
        use_tensorboard=config.train.get("use_tensorboard", False),
        use_mlflow=config.train.get("use_mlflow", False),
        mlflow_experiment=str(config.get("mlflow", {}).get("experiment", "default") if config.get("mlflow", None) else "default"),
        mlflow_run_name=(config.get("mlflow", {}) or {}).get("run_name", None) if config.get("mlflow", None) else None,
        mlflow_params=dict(config.model) if config.train.get("use_mlflow", False) else None,
    )
    nepochs = int(config.train.get("nepochs", 10))
    best_dev = float("inf")
    best_epoch = 0
    best_metrics: Dict[str, float] = {}
    rng = jax.random.PRNGKey(int(config.get("seed", 1234)))
    last_metrics: Dict[str, float] = {}

    # pitch-regularization dynamic weights for the MAIN track (the
    # reference intends compute_batch_pitch_regularization_weight over
    # the main track's denormalized score lf0, train_acoustic_multitrack
    # .py:502-512; note its loss body then reads an unassigned
    # `pitch_reg_dyn_ws` name — we implement the intended semantics)
    in_lf0_idx = int(config.data.get("in_lf0_idx", -1))
    in_lf0_min = float(config.data.get("in_lf0_min", 0.0))
    in_lf0_max = float(config.data.get("in_lf0_max", 1.0))
    in_rest_idx = int(config.data.get("in_rest_idx", 0))
    decay_size = int(config.train.get("pitch_reg_decay_size", 25))
    pitch_reg_weight = float(config.train.get("pitch_reg_weight", 1.0))

    reduction = int(config.model.netG.get("reduction_factor", 1)) if is_acoustic else 1
    time_multiple = max(int(config.data.get("time_multiple", 32)), reduction)
    # time padding must stay divisible by the AR reduction factor
    while time_multiple % reduction != 0:
        time_multiple += 1

    # fixed-length random crops (reference collate_fn_random_segments,
    # train_util.py:595-633) — the measured 2x training-throughput lever
    # for the AR flagship: at constant frames-per-step, shorter sequences
    # mean fewer sequential scan iterations and fatter per-iteration
    # matmuls on the MXU (docs/performance.md "Training throughput").
    # The iterator crops ONE window across both tracks (interaction
    # losses stay frame-aligned) and sizes batches by the capped length.
    use_random_segments = bool(config.data.get("use_random_segments", False))
    segment_length = int(config.data.get("segment_length", 256))
    # keep the static crop shape divisible by the AR reduction/pad multiple
    segment_length = -(-segment_length // time_multiple) * time_multiple

    for epoch in range(1, nepochs + 1):
        weights = {
            "logf0_diff": jnp.asarray(
                interaction_weight(
                    config.train.get("logf0_diff_weight", 1.0), epoch, nepochs
                )
            ),
            "mgc_diff": jnp.asarray(
                interaction_weight(
                    config.train.get("mgc_diff_weight", 1.0), epoch, nepochs
                )
            ),
        }
        for split in ("train_no_dev", "dev"):
            train = split == "train_no_dev"
            it = MultiTrackBatchIterator(
                datasets[split],
                sync="frames" if is_acoustic else "notes",
                max_tokens=int(config.data.get("batch_max_frames", 32000)),
                time_multiple=time_multiple,
                batch_multiple=n_dev,
                shuffle=train,
                seed=epoch,
                length_cap=(
                    segment_length
                    if (train and is_acoustic and use_random_segments)
                    else None
                ),
            )
            epoch_metrics: Dict[str, list] = {}
            rendered_this_epoch = False

            def _host_pipeline(it=it, train=train):
                # batch construction + transforms + the async H2D enqueue,
                # run on the prefetch thread so they overlap step dispatch
                for batch in it:
                    if is_acoustic and pitch_reg_weight > 0 and in_lf0_idx >= 0:
                        lf0_denorm = (
                            batch["in_feats0"][:, :, in_lf0_idx]
                            * (in_lf0_max - in_lf0_min)
                            + in_lf0_min
                        )
                        T = batch["in_feats0"].shape[1]
                        valid = (
                            np.arange(T)[None, :] < batch["lengths"][:, None]
                        )
                        if in_rest_idx >= 0:
                            valid = valid & (
                                batch["in_feats0"][:, :, in_rest_idx] <= 0
                            )
                        batch["pitch_reg_dyn_ws"] = (
                            compute_pitch_regularization_weight(
                                np.where(valid, lf0_denorm, 0.0), decay_size
                            )
                        )
                    yield batch, shard_batch(batch, mesh)

            for batch, sharded in prefetch_batches(_host_pipeline()):
                if train:
                    rng, step_rng = jax.random.split(rng)
                    if is_acoustic:
                        state, metrics = train_step(state, sharded, weights, step_rng)
                    else:
                        state, metrics = train_step(state, sharded, step_rng)
                else:
                    if is_acoustic:
                        metrics, pred_main = eval_step(state, sharded, weights)
                        if isinstance(pred_main, (tuple, list)):
                            # per-stream predictions (MDN streams -> mu)
                            pred_main = jnp.concatenate(
                                [_stream_to_point(p) for p in pred_main], axis=-1
                            )
                        if out_scaler is not None and pred_main.shape[-1] == sum(
                            config.model.stream_sizes
                        ):
                            dist = M.compute_distortions(
                                pred_main,
                                batch["out_feats0"],
                                batch["lengths"],
                                out_scaler,
                                list(config.model.stream_sizes),
                                list(config.model.has_dynamic_features),
                                int(config.model.num_windows),
                            )
                            metrics = {**metrics, **dist}
                            # first dev batch only (later batches would
                            # overwrite the same files and TB tags)
                            if not rendered_this_epoch and config.train.get(
                                "eval_render", False
                            ):
                                rendered_this_epoch = True
                                from ensemble_svs_with_interactions_tpu.train.eval_render import (  # noqa: E501
                                    render_eval_outputs,
                                )

                                render_eval_outputs(
                                    out_dir,
                                    epoch,
                                    np.asarray(pred_main),
                                    batch["out_feats0"],
                                    batch["lengths"],
                                    out_scaler,
                                    list(config.model.stream_sizes),
                                    list(config.model.has_dynamic_features),
                                    int(config.model.num_windows),
                                    int(config.data.get("sample_rate", 48000)),
                                    writer=writer,
                                )
                    else:
                        metrics = eval_step(state, sharded)
                for k, v in metrics.items():
                    # un-fetched device scalars: float() here would BLOCK
                    # the host every step and stop dispatch running ahead
                    # of the device; one batched device_get at epoch end
                    epoch_metrics.setdefault(k, []).append(v)
            means = {
                k: float(np.mean(jax.device_get(v)))
                for k, v in epoch_metrics.items()
            }
            writer.log(epoch, means, prefix=f"{split}/")
            logger.info(
                "epoch %d [%s] %s", epoch, split,
                {k: round(v, 4) for k, v in means.items()},
            )
            if not train:
                dev_loss = means.get("Loss", float("inf"))
                is_best = dev_loss < best_dev
                best_dev = min(best_dev, dev_loss)
                if is_best:
                    best_epoch, best_metrics = epoch, means
                save_checkpoint(
                    out_dir,
                    TrainState(
                        state["params"],
                        state["batch_stats"],
                        state["opt_state"],
                        int(state["step"]),
                    ),
                    epoch,
                    is_best=is_best,
                    save_interval=int(config.train.get("checkpoint_interval", 0)),
                )
                last_metrics = means
    writer.close()
    write_dev_metrics(out_dir, best_epoch, best_metrics, last_metrics)
    return last_metrics
