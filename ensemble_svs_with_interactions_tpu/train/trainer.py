"""High-level training orchestration used by the CLI apps.

The functional analogue of the reference's setup() + train_loop()
(nnsvs/train_util.py:1387-1518, nnsvs/bin/train.py:150-320,
train_acoustic.py:278-480): builds the model/optimizer from YAML, iterates
length-bucketed batches with the jitted DP train step, evaluates with
objective distortions, and keeps best/latest checkpoints.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.data.dataset import (
    BucketedBatchIterator,
    FeatsDataset,
    prefetch_batches,
)
from ensemble_svs_with_interactions_tpu.parallel import make_mesh, shard_batch
from ensemble_svs_with_interactions_tpu.train import losses as L
from ensemble_svs_with_interactions_tpu.train import metrics as M
from ensemble_svs_with_interactions_tpu.train.loop import (
    MetricsWriter,
    build_optimizer,
    create_train_step,
    load_params_shape_filtered,
    save_checkpoint,
    TrainState,
    write_dev_metrics,
)
from ensemble_svs_with_interactions_tpu.train.losses import (
    compute_pitch_regularization_weight,
)
from ensemble_svs_with_interactions_tpu.utils.config import Config, instantiate
from ensemble_svs_with_interactions_tpu.utils.logger import getLogger
from ensemble_svs_with_interactions_tpu.utils.misc import init_seed
from ensemble_svs_with_interactions_tpu.utils.scalers import StandardScaler


def _init_variables(module, config: Config, rng_seed: int = 0):
    in_dim = config.model.netG.get("in_dim", 82)
    out_dim = config.model.netG.get("out_dim", None)
    x = jnp.zeros((2, 16, in_dim), jnp.float32)
    lengths = jnp.asarray([16, 16])
    args = [x]
    import inspect

    sig_params = list(inspect.signature(module.__call__).parameters)
    if "spks" in sig_params:
        args.append(jnp.zeros((2,), jnp.int32))
    args.append(lengths)
    # diffusion models noise the TARGET inside __call__, so init needs a y
    if out_dim is not None:
        args.append(jnp.zeros((2, 16, int(out_dim)), jnp.float32))
    return module.init(
        {
            "params": jax.random.PRNGKey(rng_seed),
            "dropout": jax.random.PRNGKey(rng_seed + 1),
            "prenet": jax.random.PRNGKey(rng_seed + 2),
            "zoneout": jax.random.PRNGKey(rng_seed + 3),
            "diffusion": jax.random.PRNGKey(rng_seed + 4),
        },
        *args,
        train=True,
    )


def load_out_scaler(path_prefix) -> StandardScaler:
    return StandardScaler(
        np.load(f"{path_prefix}_mean.npy"),
        np.load(f"{path_prefix}_var.npy"),
        np.load(f"{path_prefix}_scale.npy"),
    )


def train_model(config: Config, is_acoustic: bool = False) -> Dict[str, float]:
    """Train a single-track model from a config tree.

    Expected config keys (mirroring the reference's hydra trees):
      data.train_no_dev.{in_dir,out_dir}, data.dev.{in_dir,out_dir},
      data.batch_max_frames, data.filter_num_frames,
      model.netG (with _target_), model.stream_sizes etc.,
      train.optim.{optimizer,lr_scheduler}, train.nepochs, train.out_dir,
      train.pitch_reg_weight (acoustic), train.feats_criterion.
    """
    logger = getLogger(verbose=config.get("verbose", 1), name="train")
    init_seed(int(config.get("seed", 1234)))
    # multi-host: join the cluster before touching jax.devices()
    # (config distributed.coordinator=host:port [num_processes, process_id])
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
    n_dev = int(np.prod([s for s in mesh.devices.shape]))
    logger.info("devices: %d (%s)", n_dev, mesh)

    module = instantiate(config.model.netG)
    variables = _init_variables(module, config)

    out_dir = Path(config.train.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # warm-start / resume
    resume_path = config.get_path("train.resume.checkpoint")
    if resume_path:
        variables, copied = load_params_shape_filtered(resume_path, variables)
        logger.info("warm-started %d tensors from %s", copied, resume_path)

    max_frames = int(config.data.get("filter_num_frames", 6000))
    batch_max_frames = int(config.data.get("batch_max_frames", 32000))
    spk_names = list(config.data.get("spk_names", []) or [])
    datasets = {}
    for split in ("train_no_dev", "dev"):
        d = config.data[split]
        if spk_names:
            # multi-speaker training (reference bin/train_acoustic_multi.py):
            # speaker ids from filename prefixes feed the model's spks input
            from ensemble_svs_with_interactions_tpu.data.dataset import (
                MultiSpeakerFeatsDataset,
            )

            datasets[split] = MultiSpeakerFeatsDataset(
                d["in_dir"], d["out_dir"], spk_names, max_frames=max_frames
            )
        else:
            datasets[split] = FeatsDataset(
                d["in_dir"], d["out_dir"], max_frames=max_frames
            )
        logger.info("%s: %d utterances", split, len(datasets[split]))

    # epoch-quantized torch schedulers (StepLR etc.) tick once per EPOCH in
    # the reference; optax schedules tick per optimizer step, so scale the
    # transition counts by the planned batches per epoch (the batch plan is
    # computed from lengths only — no data is loaded here)
    steps_per_epoch = max(
        len(
            BucketedBatchIterator(
                datasets["train_no_dev"],
                max_tokens=batch_max_frames,
                time_multiple=int(config.data.get("time_multiple", 32)),
                batch_multiple=n_dev,
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
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": optimizer.init(params),
        "step": jnp.asarray(0),
    }

    pitch_reg_weight = float(config.train.get("pitch_reg_weight", 1.0)) if is_acoustic else 0.0
    train_step, eval_step = create_train_step(
        module,
        optimizer,
        dict(config.model),
        clip_norm=float(config.train.optim.get("clip_norm", 1.0)),
        feats_criterion=config.train.get("feats_criterion", "mse"),
        pitch_reg_weight=pitch_reg_weight,
        stream_wise_loss=bool(config.train.get("stream_wise_loss", False)),
        stream_weights=config.train.get("stream_weights"),
        use_amp=bool(config.train.get("use_amp", False)),
    )

    out_scaler = None
    scaler_prefix = config.data.get("out_scaler_prefix")
    if scaler_prefix:
        out_scaler = load_out_scaler(scaler_prefix)

    # pitch-regularization dynamic weights need denormalized score lf0
    in_lf0_idx = int(config.data.get("in_lf0_idx", -1))
    in_lf0_min = float(config.data.get("in_lf0_min", 0.0))
    in_lf0_max = float(config.data.get("in_lf0_max", 1.0))
    in_rest_idx = int(config.data.get("in_rest_idx", 0))
    decay_size = int(config.train.get("pitch_reg_decay_size", 25))

    # fixed-length random crops for AR acoustic models (reference
    # collate_fn_random_segments, train_util.py:595-633): the iterator
    # crops item-wise AND sizes batches by the capped length, so
    # segment_length=256 yields the fat-batch geometry the MXU wants
    # (docs/performance.md "Training throughput") with one static shape.
    use_random_segments = bool(config.data.get("use_random_segments", False))
    segment_length = int(config.data.get("segment_length", 256))
    _tm = int(config.data.get("time_multiple", 32))
    segment_length = -(-segment_length // _tm) * _tm

    writer = MetricsWriter(
        out_dir,
        use_tensorboard=config.train.get("use_tensorboard", False),
        use_mlflow=config.train.get("use_mlflow", False),
        mlflow_experiment=str(config.get("mlflow", {}).get("experiment", "default") if config.get("mlflow", None) else "default"),
        mlflow_run_name=(config.get("mlflow", {}) or {}).get("run_name", None) if config.get("mlflow", None) else None,
        mlflow_params=dict(config.model) if config.train.get("use_mlflow", False) else None,
    )
    nepochs = int(config.train.get("nepochs", 10))
    best_dev_loss = float("inf")
    best_epoch = 0
    best_metrics: Dict[str, float] = {}
    rng = jax.random.PRNGKey(int(config.get("seed", 1234)))
    step = 0
    last_metrics: Dict[str, float] = {}

    for epoch in range(1, nepochs + 1):
        for split in ("train_no_dev", "dev"):
            train = split == "train_no_dev"
            it = BucketedBatchIterator(
                datasets[split],
                max_tokens=batch_max_frames,
                time_multiple=int(config.data.get("time_multiple", 32)),
                batch_multiple=n_dev,
                shuffle=train,
                seed=epoch,
                length_cap=(
                    segment_length if (train and use_random_segments) else None
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
                            batch["in_feats"][:, :, in_lf0_idx]
                            * (in_lf0_max - in_lf0_min)
                            + in_lf0_min
                        )
                        # zero at padded AND rest frames so note
                        # segmentation works (reference
                        # train_acoustic.py:354-356 multiplies by the rest
                        # flag — score lf0 is interpolated over rests, so
                        # they would otherwise count as note frames)
                        T = batch["in_feats"].shape[1]
                        valid = (
                            np.arange(T)[None, :] < batch["lengths"][:, None]
                        )
                        if in_rest_idx >= 0:
                            valid = valid & (
                                batch["in_feats"][:, :, in_rest_idx] <= 0
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
                    state, metrics = train_step(state, sharded, step_rng)
                    step += 1
                else:
                    metrics, pred_out = eval_step(state, sharded)
                    # reduce probabilistic/multistream predictions to a
                    # point estimate (MDN mu) so objective distortions are
                    # computed for every model family like the reference
                    # (nnsvs/bin/train.py:121-126); diffusion returns
                    # (noise, x_recon) in noised space — skip those
                    from ensemble_svs_with_interactions_tpu.base import (
                        PredictionType,
                    )
                    from ensemble_svs_with_interactions_tpu.train.multitrack import (
                        _stream_to_point,
                    )

                    ptype = module.prediction_type()
                    if L.is_refinement_list(
                        pred_out, list(config.model.stream_sizes)
                    ):
                        # Post-Net wrappers: [coarse, fine] concatenated
                        # outputs — score the refined stage
                        pred_out = pred_out[-1]
                    pred_point = pred_out
                    if ptype == PredictionType.DIFFUSION:
                        pred_point = None
                    elif isinstance(pred_out, (tuple, list)):
                        if ptype == PredictionType.MULTISTREAM_HYBRID:
                            pred_point = jnp.concatenate(
                                [_stream_to_point(p) for p in pred_out],
                                axis=-1,
                            )
                        else:
                            pred_point = _stream_to_point(tuple(pred_out))
                    out_dim_total = sum(config.model.stream_sizes)
                    if (
                        is_acoustic
                        and out_scaler is not None
                        and pred_point is not None
                        and pred_point.shape[-1] == out_dim_total
                    ):
                        # distortions assume (mgc, lf0, vuv, bap) stream
                        # semantics — acoustic models only (the reference
                        # computes ObjEval_* only in its acoustic eval,
                        # train_util.py:1821); timelag/duration streams
                        # would yield meaningless MCD/inf-F0 numbers
                        pred_out = pred_point
                        dist = M.compute_distortions(
                            pred_out,
                            batch["out_feats"],
                            batch["lengths"],
                            out_scaler,
                            list(config.model.stream_sizes),
                            list(config.model.has_dynamic_features),
                            int(config.model.num_windows),
                        )
                        metrics = {**metrics, **dist}
                        # first dev batch only: later batches would just
                        # overwrite the same utt0/utt1 files and TB tags
                        # (reference eval_model also renders one batch)
                        if (
                            is_acoustic
                            and not rendered_this_epoch
                            and config.train.get("eval_render", False)
                        ):
                            rendered_this_epoch = True
                            from ensemble_svs_with_interactions_tpu.train.eval_render import (
                                render_eval_outputs,
                            )

                            render_eval_outputs(
                                out_dir,
                                epoch,
                                np.asarray(pred_out),
                                batch["out_feats"],
                                batch["lengths"],
                                out_scaler,
                                list(config.model.stream_sizes),
                                list(config.model.has_dynamic_features),
                                int(config.model.num_windows),
                                int(config.data.get("sample_rate", 48000)),
                                writer=writer,
                            )
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
            logger.info("epoch %d [%s] %s", epoch, split,
                        {k: round(v, 4) for k, v in means.items()})
            if not train:
                dev_loss = means.get("Loss", float("inf"))
                is_best = dev_loss < best_dev_loss
                best_dev_loss = min(best_dev_loss, dev_loss)
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
