"""Learned-postfilter GAN training loop (reference nnsvs/bin/
train_postfilter.py + train_util.py:1521 setup_gan).

Data layout: ``in_dir`` holds model-predicted (degraded) static features,
``out_dir`` the ground-truth statics, paired by ``{utt}-feats.npy`` name
(produced by ``bin.generate`` / recipe stage 7-equivalents).  Trains a
Conv2dPostFilter (netG) against a Conv2dD (netD) with the LSGAN +
feature-matching + reconstruction objective.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import numpy as np

from ensemble_svs_with_interactions_tpu.data.dataset import (
    BucketedBatchIterator,
    FeatsDataset,
    prefetch_batches,
)
from ensemble_svs_with_interactions_tpu.parallel import make_mesh, shard_batch
from ensemble_svs_with_interactions_tpu.train.gan import create_gan_train_step
from ensemble_svs_with_interactions_tpu.train.loop import (
    MetricsWriter,
    build_optimizer,
    save_checkpoint,
    TrainState,
)
from ensemble_svs_with_interactions_tpu.utils.config import Config, instantiate
from ensemble_svs_with_interactions_tpu.utils.logger import getLogger
from ensemble_svs_with_interactions_tpu.utils.misc import init_seed


def train_postfilter(config: Config) -> Dict[str, float]:
    logger = getLogger(verbose=config.get("verbose", 1), name="train_pf")
    init_seed(int(config.get("seed", 1234)))

    # data-parallel mesh, like the non-GAN trainers (the reference wraps
    # both netG and netD in DDP via setup_gan, train_util.py:1521)
    dist_cfg = config.get("distributed", {}) or {}
    from ensemble_svs_with_interactions_tpu.parallel.mesh import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed(
        dist_cfg.get("coordinator"),
        dist_cfg.get("num_processes"),
        dist_cfg.get("process_id"),
    )
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    logger.info("devices: %d (%s)", n_dev, mesh)

    netG = instantiate(config.model.netG)
    netD = instantiate(config.model.netD)

    # init from the configured dim, or a real batch shape as fallback
    D = int(config.model.get("in_dim", 0))
    if not D:
        probe = FeatsDataset(
            config.data.train_no_dev.in_dir, config.data.train_no_dev.out_dir
        )
        D = probe[0][0].shape[-1]
    x = np.zeros((2, 32, D), np.float32)
    vG = netG.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x,
    )
    vD = netD.init(jax.random.PRNGKey(2), x)

    optG = build_optimizer(
        dict(config.train.optim.netG.optimizer),
        dict(config.train.optim.netG.get("lr_scheduler", {}) or {}),
    )
    optD = build_optimizer(
        dict(config.train.optim.netD.optimizer),
        dict(config.train.optim.netD.get("lr_scheduler", {}) or {}),
    )
    state = {
        "paramsG": vG["params"],
        "paramsD": vD["params"],
        "optG_state": optG.init(vG["params"]),
        "optD_state": optD.init(vD["params"]),
        "step": 0,
    }
    adv_streams = config.train.get("adv_streams", None)
    stream_sizes = list(config.model.get("stream_sizes", []) or [])
    if adv_streams is not None and len(adv_streams) != len(stream_sizes):
        raise ValueError("adv_streams must be specified for all streams")
    step_fn = create_gan_train_step(
        netG,
        netD,
        optG,
        optD,
        adv_weight=float(config.train.get("adv_weight", 1.0)),
        fm_weight=float(config.train.get("fm_weight", 2.0)),
        # the reference names the reconstruction weight mse_weight
        recon_weight=float(
            config.train.get(
                "mse_weight", config.train.get("recon_weight", 1.0)
            )
        ),
        clip_norm=float(config.train.optim.get("clip_norm", 1.0)),
        gan_type=str(config.train.get("gan_type", "lsgan")),
        stream_sizes=stream_sizes or None,
        adv_streams=list(adv_streams) if adv_streams is not None else None,
        mask_nth_mgc_for_adv_loss=int(
            config.train.get("mask_nth_mgc_for_adv_loss", 0)
        ),
        vuv_mask=bool(config.train.get("vuv_mask", False)),
        use_amp=bool(config.train.get("use_amp", False)),
    )

    datasets = {}
    for split in ("train_no_dev", "dev"):
        d = config.data[split]
        datasets[split] = FeatsDataset(
            d["in_dir"],
            d["out_dir"],
            max_frames=int(config.data.get("filter_num_frames", 6000)),
        )
        logger.info("%s: %d utterances", split, len(datasets[split]))

    out_dir = Path(config.train.out_dir)
    writer = MetricsWriter(
        out_dir, use_tensorboard=config.train.get("use_tensorboard", False)
    )
    nepochs = int(config.train.get("nepochs", 10))
    rng = jax.random.PRNGKey(int(config.get("seed", 1234)))
    best = float("inf")
    last: Dict[str, float] = {}

    import jax.numpy as jnp

    from ensemble_svs_with_interactions_tpu.train.losses import masked_mean

    @jax.jit
    def eval_recon(paramsG, batch):
        x, y, lengths = batch["in_feats"], batch["out_feats"], batch["lengths"]
        mask = (
            jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        ).astype(jnp.float32)[:, :, None]
        fake = netG.apply(
            {"params": paramsG}, x, lengths, train=False,
            rngs={"noise": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(0)},
        )
        return masked_mean((fake - y) ** 2, mask)

    for epoch in range(1, nepochs + 1):
        it = BucketedBatchIterator(
            datasets["train_no_dev"],
            max_tokens=int(config.data.get("batch_max_frames", 8000)),
            time_multiple=int(config.data.get("time_multiple", 32)),
            batch_multiple=n_dev,
            shuffle=True,
            seed=epoch,
        )
        epoch_metrics: Dict[str, list] = {}
        # batch construction + async H2D enqueue overlap step dispatch
        for sharded in prefetch_batches(shard_batch(b, mesh) for b in it):
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, sharded, step_rng)
            for k, v in metrics.items():
                # un-fetched device scalars: float() here would BLOCK
                # the host every step and stop dispatch running ahead
                # of the device; one batched device_get at epoch end
                epoch_metrics.setdefault(k, []).append(v)
        means = {
            k: float(np.mean(jax.device_get(v)))
            for k, v in epoch_metrics.items()
        }
        writer.log(epoch, means, prefix="train_no_dev/")

        # best-checkpoint selection on the DEV split (the reference's
        # train_postfilter picks best on dev, not training recon)
        dev_losses = [
            float(eval_recon(state["paramsG"], shard_batch(batch, mesh)))
            for batch in BucketedBatchIterator(
                datasets["dev"],
                max_tokens=int(config.data.get("batch_max_frames", 8000)),
                time_multiple=int(config.data.get("time_multiple", 32)),
                batch_multiple=n_dev,
                shuffle=False,
                seed=0,
            )
        ]
        if dev_losses:
            means["Dev_Loss_Recon"] = float(np.mean(dev_losses))
            writer.log(
                epoch, {"Loss_Recon": means["Dev_Loss_Recon"]}, prefix="dev/"
            )
        logger.info(
            "epoch %d %s", epoch, {k: round(v, 4) for k, v in means.items()}
        )
        last = means
        gen_loss = means.get(
            "Dev_Loss_Recon", means.get("Loss_Recon", float("inf"))
        )
        save_checkpoint(
            out_dir,
            TrainState(
                params=state["paramsG"],
                batch_stats={},
                opt_state=state["optG_state"],
                step=int(state["step"]),
            ),
            epoch,
            is_best=gen_loss < best,
        )
        best = min(best, gen_loss)
    writer.close()
    return last
