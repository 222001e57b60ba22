"""First-party uSFGAN-family vocoder training loop.

The reference delegates vocoder training to the external parallel_wavegan
/ usfgan packages (recipe stages 10/11/13, run_common_steps_dev.sh:50-64);
this framework ships the generators, so it also ships the trainer: random
fixed-length crops of (features, waveform) pairs, per-crop sine+noise
excitation from the denormalized F0 stream (SignalGenerator), pitch-
dependent dilation factors, and the multi-resolution-STFT + LSGAN step
from :mod:`train.vocoder`.

Data layout: ``in_dir`` with ``{utt}-feats.npy`` (normalized acoustic
features, world layout [mgc, lf0, vuv, bap]) and ``{utt}-wave.npy``
(aligned float waveform) — the output of ``bin.prepare_voc_features``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import numpy as np

from ensemble_svs_with_interactions_tpu.models.vocoders.usfgan import (
    SignalGenerator,
    dilated_factor,
)
from ensemble_svs_with_interactions_tpu.data.dataset import prefetch_batches
from ensemble_svs_with_interactions_tpu.parallel import make_mesh, shard_batch
from ensemble_svs_with_interactions_tpu.train.loop import (
    MetricsWriter,
    build_optimizer,
    save_checkpoint,
    TrainState,
)
from ensemble_svs_with_interactions_tpu.train.vocoder import (
    create_vocoder_gan_train_step,
    generator_input_arity,
    generator_inputs,
)
from ensemble_svs_with_interactions_tpu.utils.config import Config, instantiate
from ensemble_svs_with_interactions_tpu.utils.logger import getLogger
from ensemble_svs_with_interactions_tpu.utils.misc import init_seed


class _VocoderCrops:
    """Random fixed-length (features, waveform, excitation) crops."""

    def __init__(
        self,
        in_dir,
        sample_rate: int,
        hop_size: int,
        crop_frames: int,
        lf0_idx: int,
        vuv_idx: int,
        aux_indices,
        lf0_mean: float = 0.0,
        lf0_scale: float = 1.0,
        signal_types=("sine", "noise"),
        dense_factor: int = 4,
        sine_amp: float = 0.1,
        noise_amp: float = 0.003,
    ):
        in_dir = Path(in_dir)
        self.items = []
        for f in sorted(in_dir.glob("*-feats.npy")):
            w = Path(str(f).replace("-feats.npy", "-wave.npy"))
            if w.exists():
                self.items.append((f, w))
        if not self.items:
            raise FileNotFoundError(f"no feats/wave pairs in {in_dir}")
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.crop_frames = crop_frames
        self.lf0_idx = lf0_idx
        self.vuv_idx = vuv_idx
        self.aux_indices = np.asarray(aux_indices)
        self.lf0_mean = lf0_mean
        self.lf0_scale = lf0_scale
        self.dense_factor = dense_factor
        self.signal_generator = SignalGenerator(
            sample_rate, hop_size, sine_amp, noise_amp, list(signal_types)
        )

    def batch(self, rng: np.random.Generator, batch_size: int) -> Dict:
        xs, cs, ds, ys, f0s = [], [], [], [], []
        for _ in range(batch_size):
            fpath, wpath = self.items[int(rng.integers(len(self.items)))]
            feats = np.load(fpath)
            wave = np.load(wpath).reshape(-1)
            Tf = min(len(feats), len(wave) // self.hop_size)
            if Tf <= self.crop_frames:
                start = 0
                feats = np.pad(
                    feats[:Tf], ((0, self.crop_frames - Tf), (0, 0)), mode="edge"
                )
                wave = np.pad(
                    wave[: Tf * self.hop_size],
                    (0, (self.crop_frames - Tf) * self.hop_size),
                )
            else:
                start = int(rng.integers(Tf - self.crop_frames))
                feats = feats[start : start + self.crop_frames]
                wave = wave[
                    start * self.hop_size : (start + self.crop_frames)
                    * self.hop_size
                ]
            lf0 = feats[:, self.lf0_idx] * self.lf0_scale + self.lf0_mean
            vuv = feats[:, self.vuv_idx]
            f0 = np.where(vuv > 0.5, np.exp(lf0), 0.0)
            xs.append(self.signal_generator(f0, seed=int(rng.integers(1 << 31))))
            ds.append(
                np.repeat(
                    dilated_factor(f0, self.sample_rate, self.dense_factor),
                    self.hop_size,
                )
            )
            cs.append(feats[:, self.aux_indices])
            ys.append(wave[:, None])
            f0s.append(f0)
        return {
            "x": np.stack(xs).astype(np.float32),
            "c": np.stack(cs).astype(np.float32),
            "d": np.stack(ds).astype(np.float32),
            "y": np.stack(ys).astype(np.float32),
            "f0": np.stack(f0s).astype(np.float32),
        }


def train_vocoder(config: Config) -> Dict[str, float]:
    logger = getLogger(verbose=config.get("verbose", 1), name="train_voc")
    init_seed(int(config.get("seed", 1234)))

    # data-parallel mesh, like the non-GAN trainers (the reference trains
    # vocoders through external DDP-capable trainers, recipe stages 10-13)
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

    sr = int(config.data.get("sample_rate", 48000))
    hop = int(sr * float(config.data.get("frame_period", 5)) / 1000.0)
    ss = list(config.data.get("stream_sizes", [60, 1, 1, 5]))
    mgc_end = ss[0]
    lf0_idx = mgc_end
    vuv_idx = mgc_end + 1
    bap_start = mgc_end + 2
    aux_indices = list(range(0, mgc_end)) + list(
        range(bap_start, bap_start + ss[3])
    )

    generator = instantiate(config.model.generator)
    discriminator = instantiate(config.model.discriminator)

    crops = _VocoderCrops(
        config.data.train_no_dev.in_dir,
        sr,
        hop,
        crop_frames=int(config.data.get("crop_frames", 64)),
        lf0_idx=lf0_idx,
        vuv_idx=vuv_idx,
        aux_indices=aux_indices,
        lf0_mean=float(config.data.get("lf0_mean", 0.0)),
        lf0_scale=float(config.data.get("lf0_scale", 1.0)),
        signal_types=tuple(config.model.get("signal_types", ["sine", "noise"])),
        dense_factor=int(config.model.get("dense_factor", 4)),
        sine_amp=float(config.model.get("sine_amp", 0.1)),
        noise_amp=float(config.model.get("noise_amp", 0.003)),
    )
    logger.info("vocoder corpus: %d utterances", len(crops.items))

    rng_np = np.random.default_rng(int(config.get("seed", 1234)))
    probe = crops.batch(rng_np, 1)
    vG = generator.init(
        jax.random.PRNGKey(0),
        *generator_inputs(probe, generator_input_arity(generator)),
    )
    vD = discriminator.init(jax.random.PRNGKey(1), probe["y"])

    optG = build_optimizer(dict(config.train.optim.netG.optimizer))
    optD = build_optimizer(dict(config.train.optim.netD.optimizer))
    state = {
        "paramsG": vG["params"],
        "paramsD": vD["params"],
        "optG_state": optG.init(vG["params"]),
        "optD_state": optD.init(vD["params"]),
        "step": 0,
    }
    fft_sizes = tuple(config.train.get("fft_sizes", [1024, 2048, 512]))
    hop_sizes = tuple(config.train.get("hop_sizes", [120, 240, 50]))
    win_lengths = tuple(config.train.get("win_lengths", [600, 1200, 240]))

    # reference usfgan trainer config surface (train_usfgan/train/*.yaml):
    # lambda_* weights, stft_loss._target_ MelSpectralLoss, source_loss
    # ResidualLoss, discriminator_train_start_steps
    stft_loss_cfg = dict(config.train.get("stft_loss", {}) or {})
    stft_loss_type = str(config.train.get("stft_loss_type", ""))
    if not stft_loss_type:
        stft_loss_type = (
            "mel"
            if "MelSpectralLoss" in str(stft_loss_cfg.get("_target_", ""))
            else "multi_resolution"
        )
    source_cfg = dict(config.train.get("source_loss", {}) or {})
    source_weight = float(
        config.train.get("lambda_source", config.train.get("source_weight", 0.0))
    )
    cheaptrick_layer = None
    source_mel_fb = None
    if source_weight > 0:
        from ensemble_svs_with_interactions_tpu.models.vocoders.cheaptrick import (
            CheapTrickLayer,
        )

        cheaptrick_layer = CheapTrickLayer(
            sample_rate=int(source_cfg.get("sampling_rate", sr)),
            hop_size=hop,
            fft_size=int(source_cfg.get("fft_size", 4096)),
            f0_floor=int(source_cfg.get("f0_floor", 70)),
            f0_ceil=int(source_cfg.get("f0_ceil", 1000)),
        )
        if source_cfg.get("n_mels"):
            import jax.numpy as jnp

            from ensemble_svs_with_interactions_tpu.data.data_source import (
                mel_filterbank,
            )

            source_mel_fb = jnp.asarray(
                mel_filterbank(
                    int(source_cfg.get("sampling_rate", sr)),
                    int(source_cfg.get("fft_size", 4096)),
                    int(source_cfg["n_mels"]),
                    float(source_cfg.get("fmin", 0) or 0),
                    source_cfg.get("fmax", None),
                ),
                jnp.float32,
            )
    step_fn = create_vocoder_gan_train_step(
        generator,
        discriminator,
        optG,
        optD,
        stft_weight=float(
            config.train.get("lambda_stft", config.train.get("stft_weight", 1.0))
        ),
        adv_weight=float(
            config.train.get("lambda_adv", config.train.get("adv_weight", 4.0))
        ),
        fm_weight=float(
            config.train.get(
                "lambda_feat_match", config.train.get("fm_weight", 0.0)
            )
        ),
        fft_sizes=fft_sizes,
        hop_sizes=hop_sizes,
        win_lengths=win_lengths,
        stft_loss_type=stft_loss_type,
        mel_loss_params=stft_loss_cfg,
        source_weight=source_weight,
        cheaptrick_layer=cheaptrick_layer,
        source_mel_fb=source_mel_fb,
        discriminator_train_start_steps=int(
            config.train.get("discriminator_train_start_steps", 0)
        ),
    )

    out_dir = Path(config.train.out_dir)
    writer = MetricsWriter(
        out_dir, use_tensorboard=config.train.get("use_tensorboard", False)
    )
    nepochs = int(config.train.get("nepochs", 10))
    steps_per_epoch = int(config.train.get("steps_per_epoch", 100))
    batch_size = int(config.train.get("batch_size", 8))
    if batch_size % n_dev:
        batch_size = -(-batch_size // n_dev) * n_dev
        logger.info(
            "batch_size rounded up to %d (multiple of %d devices)",
            batch_size, n_dev,
        )
    best = float("inf")
    last: Dict[str, float] = {}

    def _crop_batches(n):
        # crop assembly + excitation synthesis + async H2D enqueue, run on
        # the prefetch thread so they overlap step dispatch
        for _ in range(n):
            yield shard_batch(crops.batch(rng_np, batch_size), mesh)

    for epoch in range(1, nepochs + 1):
        epoch_metrics: Dict[str, list] = {}
        for batch in prefetch_batches(_crop_batches(steps_per_epoch)):
            state, metrics = step_fn(state, batch)
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
        logger.info(
            "epoch %d %s", epoch, {k: round(v, 4) for k, v in means.items()}
        )
        last = means
        stft = means.get("Loss_STFT_Mag", float("inf"))
        save_checkpoint(
            out_dir,
            TrainState(
                params=state["paramsG"],
                batch_stats={},
                opt_state=state["optG_state"],
                step=int(state["step"]),
            ),
            epoch,
            is_best=stft < best,
        )
        best = min(best, stft)
    writer.close()
    return last
