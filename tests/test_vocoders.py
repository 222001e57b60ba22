"""Tests for the uSFGAN vocoder family and vocoder GAN training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ensemble_svs_with_interactions_tpu.models.vocoders import (
    HiFiGANMultiPeriodDiscriminator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
    PWGDiscriminator,
    SignalGenerator,
    UnivNetMultiResolutionMultiPeriodDiscriminator,
    UnivNetMultiResolutionSpectralDiscriminator,
    USFGANGenerator,
    USFGANWrapper,
    dilated_factor,
)
from ensemble_svs_with_interactions_tpu.models.vocoders.usfgan import pd_indexing
from ensemble_svs_with_interactions_tpu.train.vocoder import (
    create_vocoder_gan_train_step,
    stft_loss,
)

HOP = 120
SR = 24000
AUX = 8


def _tiny_generator():
    return USFGANGenerator(
        source_network_params={"blockA": 2, "cycleA": 1, "blockF": 0, "cycleF": 0,
                               "cascade_mode": 0},
        filter_network_params={"blockA": 0, "cycleA": 0, "blockF": 2, "cycleF": 1,
                               "cascade_mode": 0},
        residual_channels=8,
        gate_channels=16,
        skip_channels=8,
        aux_channels=AUX,
        upsample_params={"upsample_scales": [10, 12]},  # 120x
    )


def test_dilated_factor_and_signal_generator():
    f0 = np.array([0.0, 200.0, 200.0, 0.0, 100.0])
    d = dilated_factor(f0, SR, 4)
    assert np.isclose(d[1], SR / (4 * 200))
    # unvoiced frames substitute f0 = fs/dense_factor -> factor exactly 1
    # (reference usfgan features.py:56-75)
    assert d[0] == 1.0 and d[3] == 1.0
    sig = SignalGenerator(SR, HOP, signal_types=("sine",))(f0)
    assert sig.shape == (5 * HOP, 1)
    # voiced region has much higher energy than unvoiced
    v = sig[HOP : 3 * HOP, 0]
    u = sig[:HOP, 0]
    assert v.std() > 3 * u.std()


def test_pd_indexing():
    x = jnp.asarray(np.arange(10, dtype=np.float32).reshape(1, 10, 1))
    d = jnp.full((1, 10), 2.0)
    xP, xF = pd_indexing(x, d, 1)
    assert xP[0, 5, 0] == 3  # t-2
    assert xF[0, 5, 0] == 7  # t+2
    # out-of-range gathers read zero (reference zero padding, index.py:30-52)
    assert xP[0, 0, 0] == 0
    assert xP[0, 1, 0] == 0
    assert xF[0, 9, 0] == 0
    assert xF[0, 8, 0] == 0


def test_usfgan_generator_shapes():
    gen = _tiny_generator()
    B, Tf = 1, 8
    T = Tf * HOP
    x = jnp.zeros((B, T, 1))
    c = jnp.zeros((B, Tf, AUX))
    d = jnp.ones((B, T))
    v = gen.init(jax.random.PRNGKey(0), x, c, d)
    wav, src = gen.apply(v, x, c, d)
    assert wav.shape == (B, T, 1)
    assert src.shape == (B, T, 1)


def test_usfgan_wrapper_inference():
    gen = _tiny_generator()
    Tf = 8
    f0 = np.full((Tf, 1), 220.0)
    v = gen.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, Tf * HOP, 1)),
        jnp.zeros((1, Tf, AUX)),
        jnp.ones((1, Tf * HOP)),
    )
    wrapper = USFGANWrapper(gen, v, sample_rate=SR, hop_size=HOP)
    aux = np.zeros((Tf, AUX), np.float32)
    wav = wrapper.inference(f0, aux)
    assert wav.shape == (Tf * HOP,)
    assert np.isfinite(wav).all()


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (PWGDiscriminator, {"layers": 4, "conv_channels": 8}),
        (HiFiGANMultiPeriodDiscriminator, {"periods": (2, 3), "channels": 4}),
        (UnivNetMultiResolutionSpectralDiscriminator,
         {"fft_sizes": (256,), "hop_sizes": (64,), "win_lengths": (128,)}),
        (UnivNetMultiResolutionMultiPeriodDiscriminator,
         {"fft_sizes": (256,), "hop_sizes": (64,), "win_lengths": (128,),
          "periods": (2, 3), "period_channels": 4}),
    ],
)
def test_vocoder_discriminators(cls, kwargs):
    d = cls(**kwargs)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 960, 1)), jnp.float32)
    v = d.init(jax.random.PRNGKey(0), x)
    outs = d.apply(v, x)
    flat = outs if isinstance(outs[0], (list, tuple)) else [outs]
    for feats in flat:
        assert feats[-1].shape[-1] == 1
        assert np.isfinite(np.asarray(feats[-1])).all()


def test_stft_loss_zero_for_identical():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(1, 2000)), jnp.float32)
    sc, mag = stft_loss(y, y, (256,), (64,), (128,))
    assert float(sc) < 1e-5 and float(mag) < 1e-5
    sc2, _ = stft_loss(y * 2, y, (256,), (64,), (128,))
    assert float(sc2) > 0.1


def test_vocoder_gan_step():
    gen = _tiny_generator()
    disc = PWGDiscriminator(layers=4, conv_channels=8)
    Tf = 4
    T = Tf * HOP
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(1, T, 1)) * 0.1, jnp.float32),
        "c": jnp.asarray(rng.normal(size=(1, Tf, AUX)), jnp.float32),
        "d": jnp.ones((1, T)),
        "y": jnp.asarray(rng.normal(size=(1, T, 1)) * 0.1, jnp.float32),
    }
    vG = gen.init(jax.random.PRNGKey(0), batch["x"], batch["c"], batch["d"])
    vD = disc.init(jax.random.PRNGKey(1), batch["y"])
    optG, optD = optax.adam(1e-4), optax.adam(1e-4)
    state = {
        "paramsG": vG["params"],
        "paramsD": vD["params"],
        "optG_state": optG.init(vG["params"]),
        "optD_state": optD.init(vD["params"]),
        "step": jnp.asarray(0),
    }
    step = create_vocoder_gan_train_step(
        gen, disc, optG, optD,
        fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,),
    )
    state, metrics = step(state, batch)
    for k in ("Loss_G", "Loss_STFT_SC", "Loss_Adv", "Loss_D"):
        assert np.isfinite(float(metrics[k])), k


def test_pwg_generator():
    from ensemble_svs_with_interactions_tpu.models.vocoders import PWGGenerator

    g = PWGGenerator(layers=4, stacks=2, residual_channels=4,
                     gate_channels=8, skip_channels=4, aux_channels=AUX,
                     aux_context_window=0, upsample_scales=(4, 5))
    Tf, up = 6, 20
    c = jnp.zeros((1, Tf, AUX))
    x = jnp.zeros((1, Tf * up, 1))
    v = g.init(jax.random.PRNGKey(0), x, c)
    wav = g.apply(v, x, c)
    assert wav.shape == (1, Tf * up, 1)
    wav_inf = g.apply(v, jnp.zeros((Tf, AUX)), method="inference",
                      key=jax.random.PRNGKey(1))
    assert wav_inf.shape == (1, Tf * up)
    assert np.isfinite(np.asarray(wav_inf)).all()


_HN_TINY = dict(
    residual_channels=4, gate_channels=8, skip_channels=4, aux_channels=AUX,
    aux_context_window=0,
    harmonic_network_params={"blockA": 2, "cycleA": 1, "blockF": 0,
                             "cycleF": 0, "cascade_mode": 0},
    noise_network_params={"blockA": 0, "cycleA": 0, "blockF": 2,
                          "cycleF": 1, "cascade_mode": 0},
    filter_network_params={"blockA": 0, "cycleA": 0, "blockF": 2,
                           "cycleF": 1, "cascade_mode": 0},
    upsample_params={"upsample_scales": [4, 5]},
)


@pytest.mark.parametrize("cls_name", ["cascade", "parallel"])
def test_hn_usfgan_generators(cls_name):
    from ensemble_svs_with_interactions_tpu.models.vocoders import (
        CascadeHnUSFGANGenerator,
        ParallelHnUSFGANGenerator,
    )

    cls = (CascadeHnUSFGANGenerator if cls_name == "cascade"
           else ParallelHnUSFGANGenerator)
    g = cls(**_HN_TINY)
    Tf, up = 6, 20
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, Tf * up, 2)),
                    dtype=jnp.float32)
    c = jnp.zeros((2, Tf, AUX))
    d = jnp.ones((2, Tf * up))
    v = g.init(jax.random.PRNGKey(0), x, c, d)
    wav, src, h_dbg, n_dbg, a = g.apply(v, x, c, d)
    assert wav.shape == src.shape == h_dbg.shape == n_dbg.shape == (2, Tf * up, 1)
    assert a.shape == (2, Tf * up, 4)
    assert ((a >= 0) & (a <= 1)).all()
    # gates start near 0.5 (tiny-std init on the last periodicity conv)
    assert np.abs(np.asarray(a).mean() - 0.5) < 0.05
    inf = g.apply(v, x, c, d, method="inference")
    assert inf.shape == (2, Tf * up, 1)
    assert np.isfinite(np.asarray(inf)).all()


def test_cheaptrick_layer_envelope():
    from ensemble_svs_with_interactions_tpu.models.vocoders import (
        CheapTrickLayer,
        source_regularization_loss,
    )

    sr, hop, fft = 16000, 80, 1024
    layer = CheapTrickLayer(sr, hop, fft, f0_floor=70, f0_ceil=340)
    t = np.arange(sr // 4) / sr
    f0_hz = 200.0
    wav = np.sin(2 * np.pi * f0_hz * t).astype(np.float32)[None]
    n_frames = wav.shape[1] // hop
    f0 = np.full((1, n_frames), f0_hz, dtype=np.float32)
    env = layer(jnp.asarray(wav), jnp.asarray(f0))
    assert env.shape == (1, n_frames, fft // 2 + 1)
    assert np.isfinite(np.asarray(env)).all()
    # envelope of a pure tone peaks near its frequency, decays far away
    mid = np.asarray(env)[0, n_frames // 2]
    k = int(round(f0_hz * fft / sr))
    assert mid[k] > mid[4 * k] + 1.0  # log-domain gap

    # regularization loss is differentiable w.r.t. the waveform
    grad = jax.grad(
        lambda w: source_regularization_loss(layer, w, jnp.asarray(f0))
    )(jnp.asarray(wav))
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).max() > 0


def test_train_vocoder_cli(tmp_path):
    """Full vocoder GAN training loop from the CLI entry point (hn-uSFGAN
    generator + PWG discriminator on a synthetic sine corpus)."""
    import yaml

    from ensemble_svs_with_interactions_tpu.bin.train_vocoder import main

    rng = np.random.default_rng(0)
    sr, hop = 16000, 80
    D = 8 + 1 + 1 + 3
    (tmp_path / "in").mkdir()
    for i in range(2):
        Tf = 80
        feats = (rng.normal(size=(Tf, D)) * 0.1).astype(np.float32)
        lf0 = np.log(200 + 20 * np.sin(np.arange(Tf) / 10))
        feats[:, 8] = lf0
        feats[:, 9] = 1.0
        phase = 2 * np.pi * np.cumsum(np.repeat(np.exp(lf0), hop)) / sr
        np.save(tmp_path / "in" / f"u{i}-feats.npy", feats)
        np.save(
            tmp_path / "in" / f"u{i}-wave.npy",
            (0.3 * np.sin(phase)).astype(np.float32),
        )
    cfg = {
        "seed": 1,
        "verbose": 0,
        "data": {
            "train_no_dev": {"in_dir": str(tmp_path / "in")},
            "sample_rate": sr,
            "frame_period": 5,
            "stream_sizes": [8, 1, 1, 3],
            "crop_frames": 40,
        },
        "model": {
            "generator": {
                "_target_": "ensemble_svs_with_interactions_tpu.models.vocoders.ParallelHnUSFGANGenerator",
                "residual_channels": 4,
                "gate_channels": 8,
                "skip_channels": 4,
                "aux_channels": 11,
                "aux_context_window": 0,
                "harmonic_network_params": {"blockA": 1, "cycleA": 1, "blockF": 0, "cycleF": 0, "cascade_mode": 0},
                "noise_network_params": {"blockA": 0, "cycleA": 0, "blockF": 1, "cycleF": 1, "cascade_mode": 0},
                "filter_network_params": {"blockA": 0, "cycleA": 0, "blockF": 1, "cycleF": 1, "cascade_mode": 0},
                "upsample_params": {"upsample_scales": [4, 4, 5]},
            },
            "discriminator": {
                "_target_": "ensemble_svs_with_interactions_tpu.models.vocoders.PWGDiscriminator",
                "layers": 3,
                "conv_channels": 8,
            },
            "signal_types": ["sine", "noise"],
        },
        "train": {
            "out_dir": str(tmp_path / "exp"),
            "nepochs": 1,
            "steps_per_epoch": 3,
            "batch_size": 2,
            "fft_sizes": [256],
            "hop_sizes": [64],
            "win_lengths": [128],
            "optim": {
                "netG": {"optimizer": {"name": "Adam", "params": {"lr": 0.0005}}},
                "netD": {"optimizer": {"name": "Adam", "params": {"lr": 0.0005}}},
            },
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    assert main([str(cfg_path)]) == 0
    assert (tmp_path / "exp" / "best_loss.ckpt").exists()


def test_sifigan_generator_and_trainer_contract(tmp_path):
    """SiFiGAN generator shapes + one vocoder-GAN train step."""
    import optax

    from ensemble_svs_with_interactions_tpu.models.vocoders import (
        SiFiGANGenerator,
    )
    from ensemble_svs_with_interactions_tpu.train.vocoder import (
        create_vocoder_gan_train_step,
    )

    g = SiFiGANGenerator(channels=16, aux_channels=AUX, upsample_scales=(4, 5),
                         resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
    dsc = PWGDiscriminator(layers=3, conv_channels=8)
    Tf, up = 6, 20
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(2, Tf * up, 1)), jnp.float32),
        "c": jnp.asarray(rng.normal(size=(2, Tf, AUX)), jnp.float32),
        "d": jnp.ones((2, Tf * up)),
        "y": jnp.asarray(rng.normal(size=(2, Tf * up, 1)) * 0.1, jnp.float32),
    }
    vG = g.init(jax.random.PRNGKey(0), batch["x"], batch["c"], batch["d"])
    wav, src = g.apply(vG, batch["x"], batch["c"], batch["d"])
    assert wav.shape == (2, Tf * up, 1) and src.shape == (2, Tf * up, 1)
    assert np.isfinite(np.asarray(wav)).all()

    vD = dsc.init(jax.random.PRNGKey(1), batch["y"])
    optG, optD = optax.adam(1e-4), optax.adam(1e-4)
    state = {
        "paramsG": vG["params"], "paramsD": vD["params"],
        "optG_state": optG.init(vG["params"]),
        "optD_state": optD.init(vD["params"]), "step": 0,
    }
    step = create_vocoder_gan_train_step(
        g, dsc, optG, optD, fft_sizes=(64,), hop_sizes=(16,), win_lengths=(32,)
    )
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["Loss_G"]))
    assert np.isfinite(float(metrics["Loss_D"]))


def test_hifigan_generator():
    from ensemble_svs_with_interactions_tpu.models.vocoders import (
        HiFiGANGenerator,
    )

    g = HiFiGANGenerator(channels=16, aux_channels=AUX, upsample_scales=(4, 5),
                         resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
    c = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, AUX)), jnp.float32)
    v = g.init(jax.random.PRNGKey(0), c)
    wav = g.apply(v, c)
    assert wav.shape == (2, 120, 1)
    assert ((wav >= -1) & (wav <= 1)).all()  # tanh output range
    inf = g.apply(v, c[0], method="inference")
    assert inf.shape == (120,)


def test_generator_input_arity():
    from ensemble_svs_with_interactions_tpu.models.vocoders import (
        HiFiGANGenerator,
        PWGGenerator,
        SiFiGANGenerator,
    )
    from ensemble_svs_with_interactions_tpu.train.vocoder import (
        generator_input_arity,
        generator_inputs,
    )

    assert generator_input_arity(_tiny_generator()) == 3
    assert generator_input_arity(SiFiGANGenerator()) == 3
    assert generator_input_arity(PWGGenerator()) == 2
    assert generator_input_arity(HiFiGANGenerator()) == 1
    batch = {"x": "X", "c": "C", "d": "D"}
    assert generator_inputs(batch, 3) == ("X", "C", "D")
    assert generator_inputs(batch, 2) == ("X", "C")
    assert generator_inputs(batch, 1) == ("C",)


@pytest.mark.parametrize("family", ["hifigan", "pwg"])
def test_vocoder_gan_step_wav_only_generators(family):
    """The GAN train step adapts to conditioning-only (HiFiGAN) and
    noise-driven (PWG) generators that return a bare waveform — the
    reference trains these through parallel_wavegan's per-model collater
    registry; here the step derives the input arity from the signature."""
    from ensemble_svs_with_interactions_tpu.models.vocoders import (
        HiFiGANGenerator,
        PWGGenerator,
    )

    Tf, up = 6, 20
    if family == "hifigan":
        gen = HiFiGANGenerator(
            channels=16, aux_channels=AUX, upsample_scales=(4, 5),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        )
    else:
        gen = PWGGenerator(
            layers=4, stacks=2, residual_channels=4, gate_channels=8,
            skip_channels=4, aux_channels=AUX, aux_context_window=0,
            upsample_scales=(4, 5),
        )
    disc = PWGDiscriminator(layers=3, conv_channels=8)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(2, Tf * up, 1)), jnp.float32),
        "c": jnp.asarray(rng.normal(size=(2, Tf, AUX)), jnp.float32),
        "d": jnp.ones((2, Tf * up)),
        "y": jnp.asarray(rng.normal(size=(2, Tf * up, 1)) * 0.1, jnp.float32),
    }
    from ensemble_svs_with_interactions_tpu.train.vocoder import (
        generator_input_arity,
        generator_inputs,
    )

    n = generator_input_arity(gen)
    vG = gen.init(jax.random.PRNGKey(0), *generator_inputs(batch, n))
    vD = disc.init(jax.random.PRNGKey(1), batch["y"])
    optG, optD = optax.adam(1e-4), optax.adam(1e-4)
    state = {
        "paramsG": vG["params"], "paramsD": vD["params"],
        "optG_state": optG.init(vG["params"]),
        "optD_state": optD.init(vD["params"]), "step": 0,
    }
    step = create_vocoder_gan_train_step(
        gen, disc, optG, optD, fm_weight=2.0,
        fft_sizes=(64,), hop_sizes=(16,), win_lengths=(32,),
    )
    state, metrics = step(state, batch)
    for k in ("Loss_G", "Loss_STFT_SC", "Loss_Adv", "Loss_D"):
        assert np.isfinite(float(metrics[k])), k


def test_train_vocoder_cli_hifigan(tmp_path):
    """End-to-end HiFiGAN GAN training from the CLI (conditioning-only
    generator; recipe stage 11's parallel_wavegan-delegated training)."""
    import yaml

    from ensemble_svs_with_interactions_tpu.bin.train_vocoder import main

    rng = np.random.default_rng(0)
    sr, hop = 16000, 80
    D = 8 + 1 + 1 + 3
    (tmp_path / "in").mkdir()
    for i in range(2):
        Tf = 60
        feats = (rng.normal(size=(Tf, D)) * 0.1).astype(np.float32)
        feats[:, 8] = np.log(200.0)
        feats[:, 9] = 1.0
        np.save(tmp_path / "in" / f"u{i}-feats.npy", feats)
        np.save(
            tmp_path / "in" / f"u{i}-wave.npy",
            (0.2 * rng.normal(size=Tf * hop)).astype(np.float32),
        )
    cfg = {
        "seed": 1,
        "verbose": 0,
        "data": {
            "train_no_dev": {"in_dir": str(tmp_path / "in")},
            "sample_rate": sr,
            "frame_period": 5,
            "stream_sizes": [8, 1, 1, 3],
            "crop_frames": 32,
        },
        "model": {
            "generator": {
                "_target_": "ensemble_svs_with_interactions_tpu.models.vocoders.HiFiGANGenerator",
                "channels": 8,
                "aux_channels": 11,
                "upsample_scales": [4, 4, 5],
                "resblock_kernel_sizes": [3],
                "resblock_dilations": [[1, 3]],
            },
            "discriminator": {
                "_target_": "ensemble_svs_with_interactions_tpu.models.vocoders.PWGDiscriminator",
                "layers": 3,
                "conv_channels": 8,
            },
            "noise_amp": 1.0,
        },
        "train": {
            "out_dir": str(tmp_path / "exp"),
            "nepochs": 1,
            "steps_per_epoch": 2,
            "batch_size": 2,
            "fft_sizes": [256],
            "hop_sizes": [64],
            "win_lengths": [128],
            "optim": {
                "netG": {"optimizer": {"name": "Adam", "params": {"lr": 0.0005}}},
                "netD": {"optimizer": {"name": "Adam", "params": {"lr": 0.0005}}},
            },
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    assert main([str(cfg_path)]) == 0
    assert (tmp_path / "exp" / "best_loss.ckpt").exists()


@pytest.mark.parametrize(
    "conf_name",
    ["nnsvs_hifigan.yaml", "nnsvs_univnet.yaml"],
)
def test_reference_discriminator_configs_port(conf_name):
    """The reference vocoder-training discriminator YAMLs instantiate
    key-for-key through our classes (recipes/_common/conf/jp_dev_48k_nodyn/
    train_usfgan/discriminator/*.yaml)."""
    import yaml
    from pathlib import Path

    from ensemble_svs_with_interactions_tpu.utils.config import instantiate

    path = Path(
        "/root/reference/recipes/_common/conf/jp_dev_48k_nodyn/"
        "train_usfgan/discriminator"
    ) / conf_name
    if not path.exists():
        pytest.skip("reference checkout unavailable")
    cfg = yaml.safe_load(path.read_text())
    cfg["_target_"] = cfg["_target_"].replace(
        "usfgan.models.",
        "ensemble_svs_with_interactions_tpu.models.vocoders.",
    )
    # shrink for test speed
    for key in ("spectral_discriminator_params", "period_discriminator_params",
                "scale_discriminator_params"):
        if cfg.get(key):
            for k in ("channels", "max_downsample_channels"):
                if k in cfg[key]:
                    cfg[key][k] = min(int(cfg[key][k]), 8)
    disc = instantiate(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 1024, 1)), jnp.float32
    )
    v = disc.init(jax.random.PRNGKey(0), x)
    outs = disc.apply(v, x)
    leaves = jax.tree_util.tree_leaves(outs)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_reference_usfgan_generator_config_ports():
    """The reference ParallelHnUSFGAN generator YAML instantiates
    key-for-key (incl. use_weight_norm) through our class."""
    import yaml
    from pathlib import Path

    from ensemble_svs_with_interactions_tpu.utils.config import instantiate

    path = Path(
        "/root/reference/recipes/_common/conf/jp_dev_48k_nodyn/train_usfgan/"
        "generator/nnsvs_world_parallel_hn_usfgan_sr48k.yaml"
    )
    if not path.exists():
        pytest.skip("reference checkout unavailable")
    cfg = yaml.safe_load(path.read_text())
    cfg["_target_"] = cfg["_target_"].replace(
        "usfgan.models.",
        "ensemble_svs_with_interactions_tpu.models.vocoders.",
    )
    # shrink for test speed
    cfg["residual_channels"] = 8
    cfg["gate_channels"] = 16
    cfg["skip_channels"] = 8
    cfg["aux_channels"] = 5
    for key in ("harmonic_network_params", "noise_network_params",
                "filter_network_params"):
        for k in ("blockA", "blockF"):
            cfg[key][k] = min(int(cfg[key][k]), 2)
        for k in ("cycleA", "cycleF"):
            cfg[key][k] = min(int(cfg[key][k]), 2)
    gen = instantiate(cfg)
    hop = int(np.prod(cfg["upsample_params"]["upsample_scales"]))
    Tf = 4
    # hn-uSFGAN excitation input = (sine, noise) channel pair
    x = jnp.zeros((1, Tf * hop, 2))
    c = jnp.zeros((1, Tf, 5))
    d = jnp.ones((1, Tf * hop))
    v = gen.init(jax.random.PRNGKey(0), x, c, d)
    wav = gen.apply(v, x, c, d, method="inference")
    assert wav.shape == (1, Tf * hop, 1)


_USFGAN_LOSS_DRIVE = r"""
import os
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
import jax
jax.config.update("jax_platforms", "cpu")
# share the suite's per-run persistent kernel cache (conftest sets the
# env var; this fresh process bypasses conftest)
if os.environ.get("ESVS_TEST_JAXCACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["ESVS_TEST_JAXCACHE"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import sys
sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp
import optax

from ensemble_svs_with_interactions_tpu.models.vocoders import (
    ParallelHnUSFGANGenerator,
    PWGDiscriminator,
)
from ensemble_svs_with_interactions_tpu.models.vocoders.cheaptrick import (
    CheapTrickLayer,
)
from ensemble_svs_with_interactions_tpu.train.vocoder import (
    create_vocoder_gan_train_step,
)

AUX = 8
_HN_TINY = dict(
    residual_channels=4, gate_channels=8, skip_channels=4, aux_channels=AUX,
    aux_context_window=0,
    harmonic_network_params={"blockA": 2, "cycleA": 1, "blockF": 0,
                             "cycleF": 0, "cascade_mode": 0},
    noise_network_params={"blockA": 0, "cycleA": 0, "blockF": 2,
                          "cycleF": 1, "cascade_mode": 0},
    filter_network_params={"blockA": 0, "cycleA": 0, "blockF": 2,
                           "cycleF": 1, "cascade_mode": 0},
    upsample_params={"upsample_scales": [4, 5]},
)

sr = 16000
gen = ParallelHnUSFGANGenerator(**_HN_TINY)
disc = PWGDiscriminator(layers=3, conv_channels=4)
Tf, UP = 64, 20  # _HN_TINY upsamples 4*5 = 20x
T = Tf * UP
rng = np.random.default_rng(0)
f0 = np.where(rng.uniform(size=(1, Tf)) > 0.3, 200.0, 0.0)
batch = {
    "x": jnp.asarray(rng.normal(size=(1, T, 2)) * 0.1, jnp.float32),
    "c": jnp.asarray(rng.normal(size=(1, Tf, AUX)), jnp.float32),
    "d": jnp.ones((1, T)),
    "y": jnp.asarray(rng.normal(size=(1, T, 1)) * 0.1, jnp.float32),
    "f0": jnp.asarray(f0, jnp.float32),
}
vG = gen.init(jax.random.PRNGKey(0), batch["x"], batch["c"], batch["d"])
vD = disc.init(jax.random.PRNGKey(1), batch["y"])
optG, optD = optax.adam(1e-4), optax.adam(1e-4)
state = {
    "paramsG": vG["params"],
    "paramsD": vD["params"],
    "optG_state": optG.init(vG["params"]),
    "optD_state": optD.init(vD["params"]),
    "step": jnp.asarray(0),
}
layer = CheapTrickLayer(sr, UP, 1024, f0_floor=100, f0_ceil=300)
step = create_vocoder_gan_train_step(
    gen, disc, optG, optD,
    stft_loss_type="mel",
    mel_loss_params={"sampling_rate": sr, "fft_size": 512,
                     "hop_size": 128, "win_length": 512, "n_mels": 20,
                     "fmin": 0},
    source_weight=1.0,
    cheaptrick_layer=layer,
    discriminator_train_start_steps=2,
)
def snap(tree):
    # host copies: the train step DONATES its input state, so device
    # leaves held across a step call are deleted buffers
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]

d0 = snap(state["paramsD"])
state, metrics = step(state, batch)
assert float(metrics["Loss_Adv"]) == 0.0
d1 = snap(state["paramsD"])
assert all(np.allclose(a, b) for a, b in zip(d0, d1))
assert np.isfinite(float(metrics["Loss_Source"]))
assert float(metrics["Loss_Source"]) > 0.0
state["step"] = jnp.asarray(5)
state, metrics = step(state, batch)
assert float(metrics["Loss_Adv"]) != 0.0
d2 = snap(state["paramsD"])
assert not all(np.allclose(a, b) for a, b in zip(d1, d2))
print("USFGAN_LOSS_OK")
"""


def test_vocoder_gan_step_usfgan_losses(tmp_path):
    """The uSFGAN trainer objectives: log-mel spectral loss, the
    CheapTrick residual source regularization, and the adversarial
    warm-up gate (reference train_usfgan/train/*.yaml: MelSpectralLoss,
    ResidualLoss, discriminator_train_start_steps).

    Runs in a SUBPROCESS: compiling this differentiated graph late in a
    long-lived suite process intermittently segfaults the XLA CPU
    compiler; a fresh process compiles it reliably.
    """
    import os
    import subprocess
    import sys
    from pathlib import Path

    script = tmp_path / "usfgan_loss_drive.py"
    script.write_text(_USFGAN_LOSS_DRIVE)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "USFGAN_LOSS_OK" in out.stdout, out.stdout
