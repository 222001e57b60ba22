"""Tests for postfilters, discriminators, WaveNet and GAN training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ensemble_svs_with_interactions_tpu.models.discriminators import Conv2dD
from ensemble_svs_with_interactions_tpu.models.postfilters import (
    Conv2dPostFilter,
    MultistreamPostFilter,
    variance_scaling,
)
from ensemble_svs_with_interactions_tpu.models.wavenet import WaveNet
from ensemble_svs_with_interactions_tpu.train.gan import create_gan_train_step

B, T, D = 2, 32, 12


def test_variance_scaling():
    rng = np.random.default_rng(0)
    feats = rng.normal(scale=0.5, size=(50, 6))
    gv = np.ones(6) * 4.0  # target variance much larger
    out = variance_scaling(gv, feats, offset=2)
    # first two dims untouched
    assert np.allclose(out[:, :2], feats[:, :2])
    # scaled dims now have variance ~= gv
    assert np.allclose(out[:, 2:].var(axis=0), 4.0, rtol=0.05)
    # note-frame restricted version
    idx = np.arange(10, 40)
    out2 = variance_scaling(gv, feats, offset=2, note_frame_indices=idx)
    assert np.allclose(out2[:10], feats[:10])
    assert not np.allclose(out2[idx], feats[idx])


def test_conv2d_postfilter():
    pf = Conv2dPostFilter(channels=8, smoothing_width=5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, D)), jnp.float32)
    v = pf.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    out = pf.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert out.shape == (B, T, D)


def test_multistream_postfilter():
    mgc_pf = Conv2dPostFilter(channels=4)
    pf = MultistreamPostFilter(
        mgc_postfilter=mgc_pf, bap_postfilter=None, lf0_postfilter=None,
        stream_sizes=(6, 1, 1, 4),
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 12)), jnp.float32)
    v = pf.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    out = pf.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert out.shape == (B, T, 12)
    # untouched streams pass through
    assert np.allclose(np.asarray(out)[..., 6:], np.asarray(x)[..., 6:])


def test_conv2d_discriminator():
    d = Conv2dD(channels=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, D)), jnp.float32)
    v = d.init(jax.random.PRNGKey(0), x)
    feats = d.apply(v, x)
    assert len(feats) == 5
    assert feats[-1].shape[-1] == 1  # logit map


def test_wavenet():
    wn = WaveNet(in_dim=8, out_dim=4, layers=4, residual_channels=8,
                 gate_channels=16, skip_out_channels=8)
    c = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 8)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(B, T, 4)), jnp.float32)
    v = wn.init(jax.random.PRNGKey(0), c, x=x)
    out = wn.apply(v, c, x=x)
    assert out.shape == (B, T, 4)
    inf = wn.apply(v, c, method="inference")
    assert inf.shape == (B, T, 4)


def test_gan_train_step_runs_and_improves():
    netG = Conv2dPostFilter(channels=4)
    netD = Conv2dD(channels=4, padding=None)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, D)).astype(np.float32) * 0.5
    y = (x * 2.0).astype(np.float32)  # target: amplified features
    batch = {
        "in_feats": jnp.asarray(x),
        "out_feats": jnp.asarray(y),
        "lengths": jnp.asarray([T, T]),
    }
    vG = netG.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch["in_feats"],
    )
    vD = netD.init(jax.random.PRNGKey(2), batch["out_feats"])
    optG = optax.adam(1e-3)
    optD = optax.adam(1e-3)
    state = {
        "paramsG": vG["params"],
        "paramsD": vD["params"],
        "optG_state": optG.init(vG["params"]),
        "optD_state": optD.init(vD["params"]),
        "step": jnp.asarray(0),
    }
    step = create_gan_train_step(netG, netD, optG, optD)
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(20):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        if first is None:
            first = float(metrics["Loss_Recon"])
    assert np.isfinite(float(metrics["Loss_G"]))
    assert np.isfinite(float(metrics["Loss_D"]))
    assert float(metrics["Loss_Recon"]) < first


@pytest.mark.parametrize("gan_type", ["lsgan", "vanilla-gan", "hinge"])
def test_gan_train_step_reference_knobs(gan_type):
    """The reference train_postfilter knobs: adv_streams stream selection,
    mask_nth_mgc_for_adv_loss, vuv masking, and all three gan_type loss
    families (nnsvs/bin/train_postfilter.py:43-215)."""
    ss = [4, 1, 1, 2]
    Dd = sum(ss)
    netG = Conv2dPostFilter(channels=4)
    # adv input = mgc (minus 1 energy dim) + bap = 4 - 1 + 2 = 5 dims
    netD = Conv2dD(channels=4, padding=None, last_sigmoid=(gan_type == "vanilla-gan"))
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, T, Dd)).astype(np.float32) * 0.5
    y = (x * 1.5).astype(np.float32)
    x[:, :, sum(ss[:2])] = rng.integers(0, 2, size=(B, T))  # vuv streams
    y[:, :, sum(ss[:2])] = x[:, :, sum(ss[:2])]
    batch = {
        "in_feats": jnp.asarray(x),
        "out_feats": jnp.asarray(y),
        "lengths": jnp.asarray([T, T - 3]),
    }
    vG = netG.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch["in_feats"],
    )
    vD = netD.init(jax.random.PRNGKey(2), jnp.zeros((B, T, 5)))
    optG, optD = optax.adam(1e-3), optax.adam(1e-3)
    state = {
        "paramsG": vG["params"],
        "paramsD": vD["params"],
        "optG_state": optG.init(vG["params"]),
        "optD_state": optD.init(vD["params"]),
        "step": jnp.asarray(0),
    }
    step = create_gan_train_step(
        netG, netD, optG, optD,
        gan_type=gan_type,
        stream_sizes=ss,
        adv_streams=[True, False, False, True],
        mask_nth_mgc_for_adv_loss=1,
        vuv_mask=True,
    )
    key = jax.random.PRNGKey(5)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    for name in ("Loss_G", "Loss_D", "Loss_Recon", "Loss_Adv"):
        assert np.isfinite(float(metrics[name])), name


def test_train_postfilter_cli(tmp_path):
    """Full postfilter GAN training loop from the CLI entry point."""
    import yaml

    from ensemble_svs_with_interactions_tpu.bin.train_postfilter import main

    rng = np.random.default_rng(0)
    (tmp_path / "in").mkdir(), (tmp_path / "out").mkdir()
    for i in range(4):
        T = int(rng.integers(30, 50))
        gt = rng.normal(size=(T, 6)).astype(np.float32)
        np.save(tmp_path / "in" / f"u{i}-feats.npy", (gt * 0.7).astype(np.float32))
        np.save(tmp_path / "out" / f"u{i}-feats.npy", gt)
    cfg = {
        "seed": 1,
        "verbose": 0,
        "data": {
            "train_no_dev": {"in_dir": str(tmp_path / "in"), "out_dir": str(tmp_path / "out")},
            "dev": {"in_dir": str(tmp_path / "in"), "out_dir": str(tmp_path / "out")},
            "batch_max_frames": 2000,
            "time_multiple": 8,
        },
        "model": {
            "netG": {
                "_target_": "ensemble_svs_with_interactions_tpu.models.postfilters.Conv2dPostFilter",
                "channels": 4,
            },
            "netD": {
                "_target_": "ensemble_svs_with_interactions_tpu.models.discriminators.Conv2dD",
                "channels": 4,
                "padding": None,
            },
        },
        "train": {
            "out_dir": str(tmp_path / "exp"),
            "nepochs": 2,
            "optim": {
                "netG": {"optimizer": {"name": "Adam", "params": {"lr": 0.001}}},
                "netD": {"optimizer": {"name": "Adam", "params": {"lr": 0.001}}},
                "clip_norm": 1.0,
            },
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    assert main([str(cfg_path)]) == 0
    assert (tmp_path / "exp" / "best_loss.ckpt").exists()
    assert (tmp_path / "exp" / "metrics.jsonl").exists()
