"""End-to-end mini-training for the model families added in round 2:
the deterministic NPSS cascade with Post-Net AR decoders (the reference
ar_mgcf0bap recipe shape) and the encoder-less MDN mel cascade with a
diffusion mel decoder (the reference melf0_ar_f0_diff_mel shape) — both
through the REAL trainer (bucketed batches, 8-device CPU mesh, eval
metrics, checkpointing), then inference."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.train.trainer import train_model
from ensemble_svs_with_interactions_tpu.utils.config import _wrap, instantiate

PRE = "ensemble_svs_with_interactions_tpu.models"


def _corpus(tmp_path, rng, D_in, D_out, lf0_idx, n=6):
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    for i in range(n):
        T = int(rng.integers(24, 48))
        x = rng.normal(size=(T, D_in)).astype(np.float32)
        x[:, lf0_idx] = rng.uniform(0.2, 0.8, size=T)
        y = rng.normal(size=(T, D_out)).astype(np.float32)
        np.save(in_dir / f"utt{i:02d}-feats.npy", x)
        np.save(out_dir / f"utt{i:02d}-feats.npy", y)
    return in_dir, out_dir


def _train_cfg(in_dir, out_dir, exp, netG, ss):
    return _wrap({
        "seed": 1234, "verbose": 0,
        "data": {"train_no_dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                 "dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                 "batch_max_frames": 400, "time_multiple": 16},
        "model": {"netG": netG, "stream_sizes": ss,
                  "has_dynamic_features": [False] * len(ss),
                  "num_windows": 1},
        "train": {"out_dir": str(exp), "nepochs": 1,  # diet: loss-finite asserts only
                  "optim": {"optimizer": {"name": "Adam",
                                          "params": {"lr": 0.01}},
                            "clip_norm": 5.0}},
    })


def _bilstm(in_dim, out_dim, **kw):
    d = {"_target_": f"{PRE}.acoustic.BiLSTMNonAttentiveDecoder",
         "in_dim": in_dim, "out_dim": out_dim, "ff_hidden_dim": 8,
         "conv_hidden_dim": 8, "lstm_hidden_dim": 4, "num_lstm_layers": 1,
         "decoder_layers": 1, "decoder_hidden_dim": 8, "prenet_layers": 0,
         "reduction_factor": 2, "downsample_by_conv": True, "zoneout": 0.0}
    d.update(kw)
    return d


def _run_npss_postnet_cascade(tmp_path):
    from pathlib import Path
    tmp_path = Path(tmp_path)
    rng = np.random.default_rng(0)
    D_in, ss = 8, [4, 1, 1, 2]
    lf0 = dict(in_lf0_idx=5, in_lf0_min=4.5, in_lf0_max=6.5,
               out_lf0_mean=float(np.log(220.0)), out_lf0_scale=0.1)
    in_dir, out_dir = _corpus(tmp_path, rng, D_in, sum(ss), 5)
    netG = {
        "_target_": f"{PRE}.acoustic.NPSSMultistreamParametricModel",
        "in_dim": D_in, "out_dim": sum(ss), "stream_sizes": ss,
        "reduction_factor": 2, "in_rest_idx": 0, "out_lf0_idx": 4,
        "vuv_model_bap_conditioning": False,
        "vuv_model_mgc_conditioning": True,
        "lf0_model": {
            "_target_": f"{PRE}.acoustic.BiLSTMResF0NonAttentiveDecoder",
            "in_dim": D_in, "out_dim": 1, "ff_hidden_dim": 8,
            "conv_hidden_dim": 8, "lstm_hidden_dim": 4,
            "num_lstm_layers": 1, "decoder_layers": 1,
            "decoder_hidden_dim": 8, "prenet_layers": 0,
            "reduction_factor": 2, "downsample_by_conv": True,
            "zoneout": 0.0, "out_lf0_idx": 0, **lf0,
        },
        "mgc_model": _bilstm(D_in + 1, ss[0], postnet_layers=2,
                             postnet_channels=8, initial_value=-4.0,
                             prenet_noise_std=0.1),
        "bap_model": _bilstm(D_in + 1, ss[3]),
        "vuv_model": _bilstm(D_in + ss[0] + 1, ss[2], eval_dropout=False),
        **lf0,
    }
    cfg = _train_cfg(in_dir, out_dir, tmp_path / "exp", netG, ss)
    metrics = train_model(cfg)
    assert np.isfinite(metrics["Loss"])
    assert (tmp_path / "exp" / "latest.ckpt").exists()

    module = instantiate(netG)
    x = jnp.asarray(rng.uniform(0, 1, (2, 24, D_in)), jnp.float32)
    x = x.at[:, :, 5].set(0.5)
    v = module.init(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1),
         "zoneout": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        x, jnp.asarray([24, 20]), jnp.zeros((2, 24, sum(ss))), train=True)
    out = module.apply(v, x, jnp.asarray([24, 20]), method="inference",
                       rngs={"prenet": jax.random.PRNGKey(9)})
    assert out.shape == (2, 24, sum(ss))
    assert np.isfinite(np.asarray(out)).all()


def _run_mel_diffusion_cascade(tmp_path):
    from pathlib import Path
    tmp_path = Path(tmp_path)
    rng = np.random.default_rng(0)
    D_in, ss = 8, [6, 1, 1]
    lf0_idx = 5
    in_dir, out_dir = _corpus(tmp_path, rng, D_in, sum(ss), lf0_idx)
    netG = {
        "_target_": f"{PRE}.acoustic.MDNMultistreamSeparateF0MelModel",
        "in_dim": D_in, "out_dim": sum(ss), "stream_sizes": ss,
        "reduction_factor": 2, "in_rest_idx": 0, "in_lf0_idx": lf0_idx,
        "out_lf0_idx": ss[0], "in_lf0_min": 4.5, "in_lf0_max": 6.5,
        "out_lf0_mean": float(np.log(220.0)), "out_lf0_scale": 0.1,
        "lf0_model": {
            "_target_": f"{PRE}.acoustic.BiLSTMResF0NonAttentiveDecoder",
            "in_dim": D_in, "out_dim": 1, "ff_hidden_dim": 8,
            "conv_hidden_dim": 8, "lstm_hidden_dim": 4,
            "num_lstm_layers": 1, "decoder_layers": 1,
            "decoder_hidden_dim": 8, "prenet_layers": 0,
            "reduction_factor": 2, "downsample_by_conv": True,
            "zoneout": 0.0, "in_lf0_idx": lf0_idx, "out_lf0_idx": 0,
            "in_lf0_min": 4.5, "in_lf0_max": 6.5,
            "out_lf0_mean": float(np.log(220.0)), "out_lf0_scale": 0.1,
        },
        "mel_model": {
            "_target_": f"{PRE}.diffsinger.GaussianDiffusion",
            "in_dim": D_in + 1, "out_dim": ss[0], "K_step": 4,
            "schedule_type": "linear", "betas": None,
            "scheduler_params": {"max_beta": 0.06}, "norm_scale": 10,
            "encoder": {"_target_": f"{PRE}.FFN", "in_dim": D_in + 1,
                        "hidden_dim": 8, "out_dim": 8, "num_layers": 1},
            "denoise_fn": {"_target_": f"{PRE}.diffsinger.DiffNet",
                           "in_dim": ss[0], "encoder_hidden_dim": 8,
                           "residual_layers": 2, "residual_channels": 8,
                           "dilation_cycle_length": 2},
        },
        "vuv_model": {"_target_": f"{PRE}.FFN",
                      "in_dim": D_in + 1 + ss[0],
                      "hidden_dim": 8, "out_dim": 1, "num_layers": 1},
    }
    cfg = _train_cfg(in_dir, out_dir, tmp_path / "exp", netG, ss)
    metrics = train_model(cfg)
    assert np.isfinite(metrics["Loss"])

    module = instantiate(netG)
    x = jnp.asarray(rng.uniform(0, 1, (2, 24, D_in)), jnp.float32)
    x = x.at[:, :, lf0_idx].set(0.5)
    v = module.init(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1),
         "zoneout": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3),
         "diffusion": jax.random.PRNGKey(4)},
        x, jnp.asarray([24, 20]), jnp.zeros((2, 24, sum(ss))), train=True)
    out = module.apply(v, x, jnp.asarray([24, 20]), method="inference",
                       rngs={"prenet": jax.random.PRNGKey(9),
                             "diffusion": jax.random.PRNGKey(10)})
    assert out.shape == (2, 24, sum(ss))
    assert np.isfinite(np.asarray(out)).all()


def _spawn(family, tmp_path):
    """Run one family in a FRESH process: compiling these differentiated
    cascade graphs late in a long-lived suite process intermittently
    segfaults the XLA CPU compiler (same class as the uSFGAN-losses
    test); a fresh process compiles them reliably.  Env + CPU forcing
    happen before this module is imported in the child."""
    import subprocess
    import sys
    from pathlib import Path

    code = (
        "import os;"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8 "
        "--xla_backend_optimization_level=0';"
        "os.environ.setdefault('PALLAS_AXON_POOL_IPS','');"
        "import jax; jax.config.update('jax_platforms','cpu');"
        # share the suite's per-run persistent kernel cache (conftest
        # sets the env var; this fresh process bypasses conftest) — the
        # two cascade families reuse many identical tiny kernels
        "cache=os.environ.get('ESVS_TEST_JAXCACHE');"
        "cache and (jax.config.update('jax_compilation_cache_dir',cache),"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes',-1),"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',0.0));"
        "import sys; sys.path.insert(0, '.');"
        "from tests import test_train_new_families as m;"
        f"m._run_{family}(sys.argv[1]); print('{family}_OK')"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", code, str(tmp_path)],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert f"{family}_OK" in out.stdout, out.stdout


def test_train_npss_postnet_cascade(tmp_path):
    _spawn("npss_postnet_cascade", tmp_path)


def test_train_mel_diffusion_cascade(tmp_path):
    _spawn("mel_diffusion_cascade", tmp_path)
