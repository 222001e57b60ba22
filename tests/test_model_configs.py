"""Config-driven contract tests: every shipped YAML must instantiate and
run forward + inference (pattern from reference tests/test_model_configs.py:
35-60 — guarantees configs and code stay in sync)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from ensemble_svs_with_interactions_tpu.utils.config import instantiate, load_config

CONF_ROOT = (
    Path(__file__).parent.parent
    / "ensemble_svs_with_interactions_tpu"
    / "configs"
)
ALL_CONFIGS = sorted(CONF_ROOT.rglob("*.yaml"))


def _fill_lf0_stats(node):
    from collections.abc import Mapping

    defaults = {
        "in_lf0_min": 5.39,
        "in_lf0_max": 6.49,
        "out_lf0_mean": 5.95,
        "out_lf0_scale": 0.23,
    }
    if isinstance(node, Mapping):
        for k, v in list(node.items()):
            if k in defaults and v is None:
                node[k] = defaults[k]
            else:
                _fill_lf0_stats(v)


def _shrink(node):
    """Shrink hidden dims so the contract test stays fast."""
    from collections.abc import Mapping

    shrink_keys = {
        "hidden_dim", "ff_hidden_dim", "conv_hidden_dim", "lstm_hidden_dim",
        "decoder_hidden_dim", "attention_dim", "embed_dim", "spk_embed_dim",
        "residual_channels", "encoder_hidden_dim", "prenet_hidden_dim",
        "embedding_dim", "postnet_channels", "channels",
    }
    if isinstance(node, Mapping):
        for k, v in list(node.items()):
            if k in shrink_keys and isinstance(v, int) and v > 16:
                node[k] = 16
            elif k in ("num_layers", "num_lstm_layers", "residual_layers",
                       "decoder_layers") and isinstance(v, int) and v > 2:
                node[k] = 2
            elif k == "K_step" and isinstance(v, int) and v > 4:
                node[k] = 4
            else:
                _shrink(v)


def _check_postfilter_config(cfg, module, B, T, lengths):
    """Postfilter configs carry a netG MultistreamPostFilter + netD
    Conv2dD pair (reference conf/train_postfilter/model/*.yaml): run the
    generator on a full feature stack and the discriminator on its
    output."""
    D = sum(cfg.stream_sizes)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T, D)), jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
    }
    v = module.init(rngs, x, lengths, train=True)
    out = module.apply(
        v, x, lengths, method="inference", rngs={"noise": jax.random.PRNGKey(2)}
    )
    assert out.shape == (B, T, D)
    assert np.isfinite(np.asarray(out)).all()

    from ensemble_svs_with_interactions_tpu.utils.config import instantiate

    netD = dict(cfg["netD"])
    if netD.get("in_dim") is None:
        netD["in_dim"] = D
    disc = instantiate(netD)
    dv = disc.init({"params": jax.random.PRNGKey(3)}, out, train=True)
    d_outs = disc.apply(dv, out, train=False)
    leaves = jax.tree_util.tree_leaves(d_outs)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def _shrink_vocoder(node):
    """Shrink vocoder network-size knobs for the contract test."""
    from collections.abc import Mapping

    if isinstance(node, Mapping):
        for k, v in list(node.items()):
            if k in ("residual_channels", "gate_channels", "skip_channels",
                     "channels", "conv_channels", "period_channels",
                     "max_downsample_channels") and isinstance(v, int) and v > 8:
                node[k] = 8
            elif k in ("blockA", "blockF", "cycleA", "cycleF", "layers",
                       "stacks", "conv_layers") and isinstance(v, int) and v > 2:
                node[k] = 2
            elif k == "resblock_kernel_sizes":
                node[k] = list(v)[:1]
            elif k == "resblock_dilations":
                node[k] = [list(d)[:2] for d in list(v)[:1]]
            elif k in ("periods", "fft_sizes", "hop_sizes", "win_lengths"):
                node[k] = list(v)[:1]
            elif k in ("upsample_scales", "upsample_kernel_sizes") and len(v) > 2:
                # suite diet: 2 upsample stages exercise the chain; the
                # full 240x ladder only multiplies compile time
                node[k] = list(v)[:2]
            else:
                _shrink_vocoder(v)


def _check_vocoder_config(cfg):
    """Vocoder configs carry model.generator + model.discriminator for
    bin/train_vocoder (reference: external parallel_wavegan/usfgan
    trainer YAMLs at recipe stages 11/13): instantiate both, run the
    generator with its signature-derived inputs, and run the
    discriminator on the generated waveform."""
    from ensemble_svs_with_interactions_tpu.train.vocoder import (
        generator_input_arity,
        generator_inputs,
    )

    gen_cfg = dict(cfg.model["generator"])
    disc_cfg = dict(cfg.model["discriminator"])
    _shrink_vocoder(gen_cfg)
    _shrink_vocoder(disc_cfg)
    gen = instantiate(gen_cfg)
    disc = instantiate(disc_cfg)

    hop = int(np.prod(gen_cfg["upsample_params"]["upsample_scales"])
              if "upsample_params" in gen_cfg
              else np.prod(gen_cfg["upsample_scales"]))
    Tf = 4
    aux = int(gen_cfg["aux_channels"])
    n_sig = len(cfg.model.get("signal_types", ["sine", "noise"]))
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(1, Tf * hop, n_sig)), jnp.float32),
        "c": jnp.asarray(rng.normal(size=(1, Tf, aux)), jnp.float32),
        "d": jnp.ones((1, Tf * hop)),
    }
    inputs = generator_inputs(batch, generator_input_arity(gen))
    v = gen.init(jax.random.PRNGKey(0), *inputs)
    outs = gen.apply(v, *inputs)
    wav = outs[0] if isinstance(outs, tuple) else outs
    assert wav.shape == (1, Tf * hop, 1)
    assert np.isfinite(np.asarray(wav)).all()

    dv = disc.init(jax.random.PRNGKey(1), wav)
    d_outs = disc.apply(dv, wav)
    leaves = jax.tree_util.tree_leaves(d_outs)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: str(p.relative_to(CONF_ROOT)))
def test_shipped_config_contract(path):
    # NOTE (suite-diet, measured 2026-08-20): running these eagerly via
    # jax.disable_jit() was tried and is a net LOSS (27 tests: 397 s
    # eager vs ~300 s jitted — the AR scans and vocoder conv stacks cost
    # more as Python loops than their XLA compiles). Keep jitted.
    cfg = load_config(path)
    if "model" in cfg and "generator" in (cfg.get("model") or {}):
        _check_vocoder_config(cfg)
        return
    _fill_lf0_stats(cfg)
    _shrink(cfg)
    # adjust encoder-dependent decoder in_dims after shrinking
    netG = cfg.netG
    if "encoder" in netG and netG.get("encoder") and "out_dim" in netG["encoder"]:
        enc_out = 16
        netG["encoder"]["out_dim"] = enc_out
        for k in ("mgc_model", "vuv_model", "bap_model", "mel_model"):
            if k in netG and netG[k]:
                netG[k]["in_dim"] = enc_out + 2

    module = instantiate(netG)
    B, T = 2, 16
    lengths = jnp.asarray([T, T])
    if "PostFilter" in netG["_target_"]:
        _check_postfilter_config(cfg, module, B, T, lengths)
        return
    in_dim = netG["in_dim"]
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "prenet": jax.random.PRNGKey(2),
        "zoneout": jax.random.PRNGKey(3),
        "diffusion": jax.random.PRNGKey(4),
    }
    rng = np.random.default_rng(0)
    is_multitrack = "MultiTrack" in netG["_target_"]
    out_dim = netG.get("out_dim", 1)
    y = jnp.zeros((B, T, sum(cfg.stream_sizes)))

    if is_multitrack and "spks_list" in str(
        module.__call__.__wrapped__.__code__.co_varnames
        if hasattr(module.__call__, "__wrapped__")
        else module.__call__.__code__.co_varnames
    ):
        x0 = jnp.asarray(rng.uniform(0, 1, (B, T, in_dim)), jnp.float32)
        x1 = jnp.asarray(rng.uniform(0, 1, (B, T, in_dim)), jnp.float32)
        spks = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32))
        v = module.init(rngs, x0, x1, spks, lengths, (y, y), train=True)
        out = module.apply(
            v, x0, x1, spks, lengths, method="inference",
            rngs={"prenet": jax.random.PRNGKey(9),
                  "diffusion": jax.random.PRNGKey(10)},
            mutable=["batch_stats"],
        )[0]
        assert np.isfinite(np.asarray(out[0])).all()
    elif is_multitrack:  # multitrack timing (concat input, spks tuple)
        x = jnp.asarray(rng.uniform(0, 1, (B, T, in_dim)), jnp.float32)
        spks = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32))
        v = module.init(rngs, x, spks, lengths, train=True)
        out = module.apply(v, x, spks, lengths, method="inference")
        assert np.isfinite(np.asarray(out[0])).all()
    elif "MultiSpeaker" in netG["_target_"]:
        x = jnp.asarray(rng.uniform(0, 1, (B, T, in_dim)), jnp.float32)
        spks = jnp.zeros((B,), jnp.int32)
        v = module.init(rngs, x, spks, lengths, y, train=True)
        out = module.apply(
            v, x, spks, lengths, method="inference",
            rngs={"prenet": jax.random.PRNGKey(9),
                  "diffusion": jax.random.PRNGKey(10)},
            mutable=["batch_stats"],
        )[0]
        flat = out[0] if isinstance(out, (tuple, list)) else out
        assert np.isfinite(np.asarray(flat)).all()
    else:
        x = jnp.asarray(rng.uniform(0, 1, (B, T, in_dim)), jnp.float32)
        # init teacher-forced: every model accepts y per the __call__
        # contract, and cascade wrappers with diffusion sub-decoders
        # REQUIRE it in the training path
        v = module.init(rngs, x, lengths, y, train=True)
        out = module.apply(
            v, x, lengths, method="inference",
            rngs={"prenet": jax.random.PRNGKey(9),
                  "diffusion": jax.random.PRNGKey(10)},
            mutable=["batch_stats"],
        )[0]
        flat = out[0] if isinstance(out, tuple) else out
        assert np.isfinite(np.asarray(flat)).all()


def test_config_tree_is_nonempty():
    assert len(ALL_CONFIGS) >= 10


def test_parse_overrides_values():
    from ensemble_svs_with_interactions_tpu.utils.config import parse_overrides

    cfg = parse_overrides(
        ["a.b=3", "a.c=0.5", "d=true", "e=null", "f=[1, 2]", "g=hello", "h="]
    )
    assert cfg["a"]["b"] == 3 and cfg["a"]["c"] == 0.5
    assert cfg["d"] is True and cfg["e"] is None
    assert list(cfg["f"]) == [1, 2]
    assert cfg["g"] == "hello"
    # `key=` clears to an empty string (not None) — Hydra grammar
    assert cfg["h"] == ""
