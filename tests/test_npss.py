"""Tests for NPSS cascade models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.models import acoustic

IN, OUT = 20, 17
SS = [10, 1, 1, 5]
LF0_IDX = 5


def _resf0_lf0_cfg():
    return {
        "_target_": "ensemble_svs_with_interactions_tpu.models.acoustic.ResF0Conv1dResnet",
        "in_dim": IN,
        "hidden_dim": 8,
        "out_dim": 1,
        "num_layers": 1,
        "in_lf0_idx": LF0_IDX,
        "out_lf0_idx": 0,
        "in_lf0_min": 5.0,
        "in_lf0_max": 6.5,
        "out_lf0_mean": 5.9,
        "out_lf0_scale": 0.23,
    }


def _ffn(in_dim, out_dim, mdn=False):
    if mdn:
        return {
            "_target_": "ensemble_svs_with_interactions_tpu.models.MDN",
            "in_dim": in_dim,
            "hidden_dim": 8,
            "out_dim": out_dim,
            "num_gaussians": 2,
        }
    return {
        "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
        "in_dim": in_dim,
        "hidden_dim": 8,
        "out_dim": out_dim,
        "num_layers": 1,
    }


def _rngs():
    return {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
    }


def test_npss_deterministic():
    model = acoustic.NPSSMultistreamParametricModel(
        in_dim=IN,
        out_dim=OUT,
        stream_sizes=SS,
        reduction_factor=1,
        lf0_model=_resf0_lf0_cfg(),
        mgc_model=_ffn(IN + 1, 10),
        bap_model=_ffn(IN + 1, 5),
        vuv_model=_ffn(IN + 1 + 5, 1),
        in_lf0_idx=LF0_IDX,
        out_lf0_idx=10,
    )
    B, T = 2, 12
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, T, IN)), jnp.float32)
    y = jnp.zeros((B, T, OUT))
    lengths = jnp.asarray([T, T])
    v = model.init(_rngs(), x, lengths, y, train=True)
    out, res = model.apply(v, x, lengths, y, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    assert out.shape == (B, T, OUT)
    assert res.shape == (B, T, 1)
    inf = model.apply(v, x, lengths, method="inference")
    assert inf.shape == (B, T, OUT)


def test_npss_mdn():
    model = acoustic.NPSSMDNMultistreamParametricModel(
        in_dim=IN,
        out_dim=OUT,
        stream_sizes=SS,
        reduction_factor=1,
        lf0_model=_resf0_lf0_cfg(),
        mgc_model=_ffn(IN + 1, 10, mdn=True),
        bap_model=_ffn(IN + 1, 5, mdn=True),
        vuv_model=_ffn(IN + 1 + 5, 1),
        in_lf0_idx=LF0_IDX,
        out_lf0_idx=10,
    )
    B, T = 2, 12
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, T, IN)), jnp.float32)
    y = jnp.zeros((B, T, OUT))
    lengths = jnp.asarray([T, T])
    v = model.init(_rngs(), x, lengths, y, train=True)
    (streams, res) = model.apply(v, x, lengths, y, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)})
    mgc, lf0, vuv, bap = streams
    assert isinstance(mgc, tuple) and len(mgc) == 3  # MDN params
    assert lf0.shape == (B, T, 1)
    inf = model.apply(v, x, lengths, method="inference")
    assert inf.shape == (B, T, OUT)


def test_multitrack_npss():
    model = acoustic.MultiTrackNPSSMDNMultistreamParametricModel(
        in_dim=IN,
        out_dim=OUT,
        stream_sizes=SS,
        reduction_factor=2,
        lf0_model={
            "_target_": "ensemble_svs_with_interactions_tpu.models.acoustic.MultiTrackBiLSTMResF0NonAttentiveDecoder",
            "in_dim": IN,
            "out_dim": 1,
            "ff_hidden_dim": 8,
            "conv_hidden_dim": 8,
            "lstm_hidden_dim": 4,
            "num_lstm_layers": 1,
            "decoder_layers": 1,
            "decoder_hidden_dim": 8,
            "prenet_layers": 0,
            "reduction_factor": 2,
            "downsample_by_conv": True,
            "in_lf0_idx": LF0_IDX,
            "out_lf0_idx": 0,
            "in_lf0_min": 5.0,
            "in_lf0_max": 6.5,
            "out_lf0_mean": 5.9,
            "out_lf0_scale": 0.23,
        },
        mgc_model=_ffn(IN + 1, 10, mdn=True),
        bap_model=_ffn(IN + 1, 5, mdn=True),
        vuv_model=_ffn(IN + 1 + 5, 1),
        speaker_embedding={
            "_target_": "ensemble_svs_with_interactions_tpu.models.SpeakerEmbedding",
            "num_embeddings": 2,
            "embedding_dim": IN,
        },
        in_lf0_idx=LF0_IDX,
        out_lf0_idx=10,
        output_subtrack=True,
    )
    B, T = 2, 12
    rng = np.random.default_rng(0)
    xm = jnp.asarray(rng.uniform(0, 1, (B, T, IN)), jnp.float32)
    xs = jnp.asarray(rng.uniform(0, 1, (B, T, IN)), jnp.float32)
    spks = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32))
    lengths = jnp.asarray([T, T])
    ys = (jnp.zeros((B, T, OUT)), jnp.zeros((B, T, OUT)))
    rngs = {**_rngs(), "prenet": jax.random.PRNGKey(2), "zoneout": jax.random.PRNGKey(3)}
    v = model.init(rngs, xm, xs, spks, lengths, ys, train=True)
    (sm, rm), (ss_, rs) = model.apply(
        v, xm, xs, spks, lengths, ys, train=True,
        rngs={"dropout": jax.random.PRNGKey(4), "prenet": jax.random.PRNGKey(5),
              "zoneout": jax.random.PRNGKey(6)},
        mutable=["batch_stats"],
    )[0]
    assert len(sm) == 4 and len(ss_) == 4
    assert rm.shape == (B, T, 1)
    out_m, out_s = model.apply(
        v, xm, xs, spks, lengths, method="inference",
        rngs={"prenet": jax.random.PRNGKey(7)},
    )
    assert out_m.shape == (B, T, OUT)
    assert out_s.shape == (B, T, OUT)


def test_npss_mdn_lf0_inference():
    """Probabilistic lf0 submodel: downstream streams condition on the
    point estimate at inference (reference multistream.py:1151-1157)."""
    lf0_cfg = {**_resf0_lf0_cfg(), "use_mdn": True, "num_gaussians": 2}
    model = acoustic.NPSSMDNMultistreamParametricModel(
        in_dim=IN,
        out_dim=OUT,
        stream_sizes=SS,
        reduction_factor=1,
        lf0_model=lf0_cfg,
        mgc_model=_ffn(IN + 1, 10, mdn=True),
        bap_model=_ffn(IN + 1, 5, mdn=True),
        vuv_model=_ffn(IN + 1 + 5, 1),
        in_lf0_idx=LF0_IDX,
        out_lf0_idx=10,
    )
    B, T = 2, 12
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, T, IN)), jnp.float32)
    y = jnp.zeros((B, T, OUT))
    lengths = jnp.asarray([T, T])
    v = model.init(_rngs(), x, lengths, y, train=True)
    (streams, res) = model.apply(v, x, lengths, y, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)})
    assert isinstance(streams[1], tuple) and len(streams[1]) == 3
    inf = model.apply(v, x, lengths, method="inference")
    assert inf.shape == (B, T, OUT)
    assert np.isfinite(np.asarray(inf)).all()
