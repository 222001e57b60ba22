"""Tests for MDN AR decoders, mel multistream, ResF0TransformerEncoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.models import acoustic
from ensemble_svs_with_interactions_tpu.models.tacotron import (
    MDNNonAttentiveDecoder,
    NonAttentiveDecoder,
)

B, T = 2, 16


def _rngs():
    return {
        "params": jax.random.PRNGKey(0),
        "prenet": jax.random.PRNGKey(1),
        "zoneout": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }


@pytest.mark.parametrize("r", [1, 2])
def test_nonattentive_decoder(r):
    dec = NonAttentiveDecoder(
        in_dim=8, out_dim=4, layers=1, hidden_dim=8,
        prenet_layers=1, prenet_hidden_dim=4, reduction_factor=r,
    )
    enc = jnp.zeros((B, T, 8))
    y = jnp.zeros((B, T, 4))
    v = dec.init(_rngs(), enc, None, y, train=True)
    out = dec.apply(v, enc, None, y, train=True,
                    rngs={"prenet": jax.random.PRNGKey(5),
                          "zoneout": jax.random.PRNGKey(6)})
    assert out.shape == (B, T, 4)
    inf = dec.apply(v, enc, method="inference",
                    rngs={"prenet": jax.random.PRNGKey(7)})
    assert inf.shape == (B, T, 4)


def test_mdn_resf0_decoder():
    dec = acoustic.MDNResF0NonAttentiveDecoder(
        in_dim=8, out_dim=3, layers=1, hidden_dim=8,
        prenet_layers=0, reduction_factor=2, num_gaussians=2,
        in_lf0_idx=0, out_lf0_idx=0,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
    )
    enc = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, T, 8)), jnp.float32)
    y = jnp.zeros((B, T, 3))
    v = dec.init(_rngs(), enc, None, y, train=True)
    (log_pi, log_sigma, mu), res = dec.apply(
        v, enc, None, y, train=True,
        rngs={"prenet": jax.random.PRNGKey(5), "zoneout": jax.random.PRNGKey(6)},
    )
    # dim_wise MDN (reference MDNLayer(dim_wise=True) in the AR decoders):
    # per-dimension mixture weights, residuals for ALL components
    assert log_pi.shape == (B, T, 2, 3)
    assert mu.shape == (B, T, 2, 3)
    assert res.shape == (B, T, 2)
    mu_i, sigma_i = dec.apply(
        v, enc, method="inference", rngs={"prenet": jax.random.PRNGKey(7)}
    )
    assert mu_i.shape == (B, T, 3)
    assert (np.asarray(sigma_i) > 0).all()


def test_mel_multistream_model():
    model = acoustic.MultistreamSeparateF0MelModel(
        in_dim=10,
        out_dim=8,
        stream_sizes=[6, 1, 1],
        reduction_factor=1,
        encoder={
            "_target_": "ensemble_svs_with_interactions_tpu.models.LSTMEncoder",
            "in_dim": 10, "hidden_dim": 4, "out_dim": 6,
        },
        mel_model={
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
            "in_dim": 8, "hidden_dim": 8, "out_dim": 6, "num_layers": 1,
        },
        lf0_model={
            "_target_": "ensemble_svs_with_interactions_tpu.models.acoustic.ResF0Conv1dResnet",
            "in_dim": 10, "hidden_dim": 8, "out_dim": 1, "num_layers": 1,
            "in_lf0_idx": 3, "out_lf0_idx": 0,
            "in_lf0_min": 5.0, "in_lf0_max": 6.5,
            "out_lf0_mean": 5.9, "out_lf0_scale": 0.23,
        },
        vuv_model={
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
            "in_dim": 8, "hidden_dim": 8, "out_dim": 1, "num_layers": 1,
        },
        in_rest_idx=0,
        in_lf0_idx=3,
        out_lf0_idx=6,
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, T, 10)), jnp.float32)
    y = jnp.zeros((B, T, 8))
    lengths = jnp.asarray([T, T])
    v = model.init(_rngs(), x, lengths, y, train=True)
    (streams, res) = model.apply(
        v, x, lengths, y, train=True, rngs={"dropout": jax.random.PRNGKey(4)}
    )
    assert len(streams) == 3
    inf = model.apply(v, x, lengths, method="inference")
    assert inf.shape == (B, T, 8)


def test_resf0_transformer_encoder():
    model = acoustic.ResF0TransformerEncoder(
        in_dim=10, out_dim=5, hidden_dim=8, attention_dim=8,
        num_heads=2, num_layers=1, reduction_factor=1,
        in_lf0_idx=3, out_lf0_idx=2,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, T, 10)), jnp.float32)
    lengths = jnp.asarray([T, T])
    v = model.init(_rngs(), x, lengths, train=True)
    mu, res = model.apply(v, x, lengths, train=True,
                          rngs={"dropout": jax.random.PRNGKey(4)})
    assert mu.shape == (B, T, 5)
    assert res.shape == (B, T, 1)
    out = model.apply(v, x, lengths, method="inference")
    assert out.shape == (B, T, 5)


def test_conv1d_resnet_mdn_alias():
    from ensemble_svs_with_interactions_tpu.models import Conv1dResnetMDN
    from ensemble_svs_with_interactions_tpu.base import PredictionType

    m = Conv1dResnetMDN(in_dim=8, hidden_dim=8, out_dim=4, num_layers=1,
                        num_gaussians=2)
    assert m.prediction_type() == PredictionType.PROBABILISTIC
    x = jnp.zeros((B, T, 8))
    v = m.init(_rngs(), x, None, train=True)
    mu, sigma = m.apply(v, x, method="inference")
    assert mu.shape == (B, T, 4) and sigma.shape == (B, T, 4)


@pytest.mark.parametrize("use_mdn", [False, True])
def test_bilstm_nonattentive_decoder(use_mdn):
    cls = (acoustic.BiLSTMMDNNonAttentiveDecoder if use_mdn
           else acoustic.BiLSTMNonAttentiveDecoder)
    dec = cls(
        in_dim=8, ff_hidden_dim=8, conv_hidden_dim=8, lstm_hidden_dim=4,
        num_lstm_layers=1, out_dim=3, decoder_layers=1, decoder_hidden_dim=8,
        prenet_layers=0, reduction_factor=1, num_gaussians=2,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 8)),
                    dtype=jnp.float32)
    y = jnp.zeros((B, T, 3))
    lengths = jnp.asarray([T, T - 4])
    v = dec.init(_rngs(), x, lengths, y, train=True)
    inf = dec.apply(
        v, x, lengths, method="inference",
        rngs={"prenet": jax.random.PRNGKey(7)},
    )
    if use_mdn:
        mu, sigma = inf
        assert mu.shape == (B, T, 3) and sigma.shape == (B, T, 3)
        assert np.isfinite(np.asarray(mu)).all()
    else:
        assert inf.shape == (B, T, 3)
        assert np.isfinite(np.asarray(inf)).all()


def test_bilstm_decoder_postnet_coarse_fine():
    """Post-Net decoders return [coarse, fine] in the forward pass
    (reference acoustic_models/tacotron.py:293-300) and serve the refined
    trajectory at inference; the Post-Net contribution must be a real
    (nonzero) residual."""
    dec = acoustic.BiLSTMNonAttentiveDecoder(
        in_dim=8, ff_hidden_dim=8, conv_hidden_dim=8, lstm_hidden_dim=4,
        num_lstm_layers=1, out_dim=3, decoder_layers=1, decoder_hidden_dim=8,
        prenet_layers=0, reduction_factor=2, downsample_by_conv=True,
        postnet_layers=2, postnet_channels=8, postnet_kernel_size=5,
        initial_value=-4.0, init_type="kaiming_normal",
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, 8)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, T, 3)), dtype=jnp.float32)
    lengths = jnp.asarray([T, T - 4])
    v = dec.init(_rngs(), x, lengths, y, train=True)
    outs, mut = dec.apply(
        v, x, lengths, y, train=True,
        rngs={"prenet": jax.random.PRNGKey(7),
              "zoneout": jax.random.PRNGKey(8),
              "dropout": jax.random.PRNGKey(9)},
        mutable=["batch_stats"],
    )
    assert isinstance(outs, list) and len(outs) == 2
    coarse, fine = outs
    assert coarse.shape == fine.shape == (B, T, 3)
    assert not np.allclose(np.asarray(coarse), np.asarray(fine))

    inf = dec.apply(
        v, x, lengths, method="inference",
        rngs={"prenet": jax.random.PRNGKey(7)},
    )
    assert inf.shape == (B, T, 3)
    assert np.isfinite(np.asarray(inf)).all()


def test_npss_deterministic_cascade_postnet_trains():
    """The deterministic NPSS cascade propagates [coarse, fine] stream
    outputs as a list of concatenated predictions and the deterministic
    loss supervises both (reference train_acoustic.py:145-149)."""
    from ensemble_svs_with_interactions_tpu.train import losses as L

    ss = [4, 1, 1, 2]
    net = acoustic.NPSSMultistreamParametricModel(
        in_dim=8, out_dim=8, stream_sizes=ss, reduction_factor=2,
        in_rest_idx=0, in_lf0_idx=5, out_lf0_idx=4,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
        vuv_model_bap_conditioning=False, vuv_model_mgc_conditioning=True,
        lf0_model=acoustic.BiLSTMResF0NonAttentiveDecoder(
            in_dim=8, out_dim=1, ff_hidden_dim=8, conv_hidden_dim=8,
            lstm_hidden_dim=4, num_lstm_layers=1, decoder_layers=1,
            decoder_hidden_dim=8, prenet_layers=0, reduction_factor=2,
            downsample_by_conv=True, in_lf0_idx=5, out_lf0_idx=0,
            in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9,
            out_lf0_scale=0.23, zoneout=0.0,
        ),
        mgc_model=acoustic.BiLSTMNonAttentiveDecoder(
            in_dim=9, out_dim=4, ff_hidden_dim=8, conv_hidden_dim=8,
            lstm_hidden_dim=4, num_lstm_layers=1, decoder_layers=1,
            decoder_hidden_dim=8, prenet_layers=0, reduction_factor=2,
            downsample_by_conv=True, postnet_layers=2, postnet_channels=8,
            initial_value=-4.0,
        ),
        bap_model=acoustic.BiLSTMNonAttentiveDecoder(
            in_dim=9, out_dim=2, ff_hidden_dim=8, conv_hidden_dim=8,
            lstm_hidden_dim=4, num_lstm_layers=1, decoder_layers=1,
            decoder_hidden_dim=8, prenet_layers=0, reduction_factor=2,
            downsample_by_conv=True,
        ),
        vuv_model=acoustic.BiLSTMNonAttentiveDecoder(
            in_dim=13, out_dim=1, ff_hidden_dim=8, conv_hidden_dim=8,
            lstm_hidden_dim=4, num_lstm_layers=1, decoder_layers=1,
            decoder_hidden_dim=8, prenet_layers=0, reduction_factor=2,
            downsample_by_conv=True,
        ),
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (B, T, 8)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, T, 8)), dtype=jnp.float32)
    lengths = jnp.asarray([T, T - 4])
    v = net.init(_rngs(), x, lengths, y, train=True)
    (pred, lf0_res), _ = net.apply(
        v, x, lengths, y, train=True,
        rngs={"prenet": jax.random.PRNGKey(7),
              "zoneout": jax.random.PRNGKey(8),
              "dropout": jax.random.PRNGKey(9)},
        mutable=["batch_stats"],
    )
    # mgc has a Post-Net -> list of 2 concatenated predictions
    assert isinstance(pred, list) and len(pred) == 2
    assert pred[0].shape == pred[1].shape == (B, T, 8)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None].astype(
        jnp.float32
    )
    loss = sum(
        L.feats_criterion(p, y, mask, "mse") for p in pred
    ) / len(pred)
    assert np.isfinite(float(loss))

    out = net.apply(
        v, x, lengths, method="inference",
        rngs={"prenet": jax.random.PRNGKey(7)},
    )
    assert out.shape == (B, T, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_ar_decoder_odd_length_inference():
    """AR inference on a length not divisible by the reduction factor:
    pads internally and trims, like the reference's pad_inference."""
    dec = acoustic.ResF0NonAttentiveDecoder(
        in_dim=8, out_dim=3, layers=1, hidden_dim=8,
        prenet_layers=0, reduction_factor=4,
        in_lf0_idx=0, out_lf0_idx=0,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
    )
    T_odd = 10
    enc = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (B, T_odd, 8)), jnp.float32
    )
    v = dec.init(_rngs(), enc, None, jnp.zeros((B, T_odd, 3)), train=False)
    out = dec.apply(
        v, enc, method="inference", rngs={"prenet": jax.random.PRNGKey(7)}
    )
    out = out[0] if isinstance(out, tuple) else out
    assert out.shape[1] == T_odd


def test_multistream_separate_f0_mdn_lf0():
    """MDN lf0 submodel in the SeparateF0 wrapper: inference conditions the
    stream decoders on (and outputs) the selected-mu lf0 trajectory."""
    model = acoustic.MultistreamSeparateF0ParametricModel(
        in_dim=10,
        out_dim=9,
        stream_sizes=[6, 1, 1, 1],
        reduction_factor=1,
        encoder={
            "_target_": "ensemble_svs_with_interactions_tpu.models.LSTMEncoder",
            "in_dim": 10, "hidden_dim": 4, "out_dim": 6,
        },
        lf0_model={
            "_target_": "ensemble_svs_with_interactions_tpu.models.acoustic.ResF0Conv1dResnet",
            "in_dim": 10, "hidden_dim": 8, "out_dim": 1, "num_layers": 1,
            "use_mdn": True, "num_gaussians": 2,
            "in_lf0_idx": 3, "out_lf0_idx": 0,
            "in_lf0_min": 5.0, "in_lf0_max": 6.5,
            "out_lf0_mean": 5.9, "out_lf0_scale": 0.23,
        },
        mgc_model={
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
            "in_dim": 8, "hidden_dim": 8, "out_dim": 6, "num_layers": 1,
        },
        vuv_model={
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
            "in_dim": 8, "hidden_dim": 8, "out_dim": 1, "num_layers": 1,
        },
        bap_model={
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
            "in_dim": 8, "hidden_dim": 8, "out_dim": 1, "num_layers": 1,
        },
        in_rest_idx=0,
        in_lf0_idx=3,
        out_lf0_idx=6,
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, T, 10)), jnp.float32)
    lengths = jnp.asarray([T, T])
    # NOTE: training this wrapper with an MDN lf0 submodel is unsupported in
    # the reference too (torch.cat over the MDN tuple, multistream.py:166);
    # only the inference path point-estimates the lf0.
    v = model.init(_rngs(), x, lengths)
    out = model.apply(v, x, lengths, method="inference")
    assert out.shape == (B, T, 9)
    assert np.isfinite(np.asarray(out)).all()
