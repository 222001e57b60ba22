"""Tests for acoustic models (mirrors reference tests/test_acoustic_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.models import acoustic
from tests.util import make_batch

IN_DIM, OUT_DIM = 86, 67
IN_LF0_IDX, OUT_LF0_IDX = 51, 60


def _run_resf0_contract(model, use_mdn, B=2, T=16):
    x, lengths = make_batch(B=B, T=T, in_dim=IN_DIM)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lengths, train=True,
    )
    out = model.apply(
        variables, x, lengths, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )[0]
    if use_mdn:
        (log_pi, log_sigma, mu), lf0_residual = out
        G = model.num_gaussians
        assert mu.shape == (B, T, G, OUT_DIM)
        assert lf0_residual.shape == (B, T, G)
        mu_i, sigma_i = model.apply(variables, x, lengths, method="inference")
        assert mu_i.shape == (B, T, OUT_DIM)
        assert sigma_i.shape == (B, T, OUT_DIM)
    else:
        mu, lf0_residual = out
        assert mu.shape == (B, T, OUT_DIM)
        assert lf0_residual.shape == (B, T, 1)
        out_i = model.apply(variables, x, lengths, method="inference")
        assert out_i.shape == (B, T, OUT_DIM)
    assert model.has_residual_lf0_prediction()
    # residual bounded by scaled tanh: |res| <= 600 cents in log space
    max_ratio = 600 * np.log(2) / 1200
    assert np.abs(np.asarray(lf0_residual)).max() <= max_ratio + 1e-6


@pytest.mark.parametrize("use_mdn", [False, True])
def test_res_skip_f0_ffconvlstm(use_mdn):
    model = acoustic.ResSkipF0FFConvLSTM(
        in_dim=IN_DIM,
        ff_hidden_dim=8,
        conv_hidden_dim=8,
        lstm_hidden_dim=4,
        out_dim=OUT_DIM,
        in_lf0_idx=IN_LF0_IDX,
        out_lf0_idx=OUT_LF0_IDX,
        use_mdn=use_mdn,
        num_gaussians=2,
        skip_inputs=True,
    )
    _run_resf0_contract(model, use_mdn)


@pytest.mark.parametrize("use_mdn", [False, True])
def test_resf0_conv1d_resnet(use_mdn):
    model = acoustic.ResF0Conv1dResnet(
        in_dim=IN_DIM,
        hidden_dim=8,
        out_dim=OUT_DIM,
        num_layers=2,
        in_lf0_idx=IN_LF0_IDX,
        out_lf0_idx=OUT_LF0_IDX,
        use_mdn=use_mdn,
        num_gaussians=2,
    )
    _run_resf0_contract(model, use_mdn)


@pytest.mark.parametrize("use_mdn", [False, True])
def test_resf0_variance_predictor(use_mdn):
    model = acoustic.ResF0VariancePredictor(
        in_dim=IN_DIM,
        out_dim=OUT_DIM,
        num_layers=2,
        hidden_dim=8,
        in_lf0_idx=IN_LF0_IDX,
        out_lf0_idx=OUT_LF0_IDX,
        use_mdn=use_mdn,
        num_gaussians=2,
    )
    _run_resf0_contract(model, use_mdn)


def test_predict_lf0_with_residual_bounds():
    B, T, D = 2, 8, 67
    rng = np.random.default_rng(0)
    in_feats = jnp.asarray(rng.uniform(0, 1, (B, T, IN_DIM)).astype(np.float32))
    out_feats = jnp.asarray(
        (rng.normal(size=(B, T, D)) * 100).astype(np.float32)
    )  # huge residuals
    lf0_pred, lf0_res = acoustic.predict_lf0_with_residual(
        in_feats, out_feats,
        in_lf0_idx=IN_LF0_IDX, in_lf0_min=5.0, in_lf0_max=6.5,
        out_lf0_idx=OUT_LF0_IDX, out_lf0_mean=5.9, out_lf0_scale=0.23,
    )
    max_ratio = 600 * np.log(2) / 1200
    assert np.abs(np.asarray(lf0_res)).max() <= max_ratio + 1e-6
    # round trip: denormalized prediction = score + residual
    denorm = np.asarray(lf0_pred) * 0.23 + 5.9
    score = np.asarray(in_feats[:, :, IN_LF0_IDX])[..., None] * 1.5 + 5.0
    assert np.allclose(denorm, score + np.asarray(lf0_res), atol=1e-5)


def test_ar_decoder_residual_self_consistent_no_scaled_tanh():
    """With scaled_tanh=False the returned lf0_residual must satisfy
    outs_lf0 = (score_denorm + residual - mean) / scale — i.e. be the
    residual the outputs were actually built from.  Guards OUR correct
    semantics: the reference's scaled_tanh=False path returns a VIEW of
    the in-place-mutated output tensor, so it returns the normalized
    prediction as "residual" (reference acoustic_models/tacotron_f0.py:
    204-218 aliasing; see PARITY.md "AR parity under chaos")."""
    from ensemble_svs_with_interactions_tpu.models.acoustic import (
        BiLSTMResF0NonAttentiveDecoder,
    )

    B, T, IN = 1, 12, 10
    kw = dict(
        in_dim=IN, ff_hidden_dim=7, conv_hidden_dim=6, lstm_hidden_dim=4,
        num_lstm_layers=1, out_dim=1, decoder_layers=1,
        decoder_hidden_dim=9, prenet_layers=0, prenet_dropout=0.0,
        zoneout=0.0, reduction_factor=1, downsample_by_conv=False,
        scaled_tanh=False, in_lf0_idx=5, out_lf0_idx=0,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9,
        out_lf0_scale=0.23,
    )
    model = BiLSTMResF0NonAttentiveDecoder(**kw)
    rng = np.random.default_rng(3)
    x = (rng.normal(size=(B, T, IN)) * 0.3).astype(np.float32)
    x[:, :, 5] = rng.uniform(0.3, 0.7, (B, T)).astype(np.float32)
    y = (rng.normal(size=(B, T, 1)) * 0.1).astype(np.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "prenet": jax.random.PRNGKey(2), "zoneout": jax.random.PRNGKey(3)},
        jnp.asarray(x), jnp.asarray([T]), jnp.asarray(y), train=True,
    )
    outs, res = model.apply(
        v, jnp.asarray(x), jnp.asarray([T]), jnp.asarray(y),
        rngs={"prenet": jax.random.PRNGKey(9),
              "zoneout": jax.random.PRNGKey(10)},
    )
    denorm = x[:, :, 5:6] * (6.5 - 5.0) + 5.0
    implied_res = np.asarray(outs)[..., :1] * 0.23 + 5.9 - denorm
    np.testing.assert_allclose(np.asarray(res), implied_res, atol=1e-4)
    # and without the tanh bound, residuals are NOT clamped to the
    # 600-cent ratio by construction (they're the raw head output)
    assert res.shape == (B, T, 1)
