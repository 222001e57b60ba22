"""Tests for the generic model zoo (mirrors reference tests/test_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu import models
from ensemble_svs_with_interactions_tpu.models.layers import (
    LSTM,
    TrTimeInvFIRFilter,
    reverse_padded,
)
from tests.util import make_batch, run_model_contract

IN_DIM, OUT_DIM = 82, 3


def test_ffn():
    x, lengths = make_batch(in_dim=IN_DIM)
    model = models.FFN(IN_DIM, 16, OUT_DIM, num_layers=2, dropout=0.1)
    run_model_contract(model, x, lengths, OUT_DIM)


def test_lstmrnn():
    x, lengths = make_batch(in_dim=IN_DIM)
    model = models.LSTMRNN(IN_DIM, 8, OUT_DIM, num_layers=2, bidirectional=True)
    run_model_contract(model, x, lengths, OUT_DIM)


@pytest.mark.parametrize("dim_wise", [False, True])
def test_mdn_models(dim_wise):
    x, lengths = make_batch(in_dim=IN_DIM)
    for cls in (models.MDN, models.MDNv2, models.RMDN):
        model = cls(IN_DIM, 8, OUT_DIM, num_gaussians=2, dim_wise=dim_wise)
        run_model_contract(model, x, lengths, OUT_DIM)


@pytest.mark.parametrize("use_mdn", [False, True])
def test_conv1d_resnet(use_mdn):
    x, lengths = make_batch(in_dim=IN_DIM)
    model = models.Conv1dResnet(
        IN_DIM, 8, OUT_DIM, num_layers=2, use_mdn=use_mdn, num_gaussians=2
    )
    run_model_contract(model, x, lengths, OUT_DIM)


def test_conv1d_resnet_with_phoneme_embedding():
    x, lengths = make_batch(in_dim=IN_DIM)
    # make the phoneme block one-hot
    x = np.array(x)
    x[:, :, 1:50] = 0.0
    x[:, :, 5] = 1.0
    model = models.Conv1dResnet(IN_DIM, 8, OUT_DIM, num_layers=1, embed_dim=16)
    run_model_contract(model, jnp.asarray(x), lengths, OUT_DIM)


@pytest.mark.parametrize("use_mdn", [False, True])
def test_ffconvlstm(use_mdn):
    x, lengths = make_batch(in_dim=IN_DIM)
    model = models.FFConvLSTM(
        in_dim=IN_DIM,
        ff_hidden_dim=8,
        conv_hidden_dim=8,
        lstm_hidden_dim=4,
        out_dim=OUT_DIM,
        use_mdn=use_mdn,
        dim_wise=True,
        num_gaussians=2,
    )
    run_model_contract(model, x, lengths, OUT_DIM)


@pytest.mark.parametrize("use_mdn", [False, True])
def test_variance_predictor(use_mdn):
    x, lengths = make_batch(in_dim=IN_DIM)
    model = models.VariancePredictor(
        IN_DIM, OUT_DIM, num_layers=2, hidden_dim=8,
        use_mdn=use_mdn, num_gaussians=2,
    )
    run_model_contract(model, x, lengths, OUT_DIM)


def test_multitrack_variance_predictor():
    x, lengths = make_batch(in_dim=2 * IN_DIM)
    spks = (jnp.zeros((2,), jnp.int32), jnp.ones((2,), jnp.int32))
    model = models.MultiTrackVariancePredictor(
        in_dim=2 * IN_DIM,
        out_dim=OUT_DIM,
        num_speaker=4,
        spk_embed_dim=8,
        num_layers=2,
        hidden_dim=8,
        use_mdn=True,
        num_gaussians=2,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, spks, lengths, train=True,
    )
    mu, sigma = model.apply(variables, x, spks, lengths, method="inference")
    assert mu.shape == (2, x.shape[1], OUT_DIM)
    assert (np.asarray(sigma) > 0).all()


def test_lstm_encoder():
    x, lengths = make_batch(in_dim=IN_DIM)
    model = models.LSTMEncoder(IN_DIM, 8, OUT_DIM, embed_dim=None)
    run_model_contract(model, x, lengths, OUT_DIM)


def test_multitrack_lstm_encoder():
    x, lengths = make_batch(in_dim=IN_DIM)
    x2, _ = make_batch(in_dim=IN_DIM, seed=1)
    spk_embs = (jnp.zeros((2, x.shape[1], IN_DIM)), jnp.zeros((2, x.shape[1], IN_DIM)))
    model = models.MultiTrackLSTMEncoder(IN_DIM, 8, OUT_DIM)
    variables = model.init(
        jax.random.PRNGKey(0), x, x2, spk_embs, lengths
    )
    out = model.apply(variables, x, x2, spk_embs, lengths)
    assert out.shape == (2, x.shape[1], OUT_DIM)


@pytest.mark.parametrize("reduction_factor", [1, 2])
def test_transformer_encoder(reduction_factor):
    x, lengths = make_batch(T=32, in_dim=IN_DIM)
    model = models.TransformerEncoder(
        in_dim=IN_DIM,
        out_dim=OUT_DIM,
        hidden_dim=8,
        attention_dim=8,
        num_heads=2,
        num_layers=1,
        reduction_factor=reduction_factor,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lengths, train=True,
    )
    out = model.apply(variables, x, lengths)
    assert out.shape[0] == 2 and out.shape[2] == OUT_DIM
    # output length is a multiple of reduction factor handling
    assert out.shape[1] == (x.shape[1] // reduction_factor) * reduction_factor


def test_speaker_embedding():
    model = models.SpeakerEmbedding(num_embeddings=4, embedding_dim=8, padding_idx=0)
    spks = jnp.asarray([0, 1, 2])
    variables = model.init(jax.random.PRNGKey(0), spks)
    emb = model.apply(variables, spks)
    assert emb.shape == (3, 8)
    assert np.allclose(np.asarray(emb[0]), 0.0)  # padding idx zeroed
    assert not np.allclose(np.asarray(emb[1]), 0.0)


def test_sar_models_roundtrip():
    """Shallow-AR: preprocess_target then inverse must round-trip."""
    x, lengths = make_batch(in_dim=IN_DIM)
    model = models.LSTMRNNSAR(
        IN_DIM, 8, 6, stream_sizes=(3, 3), ar_orders=(2, 3)
    )
    y = jnp.asarray(np.random.default_rng(0).normal(size=(2, x.shape[1], 6)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, lengths)
    y_filt = model.apply(variables, y, method="preprocess_target")
    assert y_filt.shape == y.shape

    out = model.apply(variables, x, lengths, method="inference")
    assert out.shape == (2, x.shape[1], 6)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------- layer-level
def test_reverse_padded():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(2, 6, 1))
    lengths = jnp.asarray([4, 6])
    r = np.asarray(reverse_padded(x, lengths))[:, :, 0]
    assert r[0, :4].tolist() == [3, 2, 1, 0]
    assert r[1].tolist() == [11, 10, 9, 8, 7, 6]


def test_lstm_masking_matches_unpadded():
    """A padded batch entry must produce the same output as unpadded input."""
    rng = np.random.default_rng(0)
    T, D = 10, 4
    x_short = rng.normal(size=(1, 6, D)).astype(np.float32)
    x_pad = np.zeros((1, T, D), np.float32)
    x_pad[:, :6] = x_short

    model = LSTM(5, num_layers=1, bidirectional=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_pad), jnp.asarray([6]))
    out_pad = model.apply(variables, jnp.asarray(x_pad), jnp.asarray([6]))
    out_short = model.apply(variables, jnp.asarray(x_short), jnp.asarray([6]))
    assert np.allclose(np.asarray(out_pad)[:, :6], np.asarray(out_short), atol=1e-5)
    # padded tail is zero
    assert np.allclose(np.asarray(out_pad)[:, 6:], 0.0)


def test_fir_filter_noncausal_centered():
    """Non-causal mode centers the filter window: y[t] = Σ b_k x[t−k+p]
    with p=(K−1)//2 (reference nnsvs/dsp.py:110-138 symmetric Conv1d
    padding, untrimmed output)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 12, 2)).astype(np.float32))
    filt = TrTimeInvFIRFilter(2, 5, causal=False, tanh=False, fixed_0th=False)
    variables = filt.init(jax.random.PRNGKey(0), x)
    y = np.asarray(filt.apply(variables, x))
    b = np.asarray(
        filt.apply(variables, method="coefs")
    )  # (C, K)
    xn = np.asarray(x)[0]
    # centered FIR == np.convolve 'same' (odd K) per channel
    for c in range(2):
        expect = np.convolve(xn[:, c], b[c], mode="same")
        np.testing.assert_allclose(y[0, :, c], expect, atol=1e-5)


def test_fir_filter_inverse_roundtrip():
    """FIR analysis then IIR inverse must recover the input."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 20, 3)).astype(np.float32))
    filt = TrTimeInvFIRFilter(3, 4)
    variables = filt.init(jax.random.PRNGKey(0), x)
    y = filt.apply(variables, x)
    x_rec = filt.apply(variables, y, method="inverse")
    assert np.allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_pinned_checkpoint_compat():
    """A serialized-parameter file written by an earlier revision must
    keep restoring bit-exactly (the reference's tests/test_compat.py
    pattern with a pinned mdn_test.pth)."""
    from pathlib import Path

    from flax import serialization

    from ensemble_svs_with_interactions_tpu.models import MDN

    data = Path(__file__).parent / "data"
    m = MDN(in_dim=6, hidden_dim=8, out_dim=2, num_gaussians=2)
    template = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 4, 6)),
        jnp.asarray([4]),
    )
    variables = serialization.from_bytes(
        template, (data / "pinned_mdn.params").read_bytes()
    )
    io = np.load(data / "pinned_mdn_io.npz")
    mu, sigma = m.apply(variables, jnp.asarray(io["x"]), method="inference")
    np.testing.assert_allclose(np.asarray(mu), io["mu"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma), io["sigma"], rtol=1e-6)
