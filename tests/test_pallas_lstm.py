"""Pallas LSTM recurrence: numeric parity with the flax scan path."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.ops.pallas_lstm import (
    lstm_layer_pallas,
)


def test_pallas_lstm_matches_flax_cell():
    B, T, C, H = 2, 32, 12, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))

    cell = nn.OptimizedLSTMCell(H)
    carry0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    v = cell.init(jax.random.PRNGKey(0), carry0, x[:, 0])

    # reference: unrolled flax cell
    carry = carry0
    ys = []
    for t in range(T):
        carry, y = cell.apply(v, carry, x[:, t])
        ys.append(y)
    ref = jnp.stack(ys, axis=1)

    got = lstm_layer_pallas(x, v["params"], chunk=16, interpret=True)
    assert got.shape == (B, T, H)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5), (
        np.abs(np.asarray(got) - np.asarray(ref)).max()
    )


def test_pallas_lstm_odd_length_pads_chunk():
    """An awkward T (no power-of-two divisor) must pad up to the chunk
    multiple, not degenerate to one-frame blocks — and stay exact."""
    B, T, C, H = 2, 29, 12, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))

    cell = nn.OptimizedLSTMCell(H)
    carry0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    v = cell.init(jax.random.PRNGKey(0), carry0, x[:, 0])

    carry = carry0
    ys = []
    for t in range(T):
        carry, y = cell.apply(v, carry, x[:, t])
        ys.append(y)
    ref = jnp.stack(ys, axis=1)

    got = lstm_layer_pallas(x, v["params"], chunk=16, interpret=True)
    assert got.shape == (B, T, H)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
