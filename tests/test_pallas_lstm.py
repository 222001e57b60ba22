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


def _flax_lstm_ref(x, params):
    """Reference LSTM layer: flax cell scanned in python (differentiable)."""
    cell = nn.OptimizedLSTMCell(
        params["hi"]["kernel"].shape[1]
    )
    B = x.shape[0]
    H = params["hi"]["kernel"].shape[1]
    carry = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    ys = []
    for t in range(x.shape[1]):
        carry, y = cell.apply({"params": params}, carry, x[:, t])
        ys.append(y)
    return jnp.stack(ys, axis=1)


def test_pallas_lstm_trainable_forward_and_grads():
    """The custom-VJP pallas layer must match the flax scan in VALUE and
    in GRADIENTS w.r.t. the input and every cell parameter (the backward
    kernel recomputes gates and runs reverse-time BPTT — see
    _lstm_bwd_kernel)."""
    from ensemble_svs_with_interactions_tpu.ops.pallas_lstm import (
        lstm_layer_pallas_trainable,
    )

    B, T, C, H = 2, 24, 6, 8
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    dy_w = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))

    cell = nn.OptimizedLSTMCell(H)
    carry0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    v = cell.init(jax.random.PRNGKey(0), carry0, x[:, 0])
    params = v["params"]

    def loss_ref(params, x):
        return jnp.sum(_flax_lstm_ref(x, params) * dy_w)

    def loss_pallas(params, x):
        y = lstm_layer_pallas_trainable(x, params, chunk=8, interpret=True)
        return jnp.sum(y * dy_w)

    ref_val, (ref_gp, ref_gx) = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        params, x
    )
    got_val, (got_gp, got_gx) = jax.value_and_grad(
        loss_pallas, argnums=(0, 1)
    )(params, x)

    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_gx), np.asarray(ref_gx), atol=2e-5
    )
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_gp)[0]
    flat_got = {jax.tree_util.keystr(p): np.asarray(g)
                for p, g in jax.tree_util.tree_flatten_with_path(got_gp)[0]}
    for path, g_ref in flat_ref:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            flat_got[key], np.asarray(g_ref), atol=2e-5, err_msg=key
        )


def test_pallas_lstm_trainable_odd_length():
    """Padding path of the trainable layer: gradients for a T that is
    not a chunk multiple must not leak from the padded tail."""
    from ensemble_svs_with_interactions_tpu.ops.pallas_lstm import (
        lstm_layer_pallas_trainable,
    )

    B, T, C, H = 1, 13, 5, 8
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))

    cell = nn.OptimizedLSTMCell(H)
    carry0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    v = cell.init(jax.random.PRNGKey(0), carry0, x[:, 0])
    params = v["params"]

    def loss_ref(x):
        return jnp.sum(_flax_lstm_ref(x, params) ** 2)

    def loss_pallas(x):
        y = lstm_layer_pallas_trainable(x, params, chunk=8, interpret=True)
        return jnp.sum(y ** 2)

    np.testing.assert_allclose(
        float(loss_pallas(x)), float(loss_ref(x)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pallas)(x)),
        np.asarray(jax.grad(loss_ref)(x)),
        atol=2e-5,
    )
