"""Shared model-testing harness (pattern from reference tests/util.py:6-48)."""

import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.base import PredictionType


def make_batch(B=2, T=32, in_dim=82, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, in_dim)).astype(np.float32))
    lengths = jnp.asarray(sorted(rng.integers(T // 2, T + 1, size=B), reverse=True))
    return x, lengths


def run_model_contract(model, x, lengths, out_dim, extra_args=(), y=None):
    """Init + forward + inference; assert output shapes per prediction type.

    Returns (variables, forward_out, inference_out).
    """
    B, T = x.shape[0], x.shape[1]
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": jax.random.PRNGKey(1)},
        x,
        *extra_args,
        lengths,
        train=True,
    )
    fwd = model.apply(
        variables,
        x,
        *extra_args,
        lengths,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )[0]
    ptype = model.prediction_type()
    if ptype == PredictionType.PROBABILISTIC:
        log_pi, log_sigma, mu = fwd
        G = model.num_gaussians
        assert mu.shape == (B, T, G, out_dim)
        assert log_sigma.shape == (B, T, G, out_dim)
        assert log_pi.shape[2] == G
        inf = model.apply(variables, x, *extra_args, lengths, method="inference")
        mu_i, sigma_i = inf
        assert mu_i.shape == (B, T, out_dim)
        assert sigma_i.shape == (B, T, out_dim)
        assert np.isfinite(np.asarray(mu_i)).all()
    else:
        assert fwd.shape == (B, T, out_dim), fwd.shape
        inf = model.apply(variables, x, *extra_args, lengths, method="inference")
        assert inf.shape == (B, T, out_dim)
        assert np.isfinite(np.asarray(inf)).all()
    return variables, fwd, inf
