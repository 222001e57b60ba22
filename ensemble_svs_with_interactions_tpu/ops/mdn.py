"""Mixture density network primitives (JAX/flax).

Functional re-design of the reference's MDN machinery
(/root/reference/nnsvs/mdn.py:6,78,167,215): a linear projection to mixture
parameters, a clamped/logsumexp NLL, most-probable-component extraction, and
sampling.  All ops are pure jnp and fuse into surrounding XLA programs; the
(B, T, G, D) einsum-style reductions map onto the VPU/MXU.

Parameter convention: ``log_pi`` is (B, T, G) or — with ``dim_wise`` mixtures,
independent 1-D GMMs per output dim — (B, T, G, D).  ``log_sigma`` / ``mu``
are always (B, T, G, D).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453


class MDNLayer(nn.Module):
    """Project hidden features to MoG parameters with diagonal covariance.

    Attributes:
        out_dim: output feature dimension D.
        num_gaussians: number of mixture components G.
        dim_wise: model each output dim with an independent 1-D GMM.
    """

    out_dim: int
    num_gaussians: int = 30
    dim_wise: bool = False

    @nn.compact
    def __call__(self, x):
        B, T = x.shape[0], x.shape[1]
        G, D = self.num_gaussians, self.out_dim
        pi_dim = G * D if self.dim_wise else G
        raw_pi = nn.Dense(pi_dim, name="log_pi")(x)
        if self.dim_wise:
            raw_pi = raw_pi.reshape(B, T, G, D)
        log_pi = jax.nn.log_softmax(raw_pi, axis=2)
        log_sigma = nn.Dense(G * D, name="log_sigma")(x).reshape(B, T, G, D)
        mu = nn.Dense(G * D, name="mu")(x).reshape(B, T, G, D)
        return log_pi, log_sigma, mu


def mdn_loss(
    log_pi,
    log_sigma,
    mu,
    target,
    log_pi_min: float = -7.0,
    log_sigma_min: float = -7.0,
    reduce: bool = True,
):
    """Negative log-likelihood of a diagonal MoG.

    Numerics mirror the reference (/root/reference/nnsvs/mdn.py:78-153):
    log_sigma and log_pi are clamped from below, residuals are clipped to
    +/- 5 sigma, and mixture marginalization uses logsumexp.

    Returns (B,) if ``reduce`` else (B, T) (or (B, T, D) for dim_wise).
    """
    dim_wise = log_pi.ndim == 4
    log_sigma = jnp.maximum(log_sigma, log_sigma_min)
    log_pi = jnp.maximum(log_pi, log_pi_min)

    target = target[:, :, None, :]  # (B, T, 1, D)
    centered = target - mu
    scale = jnp.exp(log_sigma)
    edge = 5.0 * scale
    centered = jnp.clip(centered, -edge, edge)

    # log N(c; 0, scale^2) per dim
    log_prob = -0.5 * (_LOG_2PI + 2.0 * log_sigma + (centered / scale) ** 2)

    if dim_wise:
        joint = log_prob + log_pi  # (B, T, G, D)
    else:
        joint = jnp.sum(log_prob, axis=3) + log_pi  # (B, T, G)
    nll = -jax.scipy.special.logsumexp(joint, axis=2)

    if reduce:
        return jnp.mean(nll, axis=tuple(range(1, nll.ndim)))
    # (B, T), or (B, T, D) for dim_wise — callers mask with a
    # broadcastable (B, T, 1) frame mask
    return nll


def mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu):
    """Mean/stddev of the component with the largest mixture weight.

    Returns (sigma, mu), each (B, T, D).
    """
    dim_wise = log_pi.ndim == 4
    if dim_wise:
        # (B, T, G, D) -> argmax over G per dim
        idx = jnp.argmax(log_pi, axis=2)  # (B, T, D)
        max_mu = jnp.take_along_axis(mu, idx[:, :, None, :], axis=2)[:, :, 0, :]
        max_ls = jnp.take_along_axis(log_sigma, idx[:, :, None, :], axis=2)[
            :, :, 0, :
        ]
    else:
        idx = jnp.argmax(log_pi, axis=2)  # (B, T)
        one = idx[:, :, None, None]
        max_mu = jnp.take_along_axis(
            mu, jnp.broadcast_to(one, mu.shape[:2] + (1, mu.shape[3])), axis=2
        )[:, :, 0, :]
        max_ls = jnp.take_along_axis(
            log_sigma,
            jnp.broadcast_to(one, log_sigma.shape[:2] + (1, log_sigma.shape[3])),
            axis=2,
        )[:, :, 0, :]
    return jnp.exp(max_ls), max_mu


def mdn_get_sample(key, log_pi, log_sigma, mu):
    """Draw one sample from the most probable mixture component."""
    sigma, mean = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
    eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + sigma * eps
