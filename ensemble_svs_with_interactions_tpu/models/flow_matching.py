"""Conditional flow-matching acoustic decoder (rectified flow).

Beyond-reference model family: the reference's generative decoder is the
DiffSinger DDPM (diffsinger/diffusion.py); flow matching (Lipman et al.
2023; rectified flow, Liu et al. 2023; used for SVS by TechSinger,
arXiv:2502.12572) trains the same WaveNet-style network to predict the
constant velocity of the straight noise->data path and samples by
integrating an ODE — typically 4-10 network evaluations, against 100
ancestral DDPM steps, with no stochastic sampling loop.

The class is contract-compatible with :class:`GaussianDiffusion`:
``PredictionType.DIFFUSION`` (training returns a ``(target, prediction)``
pair scored with the masked feats criterion — train/loop.py:368), same
``__call__(cond, lengths, y, train)`` / ``inference(cond, lengths)``
signatures, same ``norm_scale`` convention, so it drops into every
multistream/NPSS composite and recipe slot that accepts a diffusion
decoder.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ensemble_svs_with_interactions_tpu.base import BaseModel, PredictionType


class FlowMatching(BaseModel):
    """Rectified-flow decoder over acoustic features.

    Training: t ~ U(0,1), x_t = (1-t) x0 + t x1 with x0 ~ N(0, I) and
    x1 = y / norm_scale; the network v(x_t, t, cond) regresses the
    straight-path velocity x1 - x0.  Inference integrates dx/dt = v from
    t=0 to t=1 with a fixed-step Euler or midpoint scheme as a lax.scan.

    ``denoise_fn`` (kept for config-name parity with GaussianDiffusion)
    is the vector-field network — any module with the DiffNet signature
    ``(spec, step, cond)``; the continuous time is fed as
    ``t * time_scale`` into its sinusoidal step embedding.
    """

    in_dim: int
    out_dim: int
    denoise_fn: Any  # config dict or module (vector field)
    encoder: Any = None
    norm_scale: float = 10.0
    sampling_steps: int = 8
    solver: str = "midpoint"  # or "euler"
    time_scale: float = 1000.0

    def setup(self):
        from ensemble_svs_with_interactions_tpu.models.acoustic.multistream import (
            _maybe_instantiate,
        )

        self._vf = _maybe_instantiate(self.denoise_fn)
        self._encoder = _maybe_instantiate(self.encoder)
        if self.solver not in ("euler", "midpoint"):
            raise ValueError(f"unknown ODE solver: {self.solver}")

    def prediction_type(self):
        return PredictionType.DIFFUSION

    def _cond(self, cond, lengths, spk_embs, train):
        if self._encoder is not None:
            if spk_embs is not None:
                cond = self._encoder(
                    cond, lengths, spk_embs=spk_embs, train=train
                )
            else:
                cond = self._encoder(cond, lengths, train=train)
        return cond

    def __call__(
        self, cond, lengths=None, y=None, spk_embs=None, train: bool = False
    ):
        B = cond.shape[0]
        cond = self._cond(cond, lengths, spk_embs, train)
        rng = self.make_rng("diffusion")
        k_t, k_noise = jax.random.split(rng)
        t = jax.random.uniform(k_t, (B,))
        x1 = y / self.norm_scale
        x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
        x_t = (1.0 - t)[:, None, None] * x0 + t[:, None, None] * x1
        v_target = x1 - x0
        v_pred = self._vf(x_t, t * self.time_scale, cond)
        # (target, prediction) pair scored by the DIFFUSION branch of the
        # trainers (train/loop.py:368: criterion(x_recon, noise))
        return v_target, v_pred

    def inference(self, cond, lengths=None, spk_embs=None):
        B, T = cond.shape[0], cond.shape[1]
        cond = self._cond(cond, lengths, spk_embs, False)
        rng = self.make_rng("diffusion")
        x = jax.random.normal(rng, (B, T, self.out_dim))

        n = max(int(self.sampling_steps), 1)
        dt = 1.0 / n
        ts = jnp.asarray(np.arange(n) * dt, jnp.float32)

        def euler(mdl, x, t):
            v = mdl._vf(x, jnp.full((B,), t * mdl.time_scale), cond)
            return x + dt * v, None

        def midpoint(mdl, x, t):
            v = mdl._vf(x, jnp.full((B,), t * mdl.time_scale), cond)
            x_mid = x + 0.5 * dt * v
            t_mid = t + 0.5 * dt
            v_mid = mdl._vf(
                x_mid, jnp.full((B,), t_mid * mdl.time_scale), cond
            )
            return x + dt * v_mid, None

        step = euler if self.solver == "euler" else midpoint
        x, _ = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
        )(self, x, ts)
        return x * self.norm_scale


class MultiSpeakerFlowMatching(FlowMatching):
    """Flow matching + speaker-embedding conditioning (mirrors
    MultiSpeakerGaussianDiffusion's surface)."""

    speaker_embedding: Any = None

    def setup(self):
        super().setup()
        from ensemble_svs_with_interactions_tpu.models.acoustic.multistream import (
            _maybe_instantiate,
        )

        self._spk = _maybe_instantiate(self.speaker_embedding)

    def _spk_embs(self, spks, T):
        e = self._spk(spks)
        if e.ndim == 2:
            e = e[:, None, :]
        return jnp.broadcast_to(e, (e.shape[0], T, e.shape[-1]))

    def __call__(self, cond, spks, lengths=None, y=None, train: bool = False):
        return super().__call__(
            cond, lengths, y,
            spk_embs=self._spk_embs(spks, cond.shape[1]), train=train,
        )

    def inference(self, cond, spks, lengths=None):
        return super().inference(
            cond, lengths, spk_embs=self._spk_embs(spks, cond.shape[1])
        )
