"""Neural-vocoder GAN training: multi-resolution STFT + adversarial losses.

Parity target: the external parallel_wavegan / usfgan trainers the reference
invokes at recipe stages 10-13 (recipes/_common/spsvs/run_common_steps_dev.sh
:50-64, train_usfgan.sh): generator loss = multi-resolution STFT
(spectral convergence + log magnitude) + LSGAN adversarial (+ optional
feature matching); discriminator = LSGAN real/fake.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import optax

from ensemble_svs_with_interactions_tpu.models.vocoders.discriminators import (
    _stft_mag,
)


def stft_loss(
    y_hat,
    y,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
):
    """Multi-resolution STFT loss (spectral convergence + log magnitude)."""
    sc_total, mag_total = 0.0, 0.0
    for fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        m_hat = _stft_mag(y_hat, fft, hop, win)
        m = _stft_mag(y, fft, hop, win)
        sc = jnp.linalg.norm(m - m_hat) / jnp.maximum(jnp.linalg.norm(m), 1e-6)
        mag = jnp.mean(jnp.abs(jnp.log(m) - jnp.log(m_hat)))
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = len(fft_sizes)
    return sc_total / n, mag_total / n


def _flatten_d_outs(outs):
    """Discriminators return list[feat_maps] or list[list[feat_maps]]."""
    if isinstance(outs[0], (list, tuple)):
        return outs
    return [outs]


def create_vocoder_gan_train_step(
    generator,
    discriminator,
    optG,
    optD,
    stft_weight: float = 1.0,
    adv_weight: float = 4.0,
    fm_weight: float = 0.0,
    clip_norm: float = 10.0,  # parallel_wavegan trainer default grad_norm
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
):
    """Jitted GAN step for source-filter vocoders.

    Batch: x (B, T, S) excitation, c (B, T', aux), d (B, T) dilation
    factors, y (B, T, 1) target audio.
    """

    def g_loss_fn(paramsG, paramsD, batch):
        outs = generator.apply(
            {"params": paramsG}, batch["x"], batch["c"], batch["d"]
        )
        # USFGANGenerator returns (wav, src); the hn variants return
        # (wav, src, harmonic_dbg, noise_dbg, gates)
        y_hat = outs[0] if isinstance(outs, tuple) else outs
        y = batch["y"]
        sc, mag = stft_loss(
            y_hat[..., 0], y[..., 0], fft_sizes, hop_sizes, win_lengths
        )
        loss_stft = sc + mag
        d_fake = _flatten_d_outs(
            discriminator.apply({"params": paramsD}, y_hat)
        )
        loss_adv = sum(jnp.mean((f[-1] - 1.0) ** 2) for f in d_fake) / len(d_fake)
        loss_fm = 0.0
        if fm_weight > 0:
            d_real = _flatten_d_outs(discriminator.apply({"params": paramsD}, y))
            for fr, fk in zip(d_real, d_fake):
                for r, k in zip(fr[:-1], fk[:-1]):
                    loss_fm = loss_fm + jnp.mean(
                        jnp.abs(k - jax.lax.stop_gradient(r))
                    )
        loss = stft_weight * loss_stft + adv_weight * loss_adv + fm_weight * loss_fm
        return loss, {
            "Loss_G": loss,
            "Loss_STFT_SC": sc,
            "Loss_STFT_Mag": mag,
            "Loss_Adv": loss_adv,
            "y_hat": y_hat,
        }

    def d_loss_fn(paramsD, batch, y_hat):
        d_real = _flatten_d_outs(discriminator.apply({"params": paramsD}, batch["y"]))
        d_fake = _flatten_d_outs(
            discriminator.apply({"params": paramsD}, jax.lax.stop_gradient(y_hat))
        )
        loss_real = sum(jnp.mean((f[-1] - 1.0) ** 2) for f in d_real) / len(d_real)
        loss_fake = sum(jnp.mean(f[-1] ** 2) for f in d_fake) / len(d_fake)
        loss = loss_real + loss_fake
        return loss, {"Loss_D": loss, "Loss_D_Real": loss_real, "Loss_D_Fake": loss_fake}

    def train_step(state: Dict, batch: Dict):
        (lossG, auxG), gradsG = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state["paramsG"], state["paramsD"], batch
        )
        y_hat = auxG.pop("y_hat")
        (lossD, auxD), gradsD = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state["paramsD"], batch, y_hat
        )
        def apply(grads, params, opt_state, opt):
            # clip + NaN-skip like every other train step in this package
            # (the external parallel_wavegan trainer this replaces clips
            # gradients too); one unstable batch must not poison params
            gnorm = optax.global_norm(grads)
            finite = jnp.isfinite(gnorm)
            clip = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
            updates, new_opt = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_params, params
            )
            new_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_opt, opt_state
            )
            return new_params, new_opt, gnorm

        newG, optG_state, gnormG = apply(
            gradsG, state["paramsG"], state["optG_state"], optG
        )
        newD, optD_state, gnormD = apply(
            gradsD, state["paramsD"], state["optD_state"], optD
        )
        new_state = {
            "paramsG": newG,
            "paramsD": newD,
            "optG_state": optG_state,
            "optD_state": optD_state,
            "step": state["step"] + 1,
        }
        return new_state, {
            **auxG, **auxD, "GradNorm_G": gnormG, "GradNorm_D": gnormD,
        }

    return jax.jit(train_step)
