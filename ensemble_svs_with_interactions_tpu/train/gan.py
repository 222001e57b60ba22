"""GAN training for learned postfilters.

Parity targets: /root/reference/nnsvs/train_util.py:1521 (setup_gan) and
nnsvs/bin/train_postfilter.py (LSGAN adversarial + feature-matching losses
over Conv2dPostFilter / Conv2dD pairs).

One jitted step updates both netG and netD: D with the LSGAN real/fake
losses, G with reconstruction + adversarial + feature matching.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ensemble_svs_with_interactions_tpu.train.losses import masked_mean


def create_gan_train_step(
    netG,
    netD,
    optG,
    optD,
    adv_weight: float = 1.0,
    fm_weight: float = 2.0,
    recon_weight: float = 1.0,
    clip_norm: float = 1.0,
):
    """Build a jitted GAN train step.

    netG: postfilter module (in: normalized features, out: enhanced);
    netD: discriminator returning a list of feature maps (logits last).
    Batch: in_feats (B, T, D) degraded, out_feats (B, T, D) target,
    lengths (B,).
    """

    def _d_mean(vals, mask):
        # mask D outputs over padded frames when the time resolution
        # matches (reference train_postfilter.py:115-131 masked_select);
        # scale-changing discriminators fall back to a plain mean
        if vals.ndim >= 2 and vals.shape[1] == mask.shape[1]:
            m = mask.reshape(mask.shape[0], mask.shape[1], *([1] * (vals.ndim - 2)))
            return masked_mean(vals, m)
        return jnp.mean(vals)

    def g_loss_fn(paramsG, paramsD, batch, rng):
        x, y, lengths = batch["in_feats"], batch["out_feats"], batch["lengths"]
        T = x.shape[1]
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)[
            :, :, None
        ]
        rng_drop, rng_noise = jax.random.split(rng)
        fake = netG.apply(
            {"params": paramsG}, x, lengths, train=True,
            rngs={"dropout": rng_drop, "noise": rng_noise},
        )
        loss_recon = masked_mean((fake - y) ** 2, mask)
        d_fake = netD.apply({"params": paramsD}, fake * mask)
        d_real = netD.apply({"params": paramsD}, y * mask)
        loss_adv = _d_mean((d_fake[-1] - 1.0) ** 2, mask)
        loss_fm = sum(
            _d_mean(jnp.abs(f - jax.lax.stop_gradient(r)), mask)
            for f, r in zip(d_fake[:-1], d_real[:-1])
        ) / max(len(d_fake) - 1, 1)
        loss = (
            recon_weight * loss_recon
            + adv_weight * loss_adv
            + fm_weight * loss_fm
        )
        return loss, {
            "Loss_G": loss,
            "Loss_Recon": loss_recon,
            "Loss_Adv": loss_adv,
            "Loss_FM": loss_fm,
            "fake": fake,
        }

    def d_loss_fn(paramsD, batch, fake):
        x, y, lengths = batch["in_feats"], batch["out_feats"], batch["lengths"]
        T = x.shape[1]
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)[
            :, :, None
        ]
        d_real = netD.apply({"params": paramsD}, y * mask)
        d_fake = netD.apply({"params": paramsD}, jax.lax.stop_gradient(fake) * mask)
        loss_real = _d_mean((d_real[-1] - 1.0) ** 2, mask)
        loss_fake = _d_mean(d_fake[-1] ** 2, mask)
        loss = loss_real + loss_fake
        return loss, {"Loss_D": loss, "Loss_D_Real": loss_real, "Loss_D_Fake": loss_fake}

    def train_step(state: Dict, batch: Dict, rng):
        (lossG, auxG), gradsG = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state["paramsG"], state["paramsD"], batch, rng
        )
        fake = auxG.pop("fake")
        (lossD, auxD), gradsD = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state["paramsD"], batch, fake
        )

        def apply(grads, params, opt_state, opt):
            gnorm = optax.global_norm(grads)
            # NaN-skip like the non-GAN steps (train/loop.py): one
            # non-finite batch must not poison params for the whole run
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
        metrics = {**auxG, **auxD, "GradNorm_G": gnormG, "GradNorm_D": gnormD}
        return new_state, metrics

    return jax.jit(train_step)
