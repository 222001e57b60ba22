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
from ensemble_svs_with_interactions_tpu.train.loop import amp_cast, amp_uncast


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def create_gan_train_step(
    netG,
    netD,
    optG,
    optD,
    adv_weight: float = 1.0,
    fm_weight: float = 2.0,
    recon_weight: float = 1.0,
    clip_norm: float = 1.0,
    gan_type: str = "lsgan",
    stream_sizes=None,
    adv_streams=None,
    mask_nth_mgc_for_adv_loss: int = 0,
    vuv_mask: bool = False,
    use_amp: bool = False,
):
    """Build a jitted GAN train step.

    netG: postfilter module (in: normalized features, out: enhanced);
    netD: discriminator returning a list of feature maps (logits last).
    Batch: in_feats (B, T, D) degraded, out_feats (B, T, D) target,
    lengths (B,).

    Reference knobs (nnsvs/bin/train_postfilter.py:43-215):
      * ``gan_type``: "lsgan" | "vanilla-gan" | "hinge";
      * ``adv_streams``: per-stream bools selecting which streams feed
        the discriminator (with ``stream_sizes``);
      * ``mask_nth_mgc_for_adv_loss``: drop the first n dims of the
        D input (energy coefficients);
      * ``vuv_mask``: zero D inputs on frames unvoiced in either the
        target or the degraded input (vuv stream at sum(sizes[:2])).
      * ``use_amp``: run the GENERATOR forward/backward in bfloat16 with
        f32 master params (reference setup_gan honors config.train.use_amp,
        train_util.py:1562).  The discriminator and all losses stay f32 —
        GAN logits/log terms are precision-sensitive and D is a small conv
        stack, so the bandwidth win lives in G.
    """
    if gan_type not in ("lsgan", "vanilla-gan", "hinge"):
        raise ValueError(f"Unknown gan type: {gan_type}")
    if vuv_mask and (stream_sizes is None or len(stream_sizes) < 3):
        raise ValueError(
            "vuv_mask=True requires stream_sizes (the V/UV stream lives at "
            "sum(stream_sizes[:2]))"
        )

    from ensemble_svs_with_interactions_tpu.ops.multistream import (
        select_streams,
    )

    eps = 1e-14

    def _adv_input(feats):
        if adv_streams is not None and stream_sizes is not None:
            feats = select_streams(feats, list(stream_sizes), list(adv_streams))
        if mask_nth_mgc_for_adv_loss > 0:
            feats = feats[:, :, mask_nth_mgc_for_adv_loss:]
        return feats

    def _vuv_weight(x, y):
        if not vuv_mask:
            return 1.0
        vuv_idx = int(sum(stream_sizes[:2]))
        is_v = jnp.logical_and(
            y[:, :, vuv_idx : vuv_idx + 1] > 0,
            x[:, :, vuv_idx : vuv_idx + 1] > 0,
        )
        return is_v.astype(jnp.float32)

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
        paramsG_m = amp_cast(paramsG) if use_amp else paramsG
        fake = netG.apply(
            {"params": paramsG_m}, amp_cast(x) if use_amp else x, lengths,
            train=True, rngs={"dropout": rng_drop, "noise": rng_noise},
        )
        if use_amp:
            fake = amp_uncast(fake)
        loss_recon = masked_mean((fake - y) ** 2, mask)
        vuv = _vuv_weight(x, y)
        d_fake = netD.apply({"params": paramsD}, _adv_input(fake) * vuv * mask)
        d_real = netD.apply({"params": paramsD}, _adv_input(y) * vuv * mask)
        logits = d_fake[-1]
        if gan_type == "lsgan":
            adv = (1.0 - logits) ** 2
        elif gan_type == "vanilla-gan":
            adv = -jnp.log(logits + eps)
        else:  # hinge
            adv = -logits
        loss_adv = _d_mean(adv, mask)
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
        vuv = _vuv_weight(x, y)
        d_real = netD.apply({"params": paramsD}, _adv_input(y) * vuv * mask)
        d_fake = netD.apply(
            {"params": paramsD},
            _adv_input(jax.lax.stop_gradient(fake)) * vuv * mask,
        )
        r, f = d_real[-1], d_fake[-1]
        if gan_type == "lsgan":
            loss_real = _d_mean((r - 1.0) ** 2, mask)
            loss_fake = _d_mean(f ** 2, mask)
        elif gan_type == "vanilla-gan":
            loss_real = _d_mean(-jnp.log(r + eps), mask)
            loss_fake = _d_mean(-jnp.log(1.0 - f + eps), mask)
        else:  # hinge
            loss_real = _d_mean(nn_relu(1.0 - r), mask)
            loss_fake = _d_mean(nn_relu(1.0 + f), mask)
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

    # state donated: buffers reused in place (see train/loop.py)
    return jax.jit(train_step, donate_argnums=(0,))
