"""Duration-informed Tacotron decoder machinery (autoregressive, lax.scan).

Parity targets: /root/reference/nnsvs/tacotron/decoder.py (Prenet :50,
ZoneOutCell :20, NonAttentiveDecoder :91-264).

TPU design: the per-frame autoregressive loop is one ``nn.scan`` over T/r
steps of an ``_ARDecoderCore`` module.  Teacher forcing feeds targets as
scan inputs (XLA pipelines the cells); inference feeds back the previous
output through the carry.  Prenet dropout is active at inference too
(matching the reference's ``eval_dropout=True``, decoder.py:84-87) via the
"prenet" RNG stream; zoneout uses bernoulli masks in training and
deterministic blending at inference (decoder.py:39-47).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.base import BaseModel
from ensemble_svs_with_interactions_tpu.models.layers import (
    scan_unroll as _scan_unroll,
)
from ensemble_svs_with_interactions_tpu.ops.mdn import (
    mdn_get_most_probable_sigma_and_mu,
)

_MAX_LF0_RATIO = 600.0 * np.log(2) / 1200.0


class Prenet(nn.Module):
    """Tacotron pre-net; dropout stays on at inference (a stochastic AR
    regularizer, not a training-only one) unless ``dropout_enabled`` is
    False (the reference's ``eval_dropout=False``, decoder.py:84-87)."""

    layers: int = 2
    hidden_dim: int = 256
    dropout: float = 0.5
    dropout_enabled: bool = True

    @nn.compact
    def __call__(self, x):
        def drop(v):
            if self.dropout > 0 and self.dropout_enabled:
                sub = self.make_rng("prenet")
                keep = jax.random.bernoulli(sub, 1.0 - self.dropout, v.shape)
                return jnp.where(keep, v / (1.0 - self.dropout), 0.0)
            return v

        # the reference applies dropout after EVERY Sequential child —
        # the Linear AND its ReLU (decoder.py:67-87 `for layer in
        # self.prenet: x = F.dropout(layer(x), ...)`), i.e. twice per
        # prenet layer, once pre-activation
        for i in range(self.layers):
            x = drop(nn.Dense(self.hidden_dim, name=f"fc{i}")(x))
            x = drop(nn.relu(x))
        return x


class Postnet(nn.Module):
    """Tacotron 2 Post-Net (reference nnsvs/tacotron/postnet.py:9): a conv
    stack whose output refines the decoder trajectory residually.
    BatchNorm uses masked batch statistics so padded frames don't skew the
    running stats (the reference's unmasked BatchNorm1d sees padding)."""

    layers: int = 5
    channels: int = 512
    kernel_size: int = 5
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        from ensemble_svs_with_interactions_tpu.models.layers import (
            MaskedBatchNorm,
        )

        in_dim = x.shape[-1]
        for layer in range(self.layers):
            out_ch = in_dim if layer == self.layers - 1 else self.channels
            x = nn.Conv(
                out_ch,
                (self.kernel_size,),
                padding=(self.kernel_size - 1) // 2,
                use_bias=False,
                name=f"conv{layer}",
            )(x)
            x = MaskedBatchNorm(name=f"bn{layer}")(
                x, mask=mask, use_running_average=not train
            )
            if layer != self.layers - 1:
                x = jnp.tanh(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


def apply_postnet(parent, outs, lengths, train: bool):
    """Residual Post-Net refinement shared by the AR decoder wrappers.

    Returns ``[outs, outs + postnet(outs)]`` (the reference returns the
    coarse/fine pair as a list so the trainer supervises both,
    nnsvs/acoustic_models/tacotron.py:100-110); inference callers take the
    last element.  Must be called inside ``parent``'s @nn.compact
    __call__ with ``postnet_layers > 0``.
    """
    mask = None
    if lengths is not None:
        mask = (
            jnp.arange(outs.shape[1])[None, :]
            < jnp.asarray(lengths)[:, None]
        )
    fine = outs + Postnet(
        layers=parent.postnet_layers,
        channels=parent.postnet_channels,
        kernel_size=parent.postnet_kernel_size,
        dropout=parent.postnet_dropout,
        name="postnet",
    )(outs, mask=mask, train=train)
    return [outs, fine]


def zoneout_blend(prev_state, new_state, prob: float, train: bool, rng):
    """Zoneout on an LSTM (c, h) state tuple."""
    if prob <= 0.0:
        return new_state

    def _one(p, n, key):
        if train:
            mask = jax.random.bernoulli(key, prob, p.shape)
            return jnp.where(mask, p, n)
        return prob * p + (1.0 - prob) * n

    k1, k2 = jax.random.split(rng) if rng is not None else (None, None)
    return (_one(prev_state[0], new_state[0], k1), _one(prev_state[1], new_state[1], k2))


class _ARDecoderCore(nn.Module):
    """One autoregressive decoder step (scanned over time with nn.scan).

    carry: (lstm_states, prev_out); xs: (enc_t, target_t, lf0_den_t).
    """

    out_dim: int
    layers: int
    hidden_dim: int
    prenet_layers: int
    prenet_hidden_dim: int
    prenet_dropout: float
    zoneout: float
    reduction_factor: int
    train: bool
    is_inference: bool
    residual_f0: bool
    scaled_tanh: bool = True
    out_lf0_idx: int = 0
    out_lf0_mean: float = 0.0
    out_lf0_scale: float = 1.0
    use_mdn: bool = False
    num_gaussians: int = 8
    sampling_mode: str = "mean"
    prenet_noise_std: float = 0.0
    eval_dropout: bool = True

    @nn.compact
    def __call__(self, carry, xs):
        states, prev_out = carry
        enc_t, tgt_t, lf0_den_t = xs
        # teacher-forcing targets keep f32 under AMP (they also feed the
        # loss); the fed-back frame must match the carry dtype or the
        # scan carry type flips f32<->bf16 across steps
        tgt_t = tgt_t.astype(prev_out.dtype)
        B = enc_t.shape[0]
        r = self.reduction_factor

        if self.prenet_layers > 0:
            # Teacher forcing feeds the CURRENT target frame to the prenet
            # (reference tacotron_f0.py:178-189 precomputes prenet(targets)
            # and indexes step t); inference feeds back the previous output.
            prenet_in = prev_out if self.is_inference else tgt_t
            prenet_out = Prenet(
                self.prenet_layers,
                self.prenet_hidden_dim,
                self.prenet_dropout,
                dropout_enabled=self.train or self.eval_dropout,
                name="prenet",
            )(prenet_in)
        elif self.prenet_noise_std > 0:
            # prenet-less Gaussian-noise regularizer on the fed-back frame
            # (reference decoder.py:233-235), active at inference too
            rng = self.make_rng("prenet")
            prenet_out = prev_out + self.prenet_noise_std * jax.random.normal(
                rng, prev_out.shape
            )
        else:
            # prenet-less path always consumes the PREVIOUS frame
            # (reference tacotron_f0.py:190-191 dropout(prev_out))
            rng = self.make_rng("prenet")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.prenet_dropout, prev_out.shape
            )
            prenet_out = jnp.where(
                keep, prev_out / (1.0 - self.prenet_dropout), 0.0
            )

        h = jnp.concatenate([enc_t, prenet_out], axis=-1)
        new_states = []
        for i in range(self.layers):
            cell = nn.OptimizedLSTMCell(self.hidden_dim, name=f"cell{i}")
            new_state, h = cell(states[i], h)
            if self.zoneout > 0:
                rng = self.make_rng("zoneout") if self.train else None
                new_state = zoneout_blend(
                    states[i], new_state, self.zoneout, self.train, rng
                )
                h = new_state[1]
            new_states.append(new_state)

        hcs = jnp.concatenate([h, enc_t], axis=-1)

        def _apply_res_f0(mu):
            """mu: (B, ..., r, out_dim); residual F0 over the lf0 column."""
            raw = mu[..., self.out_lf0_idx]
            res = _MAX_LF0_RATIO * jnp.tanh(raw) if self.scaled_tanh else raw
            lf0_den = jnp.broadcast_to(
                lf0_den_t.reshape((B,) + (1,) * (mu.ndim - 3) + (r,)), res.shape
            )
            lf0_pred = (lf0_den + res - self.out_lf0_mean) / self.out_lf0_scale
            return mu.at[..., self.out_lf0_idx].set(lf0_pred), res

        if self.use_mdn:
            # dim_wise MDN head (reference MDNLayer(dim_wise=True) inside
            # the AR decoders, tacotron_f0.py:335,430-462): per-DIMENSION
            # mixture weights of shape (B, G, r, D); flat unit order
            # (g, r, d) matches the reference Linear layouts so torch
            # checkpoints port by plain transpose
            G, D = self.num_gaussians, self.out_dim
            log_pi = jax.nn.log_softmax(
                nn.Dense(G * r * D, name="log_pi")(hcs).reshape(B, G, r, D),
                axis=1,
            )
            log_sigma = nn.Dense(G * r * D, name="log_sigma")(hcs).reshape(
                B, G, r, D
            )
            mu = nn.Dense(G * r * D, name="mu")(hcs).reshape(B, G, r, D)
            if self.residual_f0:
                mu, res_all = _apply_res_f0(mu)  # res_all (B, G, r)
                # ALL components' residuals, (B, r, G) as in the reference
                res = jnp.moveaxis(res_all, 1, 2)
            else:
                res = jnp.zeros((B, r, G), mu.dtype)
            # per-dim most-probable component for feedback and the
            # inference trajectory (reference mdn_get_most_probable /
            # mdn_get_sample per step)
            lp = jnp.moveaxis(log_pi, 1, 2)  # (B, r, G, D)
            ls = jnp.moveaxis(log_sigma, 1, 2)
            m = jnp.moveaxis(mu, 1, 2)
            sigma_sel, mu_sel = mdn_get_most_probable_sigma_and_mu(lp, ls, m)
            if self.is_inference and self.sampling_mode == "random":
                eps = jax.random.normal(self.make_rng("prenet"), mu_sel.shape)
                mu_sel = mu_sel + sigma_sel * eps
            prev = mu_sel[:, -1, :] if self.is_inference else tgt_t
            out = (log_pi, log_sigma, mu, mu_sel, sigma_sel)
            return (tuple(new_states), prev), (out, res)

        # flat unit order (dim, step): reference feat_out.view(B, out_dim, r)
        # (tacotron_f0.py:202) — keeping it lets torch checkpoints with
        # r > 1 and out_dim > 1 port by plain transpose
        out = (
            nn.Dense(self.out_dim * r, use_bias=False, name="feat_out")(hcs)
            .reshape(B, self.out_dim, r)
            .transpose(0, 2, 1)
        )

        if self.residual_f0:
            out, res = _apply_res_f0(out)
        else:
            res = jnp.zeros((B, r), out.dtype)

        prev = out[:, -1, :] if self.is_inference else tgt_t
        return (tuple(new_states), prev), (out, res)


def ar_decode(
    parent,
    encoder_outs,
    decoder_targets,
    train: bool,
    residual_f0: bool = False,
    in_lf0_idx: int = -1,
    lf0_params: Optional[Tuple[float, float, float, float]] = None,
    scaled_tanh: bool = True,
    out_lf0_idx: int = 0,
    initial_value: float = 0.0,
):
    """Run the scanned AR decode for a decoder module ``parent``.

    ``parent`` provides hyperparameters (out_dim, layers, hidden_dim,
    prenet_*, zoneout, reduction_factor, downsample_by_conv).  Must be
    called inside ``parent``'s @nn.compact __call__.

    Returns (outs (B, T_full, D), lf0_residual (B, T_full, 1) | None).
    """
    is_inference = decoder_targets is None
    r = parent.reduction_factor
    B, T_full, _ = encoder_outs.shape
    # pad to a multiple of the reduction factor and trim after (the
    # reference wraps every AR inference in pad_inference,
    # acoustic_models/util.py)
    T_orig = T_full
    pad = (-T_full) % r
    if pad:
        encoder_outs = jnp.pad(encoder_outs, ((0, 0), (0, pad), (0, 0)))
        if decoder_targets is not None:
            decoder_targets = jnp.pad(
                decoder_targets, ((0, 0), (0, pad), (0, 0))
            )
        T_full += pad

    if residual_f0:
        in_lf0_min, in_lf0_max, out_lf0_mean, out_lf0_scale = lf0_params
        lf0_score = encoder_outs[:, :, in_lf0_idx]
        lf0_denorm = lf0_score * (in_lf0_max - in_lf0_min) + in_lf0_min
        lf0_den_steps = lf0_denorm.reshape(B, -1, r)
    else:
        out_lf0_mean, out_lf0_scale = 0.0, 1.0

    if r > 1 and parent.downsample_by_conv:
        C = encoder_outs.shape[-1]
        enc = nn.Conv(
            C,
            (r,),
            strides=(r,),
            feature_group_count=C,
            padding="VALID",
            name="conv_downsample",
        )(encoder_outs)
    elif r > 1:
        enc = encoder_outs[:, r - 1 :: r]
    else:
        enc = encoder_outs
    T = enc.shape[1]

    if decoder_targets is not None and r > 1:
        decoder_targets = decoder_targets[:, r - 1 :: r]
    tgt = (
        decoder_targets
        if decoder_targets is not None
        else jnp.zeros((B, T, parent.out_dim), enc.dtype)
    )
    lf0_in = (
        lf0_den_steps[:, :T]
        if residual_f0
        else jnp.zeros((B, T, r), enc.dtype)
    )

    use_mdn = bool(getattr(parent, "use_mdn", False))
    core = nn.scan(
        _ARDecoderCore,
        variable_broadcast="params",
        split_rngs={"prenet": True, "zoneout": True, "params": False},
        in_axes=1,
        out_axes=1,
        unroll=_scan_unroll(),
    )(
        out_dim=parent.out_dim,
        layers=parent.layers if hasattr(parent, "layers") else parent.decoder_layers,
        hidden_dim=(
            parent.hidden_dim
            if hasattr(parent, "hidden_dim")
            else parent.decoder_hidden_dim
        ),
        prenet_layers=parent.prenet_layers,
        prenet_hidden_dim=parent.prenet_hidden_dim,
        prenet_dropout=parent.prenet_dropout,
        zoneout=parent.zoneout,
        reduction_factor=r,
        train=train,
        is_inference=is_inference,
        residual_f0=residual_f0,
        scaled_tanh=scaled_tanh,
        out_lf0_idx=out_lf0_idx,
        out_lf0_mean=float(out_lf0_mean),
        out_lf0_scale=float(out_lf0_scale),
        use_mdn=use_mdn,
        num_gaussians=int(getattr(parent, "num_gaussians", 8)),
        sampling_mode=str(getattr(parent, "sampling_mode", "mean")),
        prenet_noise_std=float(getattr(parent, "prenet_noise_std", 0.0)),
        eval_dropout=bool(getattr(parent, "eval_dropout", True)),
        name="ar_core",
    )

    hidden = (
        parent.hidden_dim
        if hasattr(parent, "hidden_dim")
        else parent.decoder_hidden_dim
    )
    layers = parent.layers if hasattr(parent, "layers") else parent.decoder_layers
    init_states = tuple(
        (
            jnp.zeros((B, hidden), enc.dtype),
            jnp.zeros((B, hidden), enc.dtype),
        )
        for _ in range(layers)
    )
    go_frame = jnp.full((B, parent.out_dim), initial_value, enc.dtype)

    (_, _), (outs, res) = core((init_states, go_frame), (enc, tgt, lf0_in))
    if use_mdn:
        # scan outputs: log_pi/log_sigma/mu (B, T, G, r, D),
        # mu_sel/sigma_sel (B, T, r, D), res (B, T, r, G)
        log_pi, log_sigma, mu, mu_sel, sigma_sel = outs
        G, D = int(getattr(parent, "num_gaussians", 8)), parent.out_dim
        # reduced steps -> full frame rate, (B, T*r, G, D) like the
        # reference's per-step cat (tacotron_f0.py:507-513)
        log_pi = jnp.moveaxis(log_pi, 3, 2).reshape(B, T * r, G, D)
        log_sigma = jnp.moveaxis(log_sigma, 3, 2).reshape(B, T * r, G, D)
        mu = jnp.moveaxis(mu, 3, 2).reshape(B, T * r, G, D)
        mu_sel = mu_sel.reshape(B, T * r, D)
        sigma_sel = sigma_sel.reshape(B, T * r, D)
        # residuals of ALL mixture components, (B, T*r, G) as in the
        # reference's lf0_residuals
        lf0_residual = res.reshape(B, T * r, G) if residual_f0 else None
        trim = lambda a: a[:, :T_orig] if a is not None else None
        if is_inference:
            # the reference returns the selected/sampled trajectory (its
            # sigma slot is a placeholder `mu`; we return the real sigma)
            return (trim(mu_sel), trim(sigma_sel)), trim(lf0_residual)
        return (
            (trim(log_pi), trim(log_sigma), trim(mu)),
            trim(lf0_residual),
        )
    outs = outs.reshape(B, T * r, parent.out_dim)[:, :T_orig]
    if residual_f0:
        return outs, res.reshape(B, T * r, 1)[:, :T_orig]
    return outs, None


class NonAttentiveDecoder(BaseModel):
    """Duration-informed Tacotron decoder without attention
    (reference nnsvs/tacotron/decoder.py:91)."""

    in_dim: int = 512
    out_dim: int = 80
    layers: int = 2
    hidden_dim: int = 1024
    prenet_layers: int = 2
    prenet_hidden_dim: int = 256
    prenet_dropout: float = 0.5
    zoneout: float = 0.1
    reduction_factor: int = 1
    downsample_by_conv: bool = False
    init_type: str = "none"
    initial_value: float = 0.0
    use_mdn: bool = False
    num_gaussians: int = 8
    sampling_mode: str = "mean"
    prenet_noise_std: float = 0.0
    eval_dropout: bool = True
    postnet_layers: int = 0
    postnet_channels: int = 512
    postnet_kernel_size: int = 5
    postnet_dropout: float = 0.0

    def is_autoregressive(self) -> bool:
        return True

    def prediction_type(self):
        from ensemble_svs_with_interactions_tpu.base import PredictionType

        return (
            PredictionType.PROBABILISTIC
            if self.use_mdn
            else PredictionType.DETERMINISTIC
        )

    @nn.compact
    def __call__(self, encoder_outs, lengths=None, y=None, train: bool = False):
        outs, _ = ar_decode(
            self,
            encoder_outs,
            y,
            train,
            residual_f0=False,
            initial_value=self.initial_value,
        )
        if self.postnet_layers > 0 and not self.use_mdn:
            return apply_postnet(self, outs, lengths, train)
        return outs

    def inference(self, x, lengths=None):
        outs = self(x, lengths)
        # Post-Net decoders return [coarse, fine]; serve the refined one
        # (reference pad_inference, acoustic_models/util.py:146-148)
        return outs[-1] if isinstance(outs, list) else outs


class MDNNonAttentiveDecoder(NonAttentiveDecoder):
    """Non-attentive decoder with per-step MDN outputs
    (reference nnsvs/tacotron/decoder.py:267)."""

    use_mdn: bool = True
