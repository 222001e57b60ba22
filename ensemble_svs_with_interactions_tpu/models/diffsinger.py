"""DiffSinger-style shallow diffusion acoustic models.

Parity targets: /root/reference/nnsvs/diffsinger/diffusion.py
(GaussianDiffusion :54 — DDPM over acoustic-feature maps with linear/cosine
beta schedules, +/- norm_scale normalization, ancestral sampling over K_step
and the PLMS multi-step sampler :207-259), denoiser.py (DiffNet :69 —
WaveNet-like dilated-conv denoiser with sinusoidal step embedding).

TPU design: features stay (B, T, M) feature-last; the K-step ancestral
sampling loop is a single ``lax.scan`` (the reference's per-step python
loop dispatches K kernels); PLMS keeps its last-4 noise history in the
scan carry.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.base import BaseModel, PredictionType


def linear_beta_schedule(timesteps: int, min_beta=1e-4, max_beta=0.06):
    return np.linspace(min_beta, max_beta, timesteps)


def cosine_beta_schedule(timesteps: int, s: float = 0.008):
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


class SinusoidalPosEmb(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        emb = math.log(10000.0) / (half - 1)
        emb = jnp.exp(jnp.arange(half) * -emb)
        emb = t[:, None].astype(jnp.float32) * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class _DiffResidualBlock(nn.Module):
    """Gated dilated-conv residual block (denoiser.py:40)."""

    residual_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x, cond, step_emb):
        # x: (B, T, C), cond: (B, T, E), step_emb: (B, C)
        C = self.residual_channels
        h = x + nn.Dense(C, name="step_proj")(step_emb)[:, None, :]
        h = nn.Conv(
            2 * C, (3,), kernel_dilation=(self.dilation,), padding="SAME",
            name="dilated_conv",
        )(h)
        h = h + nn.Conv(2 * C, (1,), name="cond_proj")(cond)
        gate, filt = jnp.split(h, 2, axis=-1)
        h = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        h = nn.Conv(2 * C, (1,), name="out_proj")(h)
        residual, skip = jnp.split(h, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class DiffNet(nn.Module):
    """WaveNet-like denoiser (denoiser.py:69), feature-last layout."""

    in_dim: int = 80
    encoder_hidden_dim: int = 256
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 4

    @nn.compact
    def __call__(self, spec, diffusion_step, cond):
        # spec: (B, T, M); diffusion_step: (B,); cond: (B, T, E)
        C = self.residual_channels
        x = nn.relu(nn.Conv(C, (1,), name="input_proj")(spec))
        emb = SinusoidalPosEmb(C)(diffusion_step)
        h_emb = nn.Dense(C * 4, name="mlp_in")(emb)
        # Mish, matching the reference step MLP (denoiser.py:9-11,84-86)
        h_emb = h_emb * jnp.tanh(jax.nn.softplus(h_emb))
        emb = nn.Dense(C, name="mlp_out")(h_emb)
        skips = []
        for i in range(self.residual_layers):
            x, skip = _DiffResidualBlock(
                C, 2 ** (i % self.dilation_cycle_length), name=f"res{i}"
            )(x, cond, emb)
            skips.append(skip)
        x = sum(skips) / math.sqrt(len(skips))
        x = nn.relu(nn.Conv(C, (1,), name="skip_proj")(x))
        return nn.Conv(
            self.in_dim, (1,), kernel_init=nn.initializers.zeros, name="output_proj"
        )(x)


class GaussianDiffusion(BaseModel):
    """DDPM over acoustic features with an optional condition encoder.

    Training returns ``(noise, x_recon)`` (PredictionType.DIFFUSION, the
    per-stream (noise, x_recon) contract consumed by multistream_loss);
    inference runs ancestral sampling (or PLMS with ``pndm_speedup``) as a
    lax.scan.
    """

    in_dim: int
    out_dim: int
    denoise_fn: Any  # config dict or module
    encoder: Any = None
    K_step: int = 100
    schedule_type: str = "linear"
    # explicit beta array overrides the schedule; scheduler_params feeds
    # the schedule builder (reference configs pass betas: null +
    # scheduler_params: {max_beta: 0.06}, diffsinger/diffusion.py:54-80)
    betas: Any = None
    scheduler_params: Any = None
    norm_scale: float = 10.0
    pndm_speedup: Optional[int] = None
    # sampler selection (beyond the reference's ancestral/PLMS pair):
    # "ancestral" (default), "plms" (pndm_speedup also implies it),
    # "ddim" (deterministic, Song et al. 2021 eta=0) and "dpmpp"
    # (DPM-Solver++(2M), Lu et al. 2022 — high quality at 10-20 steps,
    # so 5-10x fewer denoiser evaluations on the TPU hot path).
    sampler: Optional[str] = None
    sampling_steps: Optional[int] = None

    def setup(self):
        from ensemble_svs_with_interactions_tpu.models.acoustic.multistream import (
            _maybe_instantiate,
        )

        self._denoiser = _maybe_instantiate(self.denoise_fn)
        self._encoder = _maybe_instantiate(self.encoder)
        if self.betas is not None:
            # the reference accepts schedules longer than K_step and only
            # walks the first K_step of them (diffusion.py:89-96)
            betas = np.asarray(self.betas, np.float64)
            assert len(betas) >= self.K_step
            betas = betas[: self.K_step]
        else:
            params = dict(self.scheduler_params or {})
            if self.schedule_type == "linear":
                betas = linear_beta_schedule(self.K_step, **params)
            else:
                betas = cosine_beta_schedule(self.K_step, **params)
        alphas_cumprod = np.cumprod(1.0 - betas)
        prev = np.append(1.0, alphas_cumprod[:-1])
        self._betas = jnp.asarray(betas, jnp.float32)
        self._ac = jnp.asarray(alphas_cumprod, jnp.float32)
        self._sqrt_ac = jnp.asarray(np.sqrt(alphas_cumprod), jnp.float32)
        self._sqrt_1mac = jnp.asarray(np.sqrt(1 - alphas_cumprod), jnp.float32)
        self._sqrt_recip_ac = jnp.asarray(np.sqrt(1 / alphas_cumprod), jnp.float32)
        self._sqrt_recipm1_ac = jnp.asarray(
            np.sqrt(1 / alphas_cumprod - 1), jnp.float32
        )
        post_var = betas * (1.0 - prev) / (1.0 - alphas_cumprod)
        self._post_log_var = jnp.asarray(
            np.log(np.maximum(post_var, 1e-20)), jnp.float32
        )
        self._post_c1 = jnp.asarray(
            betas * np.sqrt(prev) / (1.0 - alphas_cumprod), jnp.float32
        )
        self._post_c2 = jnp.asarray(
            (1.0 - prev) * np.sqrt(1.0 - betas) / (1.0 - alphas_cumprod), jnp.float32
        )

    def prediction_type(self):
        return PredictionType.DIFFUSION

    def _cond(self, cond, lengths, spk_embs, train):
        if self._encoder is not None:
            if spk_embs is not None:
                cond = self._encoder(
                    cond, lengths, spk_embs=spk_embs, train=train
                )
            else:
                # plain encoders (FFN etc.) have no spk_embs parameter
                cond = self._encoder(cond, lengths, train=train)
        return cond

    def __call__(self, cond, lengths=None, y=None, spk_embs=None, train: bool = False):
        B = cond.shape[0]
        cond = self._cond(cond, lengths, spk_embs, train)
        rng = self.make_rng("diffusion")
        k_t, k_noise = jax.random.split(rng)
        t = jax.random.randint(k_t, (B,), 0, self.K_step)
        x0 = y / self.norm_scale
        noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
        x_noisy = (
            self._sqrt_ac[t][:, None, None] * x0
            + self._sqrt_1mac[t][:, None, None] * noise
        )
        x_recon = self._denoiser(x_noisy, t, cond)
        return noise, x_recon

    def inference(self, cond, lengths=None, spk_embs=None):
        B, T = cond.shape[0], cond.shape[1]
        cond = self._cond(cond, lengths, spk_embs, False)
        rng = self.make_rng("diffusion")
        rng, k0 = jax.random.split(rng)
        x = jax.random.normal(k0, (B, T, self.out_dim))

        sampler = self.sampler or ("plms" if self.pndm_speedup else "ancestral")
        if sampler == "plms":
            x = self._plms_sample(x, cond, rng)
        elif sampler == "ddim":
            x = self._ddim_sample(x, cond)
        elif sampler == "dpmpp":
            x = self._dpmpp_sample(x, cond)
        elif sampler == "ancestral":
            x = self._ancestral_sample(x, cond, rng)
        else:
            raise ValueError(f"unknown sampler: {sampler}")
        return x * self.norm_scale

    # ---------------------------------------------------------------- samplers
    def _p_step(self, x, t, cond, key):
        """One ancestral sampling step (t: scalar int)."""
        B = x.shape[0]
        tb = jnp.full((B,), t, jnp.int32)
        eps = self._denoiser(x, tb, cond)
        x_recon = (
            self._sqrt_recip_ac[t] * x - self._sqrt_recipm1_ac[t] * eps
        )
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = self._post_c1[t] * x_recon + self._post_c2[t] * x
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        return mean + nonzero * jnp.exp(0.5 * self._post_log_var[t]) * noise

    def _ancestral_sample(self, x, cond, rng):
        keys = jax.random.split(rng, self.K_step)
        ts = jnp.arange(self.K_step - 1, -1, -1)
        x, _ = nn.scan(
            lambda mdl, carry, inp: (mdl._p_step(carry, inp[0], cond, inp[1]), None),
            variable_broadcast="params",
            split_rngs={"params": False},
        )(self, x, (ts, keys))
        return x

    def _sampling_grid(self):
        """Descending timestep grid of ``sampling_steps`` points ending
        at t=0 (static — computed from config ints, XLA-friendly)."""
        n = int(self.sampling_steps or max(self.K_step // 10, 1))
        n = max(1, min(n, self.K_step))
        ts = np.unique(
            np.round(np.linspace(self.K_step - 1, 0, n)).astype(np.int64)
        )[::-1]
        return ts  # n=1 -> [K_step-1]: one jump from the noisiest state

    def _ddim_sample(self, x, cond):
        """DDIM (eta=0, Song et al. 2021): deterministic sampling on a
        ``sampling_steps``-point sub-grid; the final step jumps to the
        clean manifold (alpha=1), matching the ancestral sampler's t=0
        posterior (post_c1[0]=1, post_c2[0]=0 -> x0)."""
        ts = self._sampling_grid()
        ac = np.asarray(self._ac)
        a_t = ac[ts]
        a_s = np.append(ac[ts[1:]], 1.0)  # final target: clean state
        B = x.shape[0]

        def step(mdl, x, inp):
            t, at, as_ = inp
            eps = mdl._denoiser(x, jnp.full((B,), t, jnp.int32), cond)
            x0 = jnp.clip(
                (x - jnp.sqrt(1.0 - at) * eps) / jnp.sqrt(at), -1.0, 1.0
            )
            return jnp.sqrt(as_) * x0 + jnp.sqrt(1.0 - as_) * eps, None

        x, _ = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
        )(
            self,
            x,
            (
                jnp.asarray(ts, jnp.int32),
                jnp.asarray(a_t, jnp.float32),
                jnp.asarray(a_s, jnp.float32),
            ),
        )
        return x

    def _dpmpp_sample(self, x, cond):
        """DPM-Solver++(2M) (Lu et al. 2022), data-prediction multistep:
        second-order accurate in lambda = log(alpha/sigma), so 10-20
        denoiser evaluations match ~100 ancestral steps.  The final step
        is first-order (lower_order_final) and lands on the x0 prediction
        directly."""
        ts = self._sampling_grid()
        ac = np.asarray(self._ac, np.float64)[ts]
        alpha = np.sqrt(ac)
        sigma = np.sqrt(1.0 - ac)
        lam = np.log(alpha / np.maximum(sigma, 1e-20))
        n = len(ts)
        # per-step tables; the step i goes from grid state i to i+1
        # (i = n-1 jumps to the clean state and uses first-order D = x0)
        h = np.append(lam[1:] - lam[:-1], 1.0)  # final h unused (masked)
        alpha_next = np.append(alpha[1:], 1.0)
        sigma_next = np.append(sigma[1:], 0.0)
        is_final = np.arange(n) == n - 1
        B = x.shape[0]

        def step(mdl, carry, inp):
            x, x0_prev, h_prev = carry
            t, at, sig_t, h_i, a_nxt, s_nxt, final = inp
            eps = mdl._denoiser(x, jnp.full((B,), t, jnp.int32), cond)
            x0 = jnp.clip((x - sig_t * eps) / jnp.sqrt(at), -1.0, 1.0)
            # 2M correction: D = (1 + 1/(2r)) x0 - 1/(2r) x0_prev with
            # r = h_prev / h; h_prev starts at +big -> coeff 0 (1st order)
            coeff = jnp.where(final, 0.0, h_i / (2.0 * h_prev))
            D = (1.0 + coeff) * x0 - coeff * x0_prev
            x_new = jnp.where(
                final,
                D,
                (s_nxt / jnp.maximum(sig_t, 1e-20)) * x
                - a_nxt * jnp.expm1(-h_i) * D,
            )
            return (x_new, x0, h_i), None

        (x, _, _), _ = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
        )(
            self,
            (x, jnp.zeros_like(x), jnp.asarray(1e30, jnp.float32)),
            (
                jnp.asarray(ts, jnp.int32),
                jnp.asarray(ac, jnp.float32),
                jnp.asarray(sigma, jnp.float32),
                jnp.asarray(h, jnp.float32),
                jnp.asarray(alpha_next, jnp.float32),
                jnp.asarray(sigma_next, jnp.float32),
                jnp.asarray(is_final),
            ),
        )
        return x

    def _plms_sample(self, x, cond, rng):
        """PLMS pseudo-numerical sampler (diffusion.py:207-259) as a scan
        carrying the last 4 noise predictions."""
        interval = int(self.pndm_speedup)
        ts = jnp.arange(self.K_step - interval, -1, -interval)
        if len(ts) == 0:
            # speedup >= K_step: the reference's step range is empty too —
            # degrade to a no-op instead of indexing ts[0]
            return x

        def x_pred(x, noise_t, t):
            a_t = self._ac[t]
            a_prev = self._ac[jnp.maximum(t - interval, 0)]
            sq_t, sq_prev = jnp.sqrt(a_t), jnp.sqrt(a_prev)
            delta = (a_prev - a_t) * (
                x / (sq_t * (sq_t + sq_prev))
                - noise_t
                / (
                    sq_t
                    * (
                        jnp.sqrt((1 - a_prev) * a_t)
                        + jnp.sqrt((1 - a_t) * a_prev)
                    )
                )
            )
            return x + delta

        B = x.shape[0]

        # first step outside the scan: only it needs the second (Heun)
        # denoiser evaluation — running it unconditionally inside the
        # scan would double the denoiser cost of the whole chain (the
        # reference evaluates it only when the noise history is empty)
        t0 = ts[0]
        eps0 = self._denoiser(x, jnp.full((B,), t0, jnp.int32), cond)
        first = x_pred(x, eps0, t0)
        tb_prev = jnp.full((B,), jnp.maximum(t0 - interval, 0), jnp.int32)
        eps_prev = self._denoiser(first, tb_prev, cond)
        x = x_pred(x, (eps0 + eps_prev) / 2, t0)

        def step(mdl, carry, t):
            x, hist, count = carry
            tb = jnp.full((B,), t, jnp.int32)
            eps = mdl._denoiser(x, tb, cond)

            # Adams-Bashforth orders 2-4 depending on available history
            e1 = hist[0]
            e2 = hist[1]
            e3 = hist[2]
            order2 = (3 * eps - e1) / 2
            order3 = (23 * eps - 16 * e1 + 5 * e2) / 12
            order4 = (55 * eps - 59 * e1 + 37 * e2 - 9 * e3) / 24
            eps_prime = jnp.where(
                count == 1, order2, jnp.where(count == 2, order3, order4)
            )
            x_new = x_pred(x, eps_prime, t)
            hist = jnp.stack([eps, hist[0], hist[1]])
            return (x_new, hist, count + 1), None

        hist0 = jnp.stack([eps0, jnp.zeros_like(eps0), jnp.zeros_like(eps0)])
        if self.K_step - interval > 0 and len(ts) > 1:
            (x, _, _), _ = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False},
            )(self, (x, hist0, jnp.asarray(1)), ts[1:])
        return x


class MultiSpeakerGaussianDiffusion(GaussianDiffusion):
    """+ speaker embedding added to the conditioning features
    (diffusion.py:339)."""

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
        spk_embs = self._spk_embs(spks, cond.shape[1])
        return super().__call__(
            cond, lengths, y, spk_embs=spk_embs, train=train
        )

    def inference(self, cond, spks, lengths=None):
        spk_embs = self._spk_embs(spks, cond.shape[1])
        return super().inference(cond, lengths, spk_embs=spk_embs)


def _rel_positional_encoding(T: int, d: int, max_len: int = 5000):
    """ESPnet RelPositionalEncoding table as fs2 builds it
    (reference diffsinger/fs2.py:15-93): the table spans ``max_len``
    REVERSED positions and the first ``T`` rows are used, so position
    values run ``max_len-1 .. max_len-T``."""
    L = max(max_len, T)
    position = jnp.arange(L - 1, L - 1 - T, -1, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d, 2, dtype=jnp.float32) * (-np.log(10000.0) / d)
    )
    pe = jnp.zeros((T, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe[None]


class _FFTBlock(nn.Module):
    """fs2 EncSALayer (reference diffsinger/fs2.py:570-634): PRE-norm
    self-attention with a combined bias-free qkv projection, then a
    pre-norm conv→gelu→linear FFN scaled by ``kernel_size**-0.5``; the
    running state is re-masked after each residual."""

    hidden_dim: int
    num_heads: int
    kernel_size: int
    dropout: float
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        B, T, _ = x.shape
        E, H = self.hidden_dim, self.num_heads
        dk = E // H
        fmask = mask[:, :, None]
        # torch key_padding_mask masks KEYS only (fs2.py:621-622)
        attn_mask = mask[:, None, None, :]
        glorot = nn.initializers.glorot_uniform()
        h = nn.LayerNorm(epsilon=1e-5, name="norm_1")(x)
        qkv = nn.Dense(3 * E, use_bias=False, kernel_init=glorot, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, dk).transpose(0, 2, 1, 3) * (dk**-0.5)
        k = k.reshape(B, T, H, dk).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, dk).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k)
        scores = jnp.where(attn_mask, scores, -1e9)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.attention_dropout, deterministic=not train)(p)
        out = jnp.einsum("bhlm,bhmd->bhld", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)
        out = nn.Dense(E, use_bias=False, kernel_init=glorot, name="out_proj")(out)
        x = (x + nn.Dropout(self.dropout, deterministic=not train)(out)) * fmask

        h = nn.LayerNorm(epsilon=1e-5, name="norm_2")(x)
        kw = self.kernel_size
        h = nn.Conv(4 * E, (kw,), padding=((kw // 2, kw // 2),), name="ffn_1")(h)
        h = h * (kw**-0.5)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.relu_dropout, deterministic=not train)(h)
        h = nn.Dense(E, name="ffn_2")(h)
        x = (x + nn.Dropout(self.dropout, deterministic=not train)(h)) * fmask
        return x


class FFTBlocksEncoder(BaseModel):
    """FastSpeech2-style FFT-block encoder
    (reference nnsvs/diffsinger/fs2.py:667 FFTBlocks, :743 FFTBlocksEncoder):
    relative positional encoding (with a learnable alpha), pre-norm
    self-attention + conv FFN blocks, optional final LayerNorm, optional
    reduction factor and output projection.  ``out_dim=None`` returns the
    hidden states (condition-encoder use inside GaussianDiffusion)."""

    in_dim: int
    hidden_dim: int = 256
    out_dim: Optional[int] = None
    num_layers: int = 4
    num_heads: int = 2
    kernel_size: int = 9  # == reference ffn_kernel_size
    # config-compat alias: reference configs say ffn_kernel_size
    # (fs2.py:750); overrides kernel_size when given
    ffn_kernel_size: Optional[int] = None
    norm: str = "ln"  # only LayerNorm is implemented (fs2.py:755 default)
    dropout: float = 0.1
    use_pos_embed: bool = True
    use_last_norm: bool = True
    use_pos_embed_alpha: bool = True
    reduction_factor: int = 1
    downsample_by_conv: bool = True
    in_ph_start_idx: int = 1
    in_ph_end_idx: int = 50
    embed_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, lengths=None, y=None, spk_embs=None, train: bool = False):
        from ensemble_svs_with_interactions_tpu.models.generic import (
            PhonemeContextEmbedding,
        )

        assert self.norm == "ln", "only LayerNorm FFT blocks are supported"
        B, T = x.shape[0], x.shape[1]
        if lengths is None:
            lengths = jnp.full((B,), T, dtype=jnp.int32)
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        if self.embed_dim is not None:
            x = PhonemeContextEmbedding(
                self.in_dim, self.embed_dim, self.in_ph_start_idx, self.in_ph_end_idx
            )(x)
        r = self.reduction_factor
        if r > 1:
            lengths = lengths // r
            if self.downsample_by_conv:
                x = nn.Conv(
                    x.shape[-1],
                    (r,),
                    strides=(r,),
                    feature_group_count=x.shape[-1],
                    padding="VALID",
                )(x)
            else:
                x = x[:, r - 1 :: r]
            if spk_embs is not None:
                spk_embs = spk_embs[:, r - 1 :: r][:, : x.shape[1]]
        h = nn.Dense(self.hidden_dim, name="fc")(x)
        if spk_embs is not None:
            h = h + nn.Dense(self.hidden_dim, name="spk_fc")(spk_embs)
        T2 = h.shape[1]
        mask = jnp.arange(T2)[None, :] < lengths[:, None]
        fmask = mask[:, :, None]
        if self.use_pos_embed:
            alpha = (
                self.param("pos_embed_alpha", nn.initializers.ones, (1,))
                if self.use_pos_embed_alpha
                else 1.0
            )
            # positions = alpha * (x * sqrt(d) + reversed-pe) (fs2.py:726-730)
            pe = _rel_positional_encoding(T2, self.hidden_dim)
            h = h + alpha * (h * np.sqrt(self.hidden_dim) + pe)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = h * fmask
        ffn_k = (
            self.ffn_kernel_size
            if self.ffn_kernel_size is not None
            else self.kernel_size
        )
        for _ in range(self.num_layers):
            h = _FFTBlock(
                self.hidden_dim, self.num_heads, ffn_k, self.dropout
            )(h, mask, train=train)
        if self.use_last_norm:
            h = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(h) * fmask
        if self.out_dim is None:
            return h
        out = nn.Dense(self.out_dim * r, name="fc_out")(h)
        return out.reshape(B, -1, self.out_dim)

    def inference(self, x, lengths=None):
        return self(x, lengths)


class PitchPredictor(BaseModel):
    """Conv-stack F0 predictor/extractor from acoustic features
    (reference nnsvs/diffsinger/pe.py:200,401): predicts (lf0, vuv) from
    mel-spectrograms, used when F0 is extracted from generated mels."""

    in_dim: int = 80
    hidden_dim: int = 256
    num_layers: int = 5
    kernel_size: int = 5
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        h = x
        for _ in range(self.num_layers):
            h = nn.Conv(self.hidden_dim, (self.kernel_size,), padding="SAME")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(epsilon=1e-5)(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        lf0 = nn.Dense(1)(h)
        vuv = nn.Dense(1)(h)
        return lf0, vuv

    def inference(self, x, lengths=None):
        lf0, vuv = self(x, lengths)
        return jnp.concatenate([lf0, jax.nn.sigmoid(vuv)], axis=-1)


class PitchExtractor(BaseModel):
    """Mel -> F0 extractor (reference nnsvs/diffsinger/pe.py:401): a conv
    mel prenet + residual conv encoder feeding a :class:`PitchPredictor`
    head; at inference the predicted lf0 is zeroed on frames the UV head
    marks unvoiced (the reference's ``lf0[uv > 0] = 0`` gating)."""

    in_dim: int = 80
    hidden_dim: int = 256
    prenet_layers: int = 3
    conv_layers: int = 2
    predictor_layers: int = 5
    kernel_size: int = 5
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, lengths=None, y=None, train: bool = False):
        h = x
        # mel prenet (pe.py Prenet: conv-relu-norm stack + projection)
        for _ in range(self.prenet_layers):
            h = nn.Conv(self.hidden_dim, (self.kernel_size,), padding="SAME")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(epsilon=1e-5)(h)
        h = nn.Dense(self.hidden_dim)(h)
        # residual conv encoder (pe.py ConvStacks, res=True)
        for _ in range(self.conv_layers):
            r = h
            h = nn.Conv(self.hidden_dim, (self.kernel_size,), padding="SAME")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(epsilon=1e-5)(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h) + r
        return PitchPredictor(
            in_dim=self.hidden_dim,
            hidden_dim=self.hidden_dim,
            num_layers=self.predictor_layers,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
        )(h, lengths, train=train)

    def inference(self, x, lengths=None):
        lf0, vuv = self(x, lengths)
        # the head predicts log2(f0); the reference converts to natural
        # log (pe.py:446-456: f0 = 2**lf0; lf0 = log(f0)) and zeroes
        # frames whose raw uv logit is positive (pe.py:458 lf0[uv > 0] = 0)
        return jnp.where(vuv <= 0, lf0 * jnp.log(2.0), 0.0)
