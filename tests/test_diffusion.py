"""Tests for the DiffSinger diffusion stack (mirrors reference
tests/test_diffusion.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.base import PredictionType
from ensemble_svs_with_interactions_tpu.models.diffsinger import (
    DiffNet,
    GaussianDiffusion,
    cosine_beta_schedule,
    linear_beta_schedule,
)

B, T, M, E = 2, 16, 5, 8


def test_beta_schedules():
    lin = linear_beta_schedule(100)
    cos = cosine_beta_schedule(100)
    assert len(lin) == len(cos) == 100
    assert (lin > 0).all() and (lin < 1).all()
    assert (cos >= 0).all() and (cos < 1).all()


def test_diffnet_shapes():
    net = DiffNet(in_dim=M, encoder_hidden_dim=E, residual_layers=2,
                  residual_channels=8)
    spec = jnp.zeros((B, T, M))
    t = jnp.zeros((B,), jnp.int32)
    cond = jnp.zeros((B, T, E))
    v = net.init(jax.random.PRNGKey(0), spec, t, cond)
    out = net.apply(v, spec, t, cond)
    assert out.shape == (B, T, M)
    # zero-initialized output projection -> zero output at init
    assert np.allclose(np.asarray(out), 0.0)


@pytest.fixture
def diffusion():
    return GaussianDiffusion(
        in_dim=E,
        out_dim=M,
        denoise_fn={
            "_target_": "ensemble_svs_with_interactions_tpu.models.diffsinger.DiffNet",
            "in_dim": M,
            "encoder_hidden_dim": E,
            "residual_layers": 2,
            "residual_channels": 8,
        },
        K_step=10,
    )


def test_diffusion_training_forward(diffusion):
    cond = jnp.zeros((B, T, E))
    y = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, M)), jnp.float32)
    v = diffusion.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, jnp.asarray([T, T]), y, train=True,
    )
    noise, x_recon = diffusion.apply(
        v, cond, jnp.asarray([T, T]), y, train=True,
        rngs={"diffusion": jax.random.PRNGKey(2)},
    )
    assert noise.shape == (B, T, M)
    assert x_recon.shape == (B, T, M)
    assert diffusion.prediction_type() == PredictionType.DIFFUSION


def test_diffusion_ancestral_sampling(diffusion):
    cond = jnp.zeros((B, T, E))
    y = jnp.zeros((B, T, M))
    v = diffusion.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, jnp.asarray([T, T]), y, train=True,
    )
    out = diffusion.apply(
        v, cond, jnp.asarray([T, T]), method="inference",
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert out.shape == (B, T, M)
    assert np.isfinite(np.asarray(out)).all()
    # denormalized by norm_scale; magnitude should be O(norm_scale)
    assert np.abs(np.asarray(out)).max() < 100


def test_diffusion_plms_sampling():
    diffusion = GaussianDiffusion(
        in_dim=E,
        out_dim=M,
        denoise_fn={
            "_target_": "ensemble_svs_with_interactions_tpu.models.diffsinger.DiffNet",
            "in_dim": M,
            "encoder_hidden_dim": E,
            "residual_layers": 2,
            "residual_channels": 8,
        },
        K_step=12,
        pndm_speedup=4,
    )
    cond = jnp.zeros((B, T, E))
    y = jnp.zeros((B, T, M))
    v = diffusion.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, jnp.asarray([T, T]), y, train=True,
    )
    out = diffusion.apply(
        v, cond, jnp.asarray([T, T]), method="inference",
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert out.shape == (B, T, M)
    assert np.isfinite(np.asarray(out)).all()


def test_diffusion_plms_speedup_exceeds_k_step():
    """pndm_speedup >= K_step leaves no sampling steps; inference must
    degrade to a finite no-op rather than index an empty step list."""
    diffusion = GaussianDiffusion(
        in_dim=E,
        out_dim=M,
        denoise_fn={
            "_target_": "ensemble_svs_with_interactions_tpu.models.diffsinger.DiffNet",
            "in_dim": M,
            "encoder_hidden_dim": E,
            "residual_layers": 2,
            "residual_channels": 8,
        },
        K_step=4,
        pndm_speedup=8,
    )
    cond = jnp.zeros((B, T, E))
    y = jnp.zeros((B, T, M))
    v = diffusion.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, jnp.asarray([T, T]), y, train=True,
    )
    out = diffusion.apply(
        v, cond, jnp.asarray([T, T]), method="inference",
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert out.shape == (B, T, M)
    assert np.isfinite(np.asarray(out)).all()


def test_diffusion_denoises_constant_signal():
    """After a few training steps on a constant target, sampling should move
    toward that constant (behavioral sanity)."""
    import optax

    diffusion = GaussianDiffusion(
        in_dim=E,
        out_dim=M,
        denoise_fn={
            "_target_": "ensemble_svs_with_interactions_tpu.models.diffsinger.DiffNet",
            "in_dim": M,
            "encoder_hidden_dim": E,
            "residual_layers": 2,
            "residual_channels": 16,
        },
        K_step=10,
        norm_scale=1.0,
    )
    cond = jnp.ones((B, T, E))
    y = jnp.full((B, T, M), 0.5)
    v = diffusion.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, None, y, train=True,
    )
    tx = optax.adam(5e-3)
    opt = tx.init(v["params"])

    @jax.jit
    def step(params, opt, key):
        def loss_fn(p):
            noise, x_recon = diffusion.apply(
                {"params": p}, cond, None, y, train=True, rngs={"diffusion": key}
            )
            return jnp.mean((noise - x_recon) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, up), opt2, loss

    params = v["params"]
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(60):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k)
        if first is None:
            first = float(loss)
    assert float(loss) < first


class _PerfectDenoiser(__import__("flax").linen.Module):
    """Analytically exact eps-predictor for a delta distribution at a
    constant x0: given x_t = sqrt(ac_t) x0 + sqrt(1-ac_t) eps, returns
    eps = (x_t - sqrt(ac_t) x0) / sqrt(1-ac_t).  Any correct sampler must
    recover x0 exactly."""

    x0c: float
    K_step: int

    @__import__("flax").linen.compact
    def __call__(self, x, t, cond):
        ac = jnp.asarray(
            np.cumprod(1.0 - linear_beta_schedule(self.K_step)), jnp.float32
        )
        sa = jnp.sqrt(ac)[t][:, None, None]
        s1 = jnp.sqrt(1.0 - ac)[t][:, None, None]
        return (x - sa * self.x0c) / jnp.maximum(s1, 1e-8)


@pytest.mark.parametrize(
    "sampler,kw,atol",
    [
        ("ancestral", {}, 1e-3),
        ("ddim", {"sampling_steps": 8}, 1e-3),
        ("dpmpp", {"sampling_steps": 8}, 1e-3),
        ("dpmpp", {"sampling_steps": 2}, 1e-3),  # first-order path only
        ("plms", {"pndm_speedup": 5}, 0.05),
    ],
)
def test_samplers_recover_delta_distribution(sampler, kw, atol):
    """With a perfect denoiser for a constant target, every sampler must
    converge to that constant (the DDIM/DPM-Solver++ updates are exact
    for an exact x0 prediction; ancestral's t=0 posterior is x0)."""
    K = 50
    x0c = 0.35
    diffusion = GaussianDiffusion(
        in_dim=E,
        out_dim=M,
        denoise_fn=_PerfectDenoiser(x0c=x0c, K_step=K),
        K_step=K,
        norm_scale=2.0,
        sampler=sampler,
        **kw,
    )
    cond = jnp.zeros((B, T, E))
    y = jnp.full((B, T, M), x0c * 2.0)
    v = diffusion.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, jnp.asarray([T, T]), y, train=True,
    )
    out = diffusion.apply(
        v, cond, jnp.asarray([T, T]), method="inference",
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert out.shape == (B, T, M)
    # denormalized output: x0c * norm_scale
    assert np.allclose(np.asarray(out), x0c * 2.0, atol=atol * 2.0), (
        np.abs(np.asarray(out) - x0c * 2.0).max()
    )


@pytest.mark.parametrize("sampler", ["ddim", "dpmpp"])
def test_fast_samplers_with_diffnet(sampler, diffusion):
    """DDIM/DPM-Solver++ run through the real DiffNet denoiser (shape +
    finiteness; samplers are deterministic so two runs agree)."""
    d = diffusion.clone(sampler=sampler, sampling_steps=4)
    cond = jnp.zeros((B, T, E))
    y = jnp.zeros((B, T, M))
    v = d.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, jnp.asarray([T, T]), y, train=True,
    )
    out1 = d.apply(
        v, cond, jnp.asarray([T, T]), method="inference",
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    out2 = d.apply(
        v, cond, jnp.asarray([T, T]), method="inference",
        rngs={"diffusion": jax.random.PRNGKey(4)},
    )
    assert out1.shape == (B, T, M)
    assert np.isfinite(np.asarray(out1)).all()
    # deterministic given the same initial noise?  No: the initial x_T is
    # drawn from the rng, so different keys differ; but the sampler path
    # itself adds no noise, so equal keys give equal outputs
    out3 = d.apply(
        v, cond, jnp.asarray([T, T]), method="inference",
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert np.allclose(np.asarray(out1), np.asarray(out3))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_init_template_multispeaker_diffusion():
    """The speaker-conditioned template branch must pass a diffusion target
    (MultiSpeakerGaussianDiffusion trains on x0 = y / norm_scale)."""
    from ensemble_svs_with_interactions_tpu.models.diffsinger import (
        MultiSpeakerGaussianDiffusion,
    )
    from ensemble_svs_with_interactions_tpu.utils.templates import init_template

    model = MultiSpeakerGaussianDiffusion(
        in_dim=E,
        out_dim=M,
        denoise_fn={
            "_target_": "ensemble_svs_with_interactions_tpu.models.diffsinger.DiffNet",
            "in_dim": M,
            "encoder_hidden_dim": E + 4,
            "residual_layers": 2,
            "residual_channels": 8,
        },
        K_step=10,
        speaker_embedding={
            "_target_": "ensemble_svs_with_interactions_tpu.models.SpeakerEmbedding",
            "num_embeddings": 2,
            "embedding_dim": 4,
        },
    )
    variables = init_template(model, E, out_dim=M)
    assert "params" in variables
