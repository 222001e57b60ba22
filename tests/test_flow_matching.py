"""Flow-matching acoustic decoder (beyond-reference family; contract-
compatible with GaussianDiffusion's PredictionType.DIFFUSION slot)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.base import PredictionType
from ensemble_svs_with_interactions_tpu.models.flow_matching import (
    FlowMatching,
    MultiSpeakerFlowMatching,
)

B, T, M, E = 2, 16, 5, 8

_DIFFNET = {
    "_target_": "ensemble_svs_with_interactions_tpu.models.diffsinger.DiffNet",
    "in_dim": M,
    "encoder_hidden_dim": E,
    "residual_layers": 2,
    "residual_channels": 8,
}


class _PerfectVF(nn.Module):
    """Exact rectified-flow velocity for a delta distribution at x1c:
    on the straight path x_t = (1-t) x0 + t x1c the marginal velocity is
    (x1c - x_t) / (1 - t).  Any correct ODE integrator must land on x1c."""

    x1c: float
    time_scale: float

    @nn.compact
    def __call__(self, x, t, cond):
        tt = (t / self.time_scale)[:, None, None]
        return (self.x1c - x) / jnp.maximum(1.0 - tt, 1e-6)


@pytest.mark.parametrize("solver,steps", [
    ("euler", 8), ("midpoint", 4), ("euler", 1),
])
def test_flow_matching_recovers_delta_distribution(solver, steps):
    x1c = 0.4
    fm = FlowMatching(
        in_dim=E,
        out_dim=M,
        denoise_fn=_PerfectVF(x1c=x1c, time_scale=1000.0),
        norm_scale=2.0,
        sampling_steps=steps,
        solver=solver,
    )
    cond = jnp.zeros((B, T, E))
    y = jnp.full((B, T, M), x1c * 2.0)
    v = fm.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, jnp.asarray([T, T]), y, train=True,
    )
    out = fm.apply(
        v, cond, jnp.asarray([T, T]), method="inference",
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert out.shape == (B, T, M)
    # the exact field is constant along each trajectory, so even 1-step
    # Euler is exact here (up to the 1e-6 division clamp)
    assert np.allclose(np.asarray(out), x1c * 2.0, atol=2e-3), (
        np.abs(np.asarray(out) - x1c * 2.0).max()
    )


def test_flow_matching_training_contract():
    fm = FlowMatching(in_dim=E, out_dim=M, denoise_fn=dict(_DIFFNET))
    assert fm.prediction_type() == PredictionType.DIFFUSION
    cond = jnp.zeros((B, T, E))
    y = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, T, M)), jnp.float32
    )
    v = fm.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, jnp.asarray([T, T]), y, train=True,
    )
    v_target, v_pred = fm.apply(
        v, cond, jnp.asarray([T, T]), y, train=True,
        rngs={"diffusion": jax.random.PRNGKey(2)},
    )
    assert v_target.shape == v_pred.shape == (B, T, M)
    # DiffNet output projection is zero-initialized
    assert np.allclose(np.asarray(v_pred), 0.0)


def test_flow_matching_loss_decreases():
    import optax

    fm = FlowMatching(
        in_dim=E, out_dim=M,
        denoise_fn=dict(_DIFFNET, residual_channels=16),
        norm_scale=1.0, sampling_steps=4,
    )
    cond = jnp.ones((B, T, E))
    y = jnp.full((B, T, M), 0.5)
    v = fm.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, None, y, train=True,
    )
    tx = optax.adam(5e-3)
    opt = tx.init(v["params"])

    @jax.jit
    def step(params, opt, key):
        def loss_fn(p):
            tgt, pred = fm.apply(
                {"params": p}, cond, None, y, train=True,
                rngs={"diffusion": key},
            )
            return jnp.mean((tgt - pred) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, up), opt2, loss

    params, key, first = v["params"], jax.random.PRNGKey(0), None
    for _ in range(60):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_flow_matching_through_real_trainer(tmp_path):
    """FlowMatching trains through the generic trainer's DIFFUSION branch
    (bucketed batches, masked criterion on the (target, pred) pair) and
    checkpoints."""
    from ensemble_svs_with_interactions_tpu.train.trainer import train_model
    from ensemble_svs_with_interactions_tpu.utils.config import _wrap

    rng = np.random.default_rng(0)
    D_in, ss = 8, [5]
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir(), out_dir.mkdir()
    for i in range(4):
        Tl = int(rng.integers(24, 48))
        np.save(in_dir / f"u{i}-feats.npy",
                rng.normal(size=(Tl, D_in)).astype(np.float32))
        np.save(out_dir / f"u{i}-feats.npy",
                rng.normal(size=(Tl, sum(ss))).astype(np.float32))
    netG = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.flow_matching.FlowMatching",
        "in_dim": D_in, "out_dim": sum(ss), "norm_scale": 1.0,
        "sampling_steps": 3,
        "denoise_fn": dict(_DIFFNET),
    }
    cfg = _wrap({
        "seed": 1234, "verbose": 0,
        "data": {"train_no_dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                 "dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                 "batch_max_frames": 400, "time_multiple": 16},
        "model": {"netG": netG, "stream_sizes": ss,
                  "has_dynamic_features": [False],
                  "num_windows": 1},
        "train": {"out_dir": str(tmp_path / "exp"), "nepochs": 2,
                  "optim": {"optimizer": {"name": "Adam",
                                          "params": {"lr": 0.01}},
                            "clip_norm": 5.0}},
    })
    metrics = train_model(cfg)
    assert np.isfinite(metrics["Loss"])
    assert (tmp_path / "exp" / "latest.ckpt").exists()


def test_multispeaker_flow_matching():
    fm = MultiSpeakerFlowMatching(
        in_dim=E,
        out_dim=M,
        denoise_fn=dict(_DIFFNET, encoder_hidden_dim=E + 4),
        sampling_steps=2,
        speaker_embedding={
            "_target_": "ensemble_svs_with_interactions_tpu.models.SpeakerEmbedding",
            "num_embeddings": 3,
            "embedding_dim": 4,
        },
    )
    # encoderless path: spk embs only reach the net through an encoder
    # (matching the reference MultiSpeakerGaussianDiffusion,
    # diffusion.py:383-385)
    cond = jnp.zeros((B, T, E + 4))
    spks = jnp.asarray([0, 2])
    y = jnp.zeros((B, T, M))
    v = fm.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        cond, spks, jnp.asarray([T, T]), y, train=True,
    )
    out = fm.apply(
        v, cond, spks, jnp.asarray([T, T]), method="inference",
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert out.shape == (B, T, M)
    assert np.isfinite(np.asarray(out)).all()
