"""Training-stack tests: datasets/bucketing, metrics parity, losses, and a
mini distributed (8 virtual devices) end-to-end training run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from ensemble_svs_with_interactions_tpu.data.dataset import (
    BucketedBatchIterator,
    FeatsDataset,
    batch_by_size,
    pad_batch,
    prefetch_batches,
)
from ensemble_svs_with_interactions_tpu.train import metrics as M
from ensemble_svs_with_interactions_tpu.train import losses as L
from ensemble_svs_with_interactions_tpu.train.loop import (
    build_optimizer,
    load_params_shape_filtered,
)
from ensemble_svs_with_interactions_tpu.train.trainer import train_model
from ensemble_svs_with_interactions_tpu.utils.config import Config, _wrap
from ensemble_svs_with_interactions_tpu.utils.scalers import StandardScaler


# ---------------------------------------------------------------- batching
def test_batch_by_size():
    lengths = np.array([10, 50, 20, 45, 30, 100])
    batches = batch_by_size(lengths, max_tokens=100)
    all_idx = sorted(i for b in batches for i in b)
    assert all_idx == list(range(6))
    for b in batches:
        T = max(lengths[i] for i in b)
        assert T * len(b) <= 100 or len(b) == 1


def test_pad_batch():
    arrays = [np.ones((10, 3)), np.ones((17, 3))]
    out, lengths = pad_batch(arrays, time_multiple=8, batch_multiple=4)
    assert out.shape == (4, 24, 3)
    assert lengths.tolist() == [10, 17, 0, 0]
    assert out[0, 10:].sum() == 0


@pytest.fixture
def feature_dumps(tmp_path, rng):
    """Synthetic in/out feature dumps with a learnable linear mapping."""
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    D_in, D_out = 8, 3
    W = rng.normal(size=(D_in, D_out)) * 0.5
    for i in range(12):
        T = int(rng.integers(20, 60))
        x = rng.normal(size=(T, D_in)).astype(np.float32)
        y = (x @ W + 0.01 * rng.normal(size=(T, D_out))).astype(np.float32)
        np.save(in_dir / f"utt{i:02d}-feats.npy", x)
        np.save(out_dir / f"utt{i:02d}-feats.npy", y)
    return in_dir, out_dir


def test_feats_dataset_and_iterator(feature_dumps):
    in_dir, out_dir = feature_dumps
    ds = FeatsDataset(in_dir, out_dir)
    assert len(ds) == 12
    it = BucketedBatchIterator(ds, max_tokens=500, time_multiple=16, batch_multiple=4)
    seen = 0
    for batch in it:
        B, T, D = batch["in_feats"].shape
        assert B % 4 == 0 and T % 16 == 0
        assert batch["out_feats"].shape[:2] == (B, T)
        seen += int((batch["lengths"] > 0).sum())
    assert seen == 12


def test_max_frames_filter(feature_dumps):
    in_dir, out_dir = feature_dumps
    ds = FeatsDataset(in_dir, out_dir, max_frames=40)
    assert 0 < len(ds) < 12


def test_prefetch_batches_order_and_errors():
    # order + content preserved
    assert list(prefetch_batches(iter(range(20)), depth=3)) == list(range(20))
    assert list(prefetch_batches(iter([]))) == []

    # producer exceptions re-raise at the consumer
    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch_batches(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)

    # early close stops cleanly (no hang, producer unwound)
    it = prefetch_batches(iter(range(1000)), depth=1)
    assert next(it) == 0
    it.close()


# ---------------------------------------------------------------- metrics
def test_melcd_formula():
    x = np.zeros((1, 4, 3))
    y = np.ones((1, 4, 3))
    expected = 10 * np.sqrt(2) / np.log(10) * np.sqrt(3.0)
    assert np.isclose(M.melcd(x, y, [4]), expected)


def test_vuv_and_f0_metrics():
    vuv = np.array([[[1.0], [1.0], [0.0], [1.0]]])
    pred_vuv = np.array([[[1.0], [0.0], [0.0], [1.0]]])
    assert np.isclose(M.vuv_error(vuv, pred_vuv, [4]), 0.25)
    lf0 = np.log(np.array([[[220.0], [220.0], [1.0], [220.0]]]))
    pred_lf0 = np.log(np.array([[[230.0], [220.0], [1.0], [220.0]]]))
    mse = M.lf0_mean_squared_error(
        lf0, vuv, pred_lf0, pred_vuv, [4], linear_domain=True
    )
    assert np.isclose(mse, 100.0 / 2)  # only frames 0 and 3 voiced in both


def test_compute_distortions_shapes():
    B, T = 2, 10
    ss = [9, 3, 1, 6]
    D = sum(ss)
    rng = np.random.default_rng(0)
    scaler = StandardScaler(np.zeros(D), np.ones(D), np.ones(D))
    pred = rng.normal(size=(B, T, D))
    target = rng.normal(size=(B, T, D))
    dist = M.compute_distortions(
        pred, target, [10, 8], scaler, ss, [True, True, False, True], 3
    )
    assert "ObjEval_MGC_MCD" in dist and "ObjEval_BAP_MCD" in dist
    assert "ObjEval_VUV_ERR" in dist
    assert all(np.isfinite(v) for v in dist.values())


def test_pitch_reg_weight():
    lf0 = np.zeros((1, 100))
    lf0[0, 10:90] = 5.3  # one long note
    w = L.compute_pitch_regularization_weight(lf0, decay_size=10, max_w=0.5)
    assert w.shape == (1, 100, 1)
    assert w[0, 50, 0] == 0.5  # center full weight
    assert w[0, 10, 0] == 0.0  # edge decayed
    assert w[0, 5, 0] == 0.0  # outside note


# ---------------------------------------------------------------- training
def _train_config(in_dir, out_dir, exp_dir, netG, nepochs=12, **train_extra):
    return _wrap(
        {
            "seed": 1234,
            "verbose": 0,
            "data": {
                "train_no_dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                "dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                "batch_max_frames": 400,
                "time_multiple": 16,
            },
            "model": {
                "netG": netG,
                "stream_sizes": [3],
                "has_dynamic_features": [False],
                "num_windows": 1,
            },
            "train": {
                "out_dir": str(exp_dir),
                "nepochs": nepochs,
                "optim": {
                    "optimizer": {"name": "Adam", "params": {"lr": 0.03}},
                    "clip_norm": 5.0,
                },
                **train_extra,
            },
        }
    )


def test_train_model_deterministic_loss_decreases(feature_dumps, tmp_path):
    """Mini e2e training on the 8-device CPU mesh: loss must decrease and
    checkpoints must be written."""
    in_dir, out_dir = feature_dumps
    exp = tmp_path / "exp"
    netG = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
        "in_dim": 8,
        "hidden_dim": 16,
        "out_dim": 3,
        "num_layers": 1,
    }
    cfg = _train_config(in_dir, out_dir, exp, netG, nepochs=15)
    metrics = train_model(cfg)
    assert metrics["Loss"] < 0.5  # linear map is learnable
    assert (exp / "latest.ckpt").exists()
    assert (exp / "best_loss.ckpt").exists()
    assert (exp / "metrics.jsonl").exists()


def test_train_model_amp_bf16(feature_dumps, tmp_path):
    """use_amp=True (reference config.train.use_amp, train_util.py:1428):
    the forward/backward runs in bfloat16 but master params stay f32 and
    the task must still be learnable to the same loss region."""
    in_dir, out_dir = feature_dumps
    exp = tmp_path / "exp_amp"
    netG = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
        "in_dim": 8,
        "hidden_dim": 16,
        "out_dim": 3,
        "num_layers": 1,
    }
    cfg = _train_config(in_dir, out_dir, exp, netG, nepochs=15, use_amp=True)
    metrics = train_model(cfg)
    assert metrics["Loss"] < 0.5  # bf16 must not break learnability


def test_amp_step_keeps_master_params_f32(feature_dumps):
    """Direct step check: with use_amp the MDN (PROBABILISTIC) path yields
    finite f32 losses, f32 updated params, and a loss close to the f32
    step's on the same batch."""
    from ensemble_svs_with_interactions_tpu.models import MDN
    from ensemble_svs_with_interactions_tpu.train.loop import create_train_step

    module = MDN(in_dim=8, hidden_dim=16, out_dim=3, num_gaussians=2)
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 4, 8)),
        jnp.asarray([4]),
    )
    opt = build_optimizer({"name": "Adam", "params": {"lr": 1e-3}})

    def fresh_state():
        # the step donates its state arg: each run needs its own buffers
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        return {
            "params": params,
            "batch_stats": {},
            "opt_state": opt.init(params),
            "step": jnp.asarray(0),
        }

    rng = np.random.default_rng(0)
    batch = {
        "in_feats": jnp.asarray(rng.normal(size=(2, 12, 8)), jnp.float32),
        "out_feats": jnp.asarray(rng.normal(size=(2, 12, 3)), jnp.float32),
        "lengths": jnp.asarray([12, 9]),
    }
    losses = {}
    for amp in (False, True):
        ts, _ = create_train_step(
            module, opt, {"stream_sizes": [3]}, use_amp=amp
        )
        new_state, metrics = ts(fresh_state(), batch, jax.random.PRNGKey(7))
        losses[amp] = float(metrics["Loss"])
        for leaf in jax.tree_util.tree_leaves(new_state["params"]):
            assert leaf.dtype == jnp.float32  # master weights stay f32
    assert np.isfinite(losses[True])
    # bf16 quantization shifts the NLL a little, not qualitatively
    assert abs(losses[True] - losses[False]) < 0.05 * max(
        1.0, abs(losses[False])
    )


def test_train_model_grad_accumulation(feature_dumps, tmp_path):
    """optim.accum_steps wraps the optimizer in optax.MultiSteps: params
    update every k microbatches with the averaged gradient; training still
    converges (same task as the deterministic test, more epochs to cover
    the k-fold fewer updates)."""
    in_dir, out_dir = feature_dumps
    exp = tmp_path / "exp_accum"
    netG = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
        "in_dim": 8,
        "hidden_dim": 16,
        "out_dim": 3,
        "num_layers": 1,
    }
    cfg = _train_config(in_dir, out_dir, exp, netG, nepochs=30)
    cfg["train"]["optim"]["accum_steps"] = 2
    metrics = train_model(cfg)
    assert metrics["Loss"] < 0.5
    assert (exp / "best_loss.ckpt").exists()


def test_train_model_mdn(feature_dumps, tmp_path):
    in_dir, out_dir = feature_dumps
    exp = tmp_path / "exp_mdn"
    netG = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.MDN",
        "in_dim": 8,
        "hidden_dim": 16,
        "out_dim": 3,
        "num_gaussians": 2,
    }
    cfg = _train_config(in_dir, out_dir, exp, netG, nepochs=8)
    metrics = train_model(cfg)
    assert np.isfinite(metrics["Loss"])
    assert (exp / "best_loss.ckpt").exists()


def test_shape_filtered_warm_start(feature_dumps, tmp_path):
    """A checkpoint from one model warm-starts a differently-shaped one."""
    in_dir, out_dir = feature_dumps
    exp = tmp_path / "exp_ws"
    netG = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
        "in_dim": 8,
        "hidden_dim": 16,
        "out_dim": 3,
        "num_layers": 1,
    }
    cfg = _train_config(in_dir, out_dir, exp, netG, nepochs=2)
    train_model(cfg)

    from ensemble_svs_with_interactions_tpu.models import FFN

    bigger = FFN(in_dim=8, hidden_dim=32, out_dim=3, num_layers=1)
    template = bigger.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 4, 8)),
        jnp.asarray([4]),
    )
    restored, copied = load_params_shape_filtered(exp / "latest.ckpt", template)
    assert copied > 0  # at least some tensors matched
    # the mismatched hidden layers kept their fresh shapes
    chex_shapes = jax.tree_util.tree_map(lambda x: x.shape, restored["params"])
    assert chex_shapes == jax.tree_util.tree_map(lambda x: x.shape, template["params"])


def test_train_model_multi_speaker(tmp_path, rng):
    """Multi-speaker training: spk ids from filename prefixes reach the
    model's speaker embedding (reference bin/train_acoustic_multi.py)."""
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir(), out_dir.mkdir()
    # targets depend ONLY on the speaker: a speaker-blind model bottoms
    # out at MSE 1.0, so beating that proves spk ids reach the model
    for spk in ("alto", "soprano"):
        off = 1.0 if spk == "alto" else -1.0
        for i in range(4):
            T = int(rng.integers(20, 40))
            x = rng.normal(size=(T, 8)).astype(np.float32)
            y = np.full((T, 3), off, np.float32)
            np.save(in_dir / f"{spk}_u{i}-feats.npy", x)
            np.save(out_dir / f"{spk}_u{i}-feats.npy", y)

    netG = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.MultiSpeakerFFConvLSTM",
        "in_dim": 8,
        "ff_hidden_dim": 8,
        "conv_hidden_dim": 8,
        "lstm_hidden_dim": 4,
        "out_dim": 3,
        "speaker_embedding": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.SpeakerEmbedding",
            "num_embeddings": 2,
            "embedding_dim": 8,
            "std": 0.5,
        },
    }
    cfg = _train_config(in_dir, out_dir, tmp_path / "exp_ms", netG, nepochs=25)
    cfg = _wrap(
        {
            **dict(cfg),
            "data": {**dict(cfg.data), "spk_names": ["alto", "soprano"]},
            "train": {
                **dict(cfg.train),
                "optim": {
                    "optimizer": {"name": "Adam", "params": {"lr": 0.01}},
                    "clip_norm": 5.0,
                },
            },
        }
    )
    metrics = train_model(cfg, is_acoustic=False)
    assert np.isfinite(metrics["Loss"])
    # speaker-blind floor is 1.0 (unit offsets); the spk embedding must
    # push well below it
    assert metrics["Loss"] < 0.5


def test_train_random_segments(feature_dumps, tmp_path):
    """use_random_segments crops training batches to one static length
    (reference collate_fn_random_segments)."""
    in_dir, out_dir = feature_dumps
    netG = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
        "in_dim": 8,
        "hidden_dim": 16,
        "out_dim": 3,
        "num_layers": 1,
    }
    # the iterator sizes batches by the CAPPED length, so short crops
    # pack more items per batch -> fewer optimizer steps per epoch;
    # a few extra epochs keep the convergence assertion meaningful
    cfg = _train_config(in_dir, out_dir, tmp_path / "exp_seg", netG, nepochs=16)
    cfg = _wrap(
        {
            **dict(cfg),
            "data": {
                **dict(cfg.data),
                "use_random_segments": True,
                "segment_length": 16,
            },
        }
    )
    metrics = train_model(cfg)
    assert np.isfinite(metrics["Loss"])
    assert metrics["Loss"] < 0.5  # still learns the linear map


def test_train_diffusion_model(feature_dumps, tmp_path):
    """A DIFFUSION netG trains end to end through the generic trainer
    (init passes a target + the 'diffusion' rng; the loss is the
    denoiser's noise-reconstruction error)."""
    in_dir, out_dir = feature_dumps
    netG = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.diffsinger.GaussianDiffusion",
        "in_dim": 8,
        "out_dim": 3,
        "K_step": 10,
        "denoise_fn": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.diffsinger.DiffNet",
            "in_dim": 3,
            "encoder_hidden_dim": 8,
            "residual_channels": 8,
            "residual_layers": 2,
        },
        "encoder": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
            "in_dim": 8, "hidden_dim": 8, "out_dim": 8, "num_layers": 1,
        },
    }
    cfg = _train_config(in_dir, out_dir, tmp_path / "exp_diff", netG, nepochs=2)
    metrics = train_model(cfg)
    assert np.isfinite(metrics["Loss"])
    assert (tmp_path / "exp_diff" / "latest.ckpt").exists()


def test_train_single_track_multistream_hybrid(tmp_path, rng):
    """MULTISTREAM_HYBRID single-track models return an already-
    concatenated (B, T, D) array; the train step must split it back into
    streams before the multistream loss (regression: the loss asserted
    len(streams) == len(pred) against the batch dimension)."""
    pre = "ensemble_svs_with_interactions_tpu.models"
    D_in, ss = 8, [3, 1, 1, 2]
    D_out = sum(ss)
    lf0_idx = 5
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    for i in range(6):
        T = int(rng.integers(20, 50))
        x = rng.normal(size=(T, D_in)).astype(np.float32)
        x[:, lf0_idx] = rng.uniform(0.2, 0.8, size=T)  # normalized score lf0
        y = rng.normal(size=(T, D_out)).astype(np.float32)
        np.save(in_dir / f"utt{i:02d}-feats.npy", x)
        np.save(out_dir / f"utt{i:02d}-feats.npy", y)

    lf0_stats = dict(
        in_lf0_idx=lf0_idx, in_lf0_min=4.5, in_lf0_max=6.5,
        out_lf0_idx=3, out_lf0_mean=float(np.log(220.0)), out_lf0_scale=0.1,
    )
    netG = {
        "_target_": f"{pre}.acoustic.MultistreamSeparateF0ParametricModel",
        "in_dim": D_in, "out_dim": D_out, "stream_sizes": ss,
        "reduction_factor": 1, "in_rest_idx": 0, "encoder": None,
        "lf0_model": {
            "_target_": f"{pre}.acoustic.ResF0Conv1dResnet",
            "in_dim": D_in, "hidden_dim": 8, "out_dim": 1, "num_layers": 1,
            **lf0_stats,
        },
        "mgc_model": {
            "_target_": f"{pre}.FFN",
            "in_dim": D_in, "hidden_dim": 8, "out_dim": ss[0], "num_layers": 1,
        },
        "vuv_model": {
            "_target_": f"{pre}.FFN",
            "in_dim": D_in, "hidden_dim": 8, "out_dim": ss[2], "num_layers": 1,
        },
        "bap_model": {
            "_target_": f"{pre}.FFN",
            "in_dim": D_in, "hidden_dim": 8, "out_dim": ss[3], "num_layers": 1,
        },
        **{k: lf0_stats[k] for k in ("in_lf0_idx", "in_lf0_min", "in_lf0_max",
                                     "out_lf0_idx", "out_lf0_mean",
                                     "out_lf0_scale")},
    }
    exp = tmp_path / "exp_hybrid"
    cfg = _train_config(in_dir, out_dir, exp, netG, nepochs=2)
    cfg.model["stream_sizes"] = ss
    cfg.model["has_dynamic_features"] = [False] * 4
    metrics = train_model(cfg)
    assert np.isfinite(metrics["Loss"])
    assert (exp / "latest.ckpt").exists()


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    """A mesh-sharded train state survives save -> restore -> resume with a
    BITWISE-continued optimizer trajectory (the first distributed path a
    real multi-chip user hits; reference equivalent: rank-0 save_checkpoint
    + _resume, train_util.py:1290-1384).  Runs on the conftest 8-CPU-device
    pool: batch sharded over the data axis, state replicated."""
    from ensemble_svs_with_interactions_tpu.models import FFN
    from ensemble_svs_with_interactions_tpu.parallel import (
        make_mesh,
        replicate_tree,
        shard_batch,
    )
    from ensemble_svs_with_interactions_tpu.train.loop import (
        TrainState,
        create_train_step,
        load_checkpoint,
        save_checkpoint,
    )

    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest virtual device pool

    module = FFN(in_dim=8, hidden_dim=16, out_dim=3, num_layers=1)
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 4, 8)),
        jnp.asarray([4]),
    )
    opt = build_optimizer({"name": "Adam", "params": {"lr": 1e-2}})
    # donate=False: the roundtrip keeps references to intermediate states
    ts, _ = create_train_step(module, opt, {"stream_sizes": [3]}, donate=False)

    rng = np.random.default_rng(0)
    batch = shard_batch(
        {
            "in_feats": rng.normal(size=(8, 12, 8)).astype(np.float32),
            "out_feats": rng.normal(size=(8, 12, 3)).astype(np.float32),
            "lengths": np.full((8,), 12, np.int32),
        },
        mesh,
    )

    def fresh_state():
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        return replicate_tree(
            {
                "params": params,
                "batch_stats": {},
                "opt_state": opt.init(params),
                "step": jnp.asarray(0),
            },
            mesh,
        )

    def key(i):
        return jax.random.fold_in(jax.random.PRNGKey(42), i)

    # uninterrupted run: 4 steps, remember the state after step 2
    state = fresh_state()
    losses_a = []
    mid_tree = None
    for i in range(4):
        if i == 2:
            mid_tree = state
        state, metrics = ts(state, batch, key(i))
        losses_a.append(float(metrics["Loss"]))
    final_a = state["params"]

    # save the MID-RUN sharded state through the real checkpoint writer
    mid = TrainState(
        params=mid_tree["params"],
        batch_stats=mid_tree["batch_stats"],
        opt_state=mid_tree["opt_state"],
        step=int(mid_tree["step"]),
    )
    save_checkpoint(tmp_path, mid, epoch=2)
    ckpt = tmp_path / "latest.ckpt"
    assert ckpt.exists()

    # restore into a fresh template, re-enter the mesh, resume steps 2..3
    template = TrainState(
        params=jax.tree_util.tree_map(np.zeros_like, variables["params"]),
        batch_stats={},
        opt_state=jax.tree_util.tree_map(
            np.zeros_like, jax.device_get(opt.init(variables["params"]))
        ),
        step=0,
    )
    restored = load_checkpoint(ckpt, template)
    assert restored.step == 2
    state_b = replicate_tree(
        {
            "params": restored.params,
            "batch_stats": restored.batch_stats,
            "opt_state": restored.opt_state,
            "step": jnp.asarray(restored.step),
        },
        mesh,
    )
    from jax.sharding import PartitionSpec as P

    for leaf in jax.tree_util.tree_leaves(state_b["params"]):
        assert leaf.sharding.spec == P()  # replicated over the mesh

    losses_b = []
    for i in range(2, 4):
        state_b, metrics = ts(state_b, batch, key(i))
        losses_b.append(float(metrics["Loss"]))

    # bitwise-continued trajectory: identical losses AND identical params
    assert losses_b == losses_a[2:], (losses_b, losses_a)
    assert int(state_b["step"]) == int(state["step"]) == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(final_a),
        jax.tree_util.tree_leaves(state_b["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
