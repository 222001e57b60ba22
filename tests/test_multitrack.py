"""Multitrack tests: note merge, pairing, interaction losses, models,
mini training runs, and generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.data.multitrack import (
    MultiTrackBatchIterator,
    MultiTrackFeatsDataset,
    merge_tracks_by_notes,
    pair_multitrack_files,
)
from ensemble_svs_with_interactions_tpu.train.multitrack import (
    interaction_weight,
    multitrack_acoustic_loss,
)
from ensemble_svs_with_interactions_tpu.utils.config import _wrap, instantiate


# ---------------------------------------------------------------- merge
def test_merge_tracks_by_notes():
    # track A notes at t=0,10,20; track B at t=0,15,20
    x0 = np.arange(6, dtype=np.float32).reshape(3, 2) + 1
    y0 = x0 * 10
    t0 = np.array([0, 10, 20])
    x1 = np.arange(6, dtype=np.float32).reshape(3, 2) + 100
    y1 = x1 * 10
    t1 = np.array([0, 15, 20])
    mx0, my0, m0, mx1, my1, m1 = merge_tracks_by_notes(x0, y0, t0, x1, y1, t1)
    # merged timeline: 0(both), 10(A), 15(B), 20(both) -> length 4
    assert len(mx0) == 4
    assert m0.tolist() == [True, True, False, True]
    assert m1.tolist() == [True, False, True, True]
    # zero rows where absent
    assert np.allclose(mx0[2], 0)
    assert np.allclose(mx1[1], 0)
    # values preserved where present
    assert np.allclose(mx0[1], x0[1])
    assert np.allclose(mx1[2], x1[1])
    assert np.allclose(my0[m0], y0)
    assert np.allclose(my1[m1], y1)


def test_merge_identical_tracks_is_identity():
    x = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    t = np.arange(5) * 10
    mx0, _, m0, mx1, _, m1 = merge_tracks_by_notes(x, x, t, x, x, t)
    assert len(mx0) == 5
    assert m0.all() and m1.all()
    assert np.allclose(mx0, x) and np.allclose(mx1, x)


# ---------------------------------------------------------------- pairing
@pytest.fixture
def multitrack_dumps(tmp_path, rng):
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    # 2 speakers x 2 segments, frame-aligned tracks
    for spk in ("alto", "soprano"):
        for seg in ("seg1", "seg2"):
            T = 40 if seg == "seg1" else 56
            x = rng.normal(size=(T, 8)).astype(np.float32)
            y = rng.normal(size=(T, 17)).astype(np.float32)
            times = (np.arange(T) * 50000).astype(np.int64)
            np.save(in_dir / f"{spk}_{seg}-feats.npy", x)
            np.save(out_dir / f"{spk}_{seg}-feats.npy", y)
            np.save(in_dir / f"{spk}_{seg}-times.npy", times)
    return in_dir, out_dir


def test_pairing(multitrack_dumps):
    in_dir, out_dir = multitrack_dumps
    pairs = pair_multitrack_files(in_dir, out_dir)
    # per segment: (alto,alto), (alto,soprano), (soprano,soprano) = 3 pairs
    assert len(pairs) == 6
    ds = MultiTrackFeatsDataset(in_dir, out_dir, ["alto", "soprano"])
    item = ds[0]
    assert item["x0"].shape[1] == 8
    assert item["spk0"] in (0, 1)


def test_multitrack_iterator_frames(multitrack_dumps):
    in_dir, out_dir = multitrack_dumps
    ds = MultiTrackFeatsDataset(in_dir, out_dir, ["alto", "soprano"])
    it = MultiTrackBatchIterator(
        ds, sync="frames", max_tokens=1000, time_multiple=8, batch_multiple=2
    )
    total = 0
    for batch in it:
        B, T, D = batch["in_feats0"].shape
        assert batch["in_feats1"].shape == (B, T, D)
        assert batch["mask0"].shape == (B, T)
        assert T % 8 == 0 and B % 2 == 0
        total += int((batch["lengths"] > 0).sum())
    assert total == 6


def test_multitrack_iterator_notes(multitrack_dumps):
    in_dir, out_dir = multitrack_dumps
    ds = MultiTrackFeatsDataset(
        in_dir, out_dir, ["alto", "soprano"], load_times=True
    )
    it = MultiTrackBatchIterator(ds, sync="notes", max_tokens=1000, time_multiple=8)
    batch = next(iter(it))
    # identical times -> merged length == original length; masks true on valid
    B, T, D = batch["in_feats0"].shape
    assert batch["mask0"][batch["lengths"] > 0].any()


# ---------------------------------------------------------------- losses
def test_interaction_weight_schedule():
    assert interaction_weight(0.5, 10, 100) == 0.5
    assert np.isclose(interaction_weight("exponential", 100, 100), 1.0)
    assert np.isclose(interaction_weight("exponential", 90, 100), 0.5)
    assert interaction_weight(None, 1, 10) == 0.0


def test_multitrack_acoustic_loss_math():
    B, T = 1, 8
    ss = [3, 1, 1, 2]
    D = sum(ss)
    rng = np.random.default_rng(0)
    out_main = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    out_sub = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    # make all frames voiced in both (vuv stream index: dims 4)
    out_main = out_main.at[:, :, 4].set(1.0)
    out_sub = out_sub.at[:, :, 4].set(1.0)
    mask = jnp.ones((B, T, 1))

    # perfect predictions -> all losses zero
    pred_main = [out_main[..., :3], out_main[..., 3:4], out_main[..., 4:5], out_main[..., 5:]]
    pred_sub = [out_sub[..., :3], out_sub[..., 3:4], out_sub[..., 4:5], out_sub[..., 5:]]
    lf, li, lm = multitrack_acoustic_loss(
        pred_main, pred_sub, out_main, out_sub, mask, ss
    )
    assert float(lf) < 1e-10 and float(li) < 1e-10 and float(lm) < 1e-10

    # shift BOTH tracks' lf0 by the same constant: feats loss > 0 but the
    # interaction (difference) loss stays zero
    pred_main2 = list(pred_main)
    pred_sub2 = list(pred_sub)
    pred_main2[1] = pred_main[1] + 1.0
    pred_sub2[1] = pred_sub[1] + 1.0
    lf2, li2, _ = multitrack_acoustic_loss(
        pred_main2, pred_sub2, out_main, out_sub, mask, ss
    )
    assert float(lf2) > 0.01
    assert float(li2) < 1e-10

    # shift only the main track's lf0: interaction loss fires
    pred_main3 = list(pred_main)
    pred_main3[1] = pred_main[1] + 1.0
    _, li3, _ = multitrack_acoustic_loss(
        pred_main3, pred_sub, out_main, out_sub, mask, ss
    )
    assert float(li3) > 0.5


def test_interaction_loss_only_on_both_voiced_frames():
    B, T = 1, 4
    ss = [2, 1, 1, 1]
    D = sum(ss)
    out_main = jnp.zeros((B, T, D)).at[:, :2, 3].set(1.0)  # voiced frames 0,1
    out_sub = jnp.zeros((B, T, D)).at[:, 1:3, 3].set(1.0)  # voiced frames 1,2
    mask = jnp.ones((B, T, 1))
    pred_main = [out_main[..., :2], out_main[..., 2:3] + 5.0, out_main[..., 3:4], out_main[..., 4:]]
    pred_sub = [out_sub[..., :2], out_sub[..., 2:3], out_sub[..., 3:4], out_sub[..., 4:]]
    _, li, _ = multitrack_acoustic_loss(
        pred_main, pred_sub, out_main, out_sub, mask, ss
    )
    # only frame 1 is voiced in both; diff error there is 5^2
    assert np.isclose(float(li), 25.0)


def test_sub_stop_gradient():
    """sub_require_grad=False must zero gradients flowing through pred_sub."""
    ss = [2, 1, 1, 1]
    out_main = jnp.ones((1, 4, 5))
    out_sub = jnp.ones((1, 4, 5))
    mask = jnp.ones((1, 4, 1))

    def loss_of(p, sub_require_grad):
        pred_main = [jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 1)), jnp.ones((1, 4, 1)), jnp.zeros((1, 4, 1))]
        pred_sub = [jnp.zeros((1, 4, 2)), p * jnp.ones((1, 4, 1)), jnp.ones((1, 4, 1)), jnp.zeros((1, 4, 1))]
        _, li, _ = multitrack_acoustic_loss(
            pred_main, pred_sub, out_main, out_sub, mask, ss,
            sub_require_grad=sub_require_grad,
        )
        return li

    g_with = jax.grad(loss_of)(1.0, True)
    g_without = jax.grad(loss_of)(1.0, False)
    assert abs(float(g_with)) > 0
    assert float(g_without) == 0.0


# ---------------------------------------------------------------- training
@pytest.mark.parametrize("use_amp", [False, True])
def test_multitrack_timing_training(multitrack_dumps, tmp_path, use_amp):
    from ensemble_svs_with_interactions_tpu.train.multitrack_trainer import (
        train_multitrack_model,
    )

    in_dir, out_dir = multitrack_dumps
    # timing needs 1-dim targets
    for p in out_dir.glob("*-feats.npy"):
        np.save(p, np.load(p)[:, :1])
    cfg = _wrap(
        {
            "seed": 1,
            "verbose": 0,
            "data": {
                "train_no_dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                "dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                "spk_names": ["alto", "soprano"],
                "batch_max_frames": 2000,
                "time_multiple": 8,
            },
            "model": {
                "netG": {
                    # in_dim is PER-TRACK (reference convention: the model
                    # consumes concat(x_main, x_sub) = 2*in_dim features)
                    "_target_": "ensemble_svs_with_interactions_tpu.models.MultiTrackVariancePredictor",
                    "in_dim": 8,
                    "out_dim": 1,
                    "num_speaker": 2,
                    "spk_embed_dim": 4,
                    "num_layers": 1,
                    "hidden_dim": 8,
                    "use_mdn": True,
                    "num_gaussians": 2,
                },
                "stream_sizes": [1],
                "has_dynamic_features": [False],
                "num_windows": 1,
            },
            "train": {
                "out_dir": str(tmp_path / "exp_mt_timing"),
                "nepochs": 3,
                "use_amp": use_amp,
                "optim": {"optimizer": {"name": "Adam", "params": {"lr": 0.005}}},
            },
        }
    )
    metrics = train_multitrack_model(cfg, is_acoustic=False)
    assert np.isfinite(metrics["Loss"])
    assert (tmp_path / "exp_mt_timing" / "best_loss.ckpt").exists()


def _tiny_multitrack_acoustic_netG(in_dim=8, out_dim=17):
    enc_out = 6
    return {
        "_target_": "ensemble_svs_with_interactions_tpu.models.acoustic.MultiTrackMultistreamSeparateF0ParametricModel",
        "in_dim": in_dim,
        "out_dim": out_dim,
        "stream_sizes": [10, 1, 1, 5],
        "reduction_factor": 2,
        "in_rest_idx": 0,
        "in_lf0_idx": 5,
        "out_lf0_idx": 10,
        "in_lf0_min": 5.0,
        "in_lf0_max": 6.5,
        "out_lf0_mean": 5.9,
        "out_lf0_scale": 0.23,
        "encoder": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.MultiTrackLSTMEncoder",
            "in_dim": in_dim,
            "hidden_dim": 4,
            "out_dim": enc_out,
            "num_layers": 1,
        },
        "lf0_model": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.acoustic.MultiTrackBiLSTMResF0NonAttentiveDecoder",
            "in_dim": in_dim,
            "out_dim": 1,
            "ff_hidden_dim": 8,
            "conv_hidden_dim": 8,
            "lstm_hidden_dim": 4,
            "num_lstm_layers": 1,
            "decoder_layers": 1,
            "decoder_hidden_dim": 8,
            "prenet_layers": 0,
            "reduction_factor": 2,
            "downsample_by_conv": True,
            "in_lf0_idx": 5,
            "out_lf0_idx": 0,
            "in_lf0_min": 5.0,
            "in_lf0_max": 6.5,
            "out_lf0_mean": 5.9,
            "out_lf0_scale": 0.23,
        },
        "mgc_model": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFConvLSTM",
            "in_dim": enc_out + 2,
            "ff_hidden_dim": 8,
            "conv_hidden_dim": 8,
            "lstm_hidden_dim": 4,
            "out_dim": 10,
        },
        "vuv_model": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFConvLSTM",
            "in_dim": enc_out + 2,
            "ff_hidden_dim": 8,
            "conv_hidden_dim": 8,
            "lstm_hidden_dim": 4,
            "out_dim": 1,
        },
        "bap_model": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFConvLSTM",
            "in_dim": enc_out + 2,
            "ff_hidden_dim": 8,
            "conv_hidden_dim": 8,
            "lstm_hidden_dim": 4,
            "out_dim": 5,
        },
        "speaker_embedding": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.SpeakerEmbedding",
            "num_embeddings": 2,
            "embedding_dim": in_dim,
        },
    }


def test_multitrack_acoustic_training(multitrack_dumps, tmp_path):
    from ensemble_svs_with_interactions_tpu.train.multitrack_trainer import (
        train_multitrack_model,
    )

    in_dir, out_dir = multitrack_dumps
    D = 17
    scaler_prefix = str(tmp_path / "out_acoustic_scaler")
    np.save(f"{scaler_prefix}_mean.npy", np.zeros(D, np.float64))
    np.save(f"{scaler_prefix}_var.npy", np.ones(D, np.float64))
    np.save(f"{scaler_prefix}_scale.npy", np.ones(D, np.float64))
    cfg = _wrap(
        {
            "seed": 1,
            "verbose": 0,
            "data": {
                "train_no_dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                "dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                "spk_names": ["alto", "soprano"],
                "batch_max_frames": 2000,
                "time_multiple": 8,
                "out_scaler_prefix": scaler_prefix,
                "sample_rate": 24000,
            },
            "model": {
                "netG": _tiny_multitrack_acoustic_netG(),
                "stream_sizes": [10, 1, 1, 5],
                "has_dynamic_features": [False, False, False, False],
                "num_windows": 1,
            },
            "train": {
                "out_dir": str(tmp_path / "exp_mt_ac"),
                "nepochs": 1,  # suite diet: epoch 2 repeated identical assertions
                "pitch_reg_weight": 1.0,
                "logf0_diff_weight": "exponential",
                "mgc_diff_weight": 1.0,
                "sub_require_grad": False,
                "eval_render": True,
                "optim": {"optimizer": {"name": "Adam", "params": {"lr": 0.002}}},
            },
        }
    )
    metrics = train_multitrack_model(cfg, is_acoustic=True)
    assert np.isfinite(metrics["Loss"])
    assert "Loss_LogF0_Interaction" in metrics
    assert "Loss_MGC-0th_Interaction" in metrics
    assert "ObjEval_MGC_MCD" in metrics
    assert (tmp_path / "exp_mt_ac" / "best_loss.ckpt").exists()
    # dev rendering produced parameter plots (and possibly wavs)
    renders = list((tmp_path / "exp_mt_ac" / "eval").rglob("*_params.png"))
    assert renders, "eval_render produced no plots"


def test_mgc0_interaction_zero_for_hybrid():
    """The reference computes the 0th-mgc interaction only in its generic
    (non-hybrid) branch; MULTISTREAM_HYBRID models get 0
    (train_acoustic_multitrack.py:257-266 vs :291-292)."""
    from ensemble_svs_with_interactions_tpu.base import PredictionType

    B, T = 1, 8
    ss = [3, 1, 1, 2]
    D = sum(ss)
    rng = np.random.default_rng(0)
    out_main = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    out_sub = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = jnp.ones((B, T, 1))
    split = lambda o: [o[..., :3], o[..., 3:4], o[..., 4:5], o[..., 5:]]
    pred_main = split(out_main)
    pred_main[0] = pred_main[0] + 2.0  # mgc mismatch on main only
    pred_sub = split(out_sub)
    _, _, lm_hybrid = multitrack_acoustic_loss(
        pred_main, pred_sub, out_main, out_sub, mask, ss,
        prediction_type=PredictionType.MULTISTREAM_HYBRID,
    )
    _, _, lm_det = multitrack_acoustic_loss(
        jnp.concatenate(pred_main, axis=-1),
        jnp.concatenate(pred_sub, axis=-1),
        out_main, out_sub, mask, ss,
        prediction_type=PredictionType.DETERMINISTIC,
    )
    assert float(lm_hybrid) == 0.0
    assert float(lm_det) > 0.5


def test_spk_id_underscored_names_and_unknown(tmp_path):
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    rng = np.random.default_rng(0)
    for spk in ("lead_vocal", "backing"):
        x = rng.normal(size=(10, 4)).astype(np.float32)
        np.save(in_dir / f"{spk}_seg1-feats.npy", x)
        np.save(out_dir / f"{spk}_seg1-feats.npy", x)
    ds = MultiTrackFeatsDataset(in_dir, out_dir, ["lead_vocal", "backing"])
    assert ds._spk_id(in_dir / "lead_vocal_seg1-feats.npy") == 0
    assert ds._spk_id(in_dir / "backing_seg1-feats.npy") == 1
    with pytest.raises(ValueError, match="cannot map"):
        ds._spk_id(in_dir / "tenor_seg1-feats.npy")


def test_merged_lengths_match_actual_merge(tmp_path):
    """merged_lengths() must equal the realized two-pointer merge length
    so note-synced batch sizing bounds the padded batch."""
    rng = np.random.default_rng(7)
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    # disjoint onsets except a shared start -> merged ~ len0 + len1 - 1
    specs = {"alto": np.array([0, 3, 7, 12]), "soprano": np.array([0, 2, 5, 9, 14])}
    for spk, times in specs.items():
        T = len(times)
        np.save(in_dir / f"{spk}_seg1-feats.npy",
                rng.normal(size=(T, 4)).astype(np.float32))
        np.save(out_dir / f"{spk}_seg1-feats.npy",
                rng.normal(size=(T, 3)).astype(np.float32))
        np.save(in_dir / f"{spk}_seg1-times.npy", times.astype(np.int64))
    ds = MultiTrackFeatsDataset(in_dir, out_dir, ["alto", "soprano"], load_times=True)
    from ensemble_svs_with_interactions_tpu.data.multitrack import (
        merge_tracks_by_notes,
    )

    predicted = ds.merged_lengths()
    for k in range(len(ds)):
        it = ds[k]
        mx0, *_ = merge_tracks_by_notes(
            it["x0"], it["y0"], it["times0"], it["x1"], it["y1"], it["times1"]
        )
        assert predicted[k] == len(mx0), (k, predicted[k], len(mx0))
    # self-pairs merge to the track length; the cross pair expands
    assert predicted.max() > ds.lengths().max()


def test_multitrack_iterator_length_cap(tmp_path):
    """length_cap crops ONE window across both tracks (interaction losses
    need frame-aligned crops) AND re-sizes batches by the capped length,
    so short crops pack fat batches (the 64x256 geometry lever)."""
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    D = 3
    # frame index in feature 0 makes window alignment checkable
    for spk in ("alto", "soprano"):
        for seg, T in (("seg1", 100), ("seg2", 120)):
            base = np.arange(T, dtype=np.float32)[:, None] * np.ones((1, D))
            np.save(in_dir / f"{spk}_{seg}-feats.npy", base.astype(np.float32))
            np.save(out_dir / f"{spk}_{seg}-feats.npy",
                    (base + 0.5).astype(np.float32))
    ds = MultiTrackFeatsDataset(in_dir, out_dir, ["alto", "soprano"])
    it = MultiTrackBatchIterator(
        ds, sync="frames", max_tokens=512, time_multiple=8,
        shuffle=False, seed=0, length_cap=16,
    )
    batches = list(it)
    assert batches
    # capped sizing packs many pairs per batch (full lengths would allow
    # at most 512/100=5 items; capped allows 512/16=32)
    assert max(b["in_feats0"].shape[0] for b in batches) > 5
    for b in batches:
        assert b["in_feats0"].shape[1] == 16
        for i in range(len(b["lengths"])):
            L = int(b["lengths"][i])
            if L == 0:
                continue
            # same window across all four tensors; frame ids contiguous
            f = b["in_feats0"][i, :L, 0]
            assert np.all(np.diff(f) == 1.0)
            np.testing.assert_array_equal(b["out_feats0"][i, :L, 0], f + 0.5)
            np.testing.assert_array_equal(b["in_feats1"][i, :L, 0], f)
            np.testing.assert_array_equal(b["out_feats1"][i, :L, 0], f + 0.5)


# use_random_segments end-to-end multitrack training coverage (suite
# diet, 2026-08-21): the shipped-crop-geometry train path is exercised by
# (a) test_multitrack_iterator_length_cap above (one-window crop + batch
# sizing semantics), (b) the single-track crop training in
# test_train.py::test_train_random_segments, and (c) the packaged
# multitrack recipe e2e, whose config ships use_random_segments: true
# (recipes/jaCappella_dev_48k_world_multitrack/config.yaml) — a fourth
# full multitrack training here re-paid ~40 s of compile for no new
# assertion surface.
