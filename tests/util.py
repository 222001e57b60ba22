"""Shared model-testing harness (pattern from reference tests/util.py:6-48)."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from ensemble_svs_with_interactions_tpu.base import PredictionType
from ensemble_svs_with_interactions_tpu.utils import packaged_question_path

# Self-contained fixture data: bundled NIT SONG070 labels (CC-BY 3.0 data,
# see tests/data/nit_song070/COPYING) + the packaged question set.  No
# /root/reference checkout is needed to run the suite.
TESTS_DIR = pathlib.Path(__file__).parent
NIT_DATA_DIR = TESTS_DIR / "data" / "nit_song070"
NIT_LAB = NIT_DATA_DIR / "nitech_jp_song070_f001_004.lab"
FIXTURE_LABS = [
    str(NIT_LAB),
    str(NIT_DATA_DIR / "label_phone_align" / "nitech_jp_song070_f001_007.lab"),
    str(NIT_DATA_DIR / "label_phone_align" / "nitech_jp_song070_f001_010.lab"),
]
HED = packaged_question_path()


def trim_labels(labels, seconds):
    """First `seconds` of an HTS label sequence (min 10 segments)."""
    n = len(labels)
    for i, e in enumerate(labels.end_times):
        if e > seconds * 1e7:
            n = i
            break
    return labels[: max(n, 10)]


def synth_wav_from_labels(labels, binary_dict, numeric_dict, rng, sr=24000,
                          tail_seconds=0.0):
    """Deterministic first-party singing stand-in: harmonics following the
    score pitch on voiced phones, low-level noise elsewhere (int16)."""
    from ensemble_svs_with_interactions_tpu.frontend import merlin as fe
    from ensemble_svs_with_interactions_tpu.io import hts

    feats = fe.linguistic_features(
        labels, binary_dict, numeric_dict, add_frame_features=True,
        subphone_features="coarse_coding",
    )
    pitch_idx = hts.get_pitch_index(binary_dict, numeric_dict)
    midi = feats[:, pitch_idx]
    f0 = np.where(midi > 0, 440.0 * 2 ** ((midi - 69) / 12), 0.0)
    hop = sr * 5 // 1000
    f0_samples = np.repeat(f0, hop)
    phase = 2 * np.pi * np.cumsum(f0_samples) / sr
    voiced = f0_samples > 0
    x = 0.25 * np.sin(phase) + 0.12 * np.sin(2 * phase) + 0.05 * np.sin(3 * phase)
    x = np.where(voiced, x, 0.003 * rng.standard_normal(len(x)))
    if tail_seconds:
        x = np.concatenate([x, np.zeros(int(tail_seconds * sr))])
    return (x * 32767).astype(np.int16)


def build_synthetic_jacappella_corpus(root, spks=("alto", "soprano"),
                                      sr=24000):
    """jaCappella-layout corpus: <root>/<spk>/<song>_{aligned,score}.lab +
    <song>.wav, len(spks) singers x 3 songs (song-level splits need >= 3).
    Deterministic (rng seed 0) — shared by the multitrack recipe e2e test
    and tools/quality_seed_variance.py so both gate the SAME corpus."""
    from scipy.io import wavfile

    from ensemble_svs_with_interactions_tpu.io import hts

    binary_dict, numeric_dict = hts.load_question_set(HED)
    rng = np.random.default_rng(0)
    for si, spk in enumerate(spks):
        (root / spk).mkdir(parents=True, exist_ok=True)
        for fi, path in enumerate(FIXTURE_LABS):
            song = f"song{fi}"
            score = trim_labels(hts.load(path), 8.0)
            # per-singer alignment: score times shifted by one frame
            aligned = hts.full_to_mono(score.copy())
            shift = 50000 * (si + 1)
            aligned.start_times = [t + shift for t in aligned.start_times]
            aligned.end_times = [t + shift for t in aligned.end_times]
            aligned.start_times[0] = score.start_times[0]
            score.save(root / spk / f"{song}_score.lab")
            aligned.save(root / spk / f"{song}_aligned.lab")
            wav = synth_wav_from_labels(
                score, binary_dict, numeric_dict, rng, sr=sr,
                tail_seconds=0.3,
            )
            if spk == "soprano":
                # high-bit-depth PCM (scipy reads 24-bit wavs as int32):
                # data prep must normalize any integer dtype, not just
                # int16
                wav = (wav.astype(np.int64) << 16).astype(np.int32)
            wavfile.write(root / spk / f"{song}.wav", sr, wav)
    return root


def write_multitrack_mini_model_configs(conf_dir, pkg=None):
    """CI-size multitrack model configs (timelag/duration/acoustic) used
    by the recipe e2e test and the seed-variance calibration tool."""
    import yaml

    pkg = pkg or "ensemble_svs_with_interactions_tpu"
    conf_dir.mkdir(parents=True, exist_ok=True)
    timing = {
        "netG": {
            "_target_": f"{pkg}.models.MultiTrackVariancePredictor",
            "in_dim": 82, "out_dim": 1, "hidden_dim": 8, "num_layers": 1,
            "kernel_size": 3, "use_mdn": True, "num_gaussians": 2,
            "num_speaker": 2, "spk_embed_dim": 4,
        },
        "stream_sizes": [1],
        "has_dynamic_features": [False],
        "num_windows": 1,
    }
    ss = [8, 1, 1, 3]
    enc_out = 8
    dec = {"in_dim": enc_out + 2, "ff_hidden_dim": 8, "conv_hidden_dim": 8,
           "lstm_hidden_dim": 4, "num_lstm_layers": 1}
    acoustic = {
        "netG": {
            "_target_": (
                f"{pkg}.models.acoustic."
                "MultiTrackMultistreamSeparateF0ParametricModel"
            ),
            "in_dim": 86, "out_dim": sum(ss), "stream_sizes": ss,
            "reduction_factor": 4,
            "in_rest_idx": 0, "in_lf0_idx": 51, "out_lf0_idx": ss[0],
            "in_lf0_min": None, "in_lf0_max": None,
            "out_lf0_mean": None, "out_lf0_scale": None,
            "encoder": {
                "_target_": f"{pkg}.models.MultiTrackLSTMEncoder",
                "in_dim": 86, "hidden_dim": 4, "out_dim": enc_out,
                "num_layers": 1, "in_ph_start_idx": 3, "in_ph_end_idx": 50,
                "embed_dim": 8,
            },
            "lf0_model": {
                "_target_": (
                    f"{pkg}.models.acoustic."
                    "MultiTrackBiLSTMResF0NonAttentiveDecoder"
                ),
                "in_dim": 86, "out_dim": 1, "ff_hidden_dim": 8,
                "conv_hidden_dim": 8, "lstm_hidden_dim": 4,
                "num_lstm_layers": 1, "decoder_layers": 1,
                "decoder_hidden_dim": 8, "prenet_layers": 0,
                "prenet_hidden_dim": 4, "prenet_dropout": 0.5,
                "scaled_tanh": True, "zoneout": 0.0, "reduction_factor": 4,
                "downsample_by_conv": True, "in_lf0_idx": 51,
                "out_lf0_idx": 0, "in_lf0_min": None, "in_lf0_max": None,
                "out_lf0_mean": None, "out_lf0_scale": None,
                "in_ph_start_idx": 3, "in_ph_end_idx": 50, "embed_dim": 8,
            },
            "mgc_model": {"_target_": f"{pkg}.models.FFConvLSTM", **dec,
                          "out_dim": ss[0]},
            "vuv_model": {"_target_": f"{pkg}.models.FFConvLSTM", **dec,
                          "out_dim": 1},
            "bap_model": {"_target_": f"{pkg}.models.FFConvLSTM", **dec,
                          "out_dim": ss[3]},
            "speaker_embedding": {
                "_target_": f"{pkg}.models.SpeakerEmbedding",
                "num_embeddings": 2, "embedding_dim": 8,
            },
        },
        "stream_sizes": ss,
        "has_dynamic_features": [False, False, False, False],
        "num_windows": 1,
    }
    for name, cfg in (("timelag", timing), ("duration", timing),
                      ("acoustic", acoustic)):
        with open(conf_dir / f"{name}.yaml", "w") as f:
            yaml.safe_dump(cfg, f)


def multitrack_mini_recipe_overrides(corpus, work, conf, data_dir,
                                     spks=("alto", "soprano"), sr=24000,
                                     seed=None):
    """The recipe e2e test's override dict on top of the PACKAGED
    jaCappella recipe (paths, corpus knobs, CI-size configs, 2 epochs).
    ``seed`` overrides the recipe's training/data-prep seed (used by the
    seed-variance calibration)."""
    spks = list(spks)
    train_common = {
        "nepochs": 2,
        "use_amp": False,  # CPU CI; the recipe default targets accelerators
        "optim": {"optimizer": {"name": "Adam", "params": {"lr": 0.002}},
                  "lr_scheduler": {"name": "StepLR",
                                   "params": {"step_size": 20,
                                              "gamma": 0.5}}},
    }
    mt_data = {"spk_names": spks}
    overrides = {
        "verbose": 0,
        "work_dir": str(work),
        "question_path": str(HED),
        "spk_list": spks,
        "data_prep": {
            "corpus_root": str(corpus),
            "out_dir": str(data_dir),
            "spk_list": spks,
            "dev_songs": ["song1"],
            "eval_songs": ["song2"],
        },
        "data": {"lists_dir": str(data_dir / "lists")},
        "features": {
            "n_jobs": 1,
            "timelag": {
                "label_phone_score_dir": str(
                    data_dir / "timelag/label_phone_score"
                ),
                "label_phone_align_dir": str(
                    data_dir / "timelag/label_phone_align"
                ),
            },
            "duration": {
                "label_dir": str(data_dir / "duration/label_phone_align")
            },
            "acoustic": {
                "wav_dir": str(data_dir / "acoustic/wav"),
                "label_dir": str(data_dir / "acoustic/label_phone_align"),
                "params": {
                    "sample_rate": sr,  # 24 kHz CI fixtures (recipe: 48k)
                    "f0_floor": 120,
                    "f0_ceil": 700,
                    "mgc_order": 7,  # CI size (recipe: 59)
                },
            },
        },
        "timelag": {
            "model_config": str(conf / "timelag.yaml"),
            "train": train_common, "data": mt_data,
        },
        "duration": {
            "model_config": str(conf / "duration.yaml"),
            "train": train_common, "data": mt_data,
        },
        "acoustic": {
            "model_config": str(conf / "acoustic.yaml"),
            # the packaged recipe ships the reference's checked-in
            # myconfig_notuseIL weights (0.0); CI turns the paper's
            # interaction losses ON to exercise them
            "train": {**train_common, "pitch_reg_weight": 1.0,
                      "logf0_diff_weight": 1.0, "mgc_diff_weight": 1.0},
            "data": {**mt_data, "time_multiple": 32},
        },
        "synthesis": {
            "label_dir": str(data_dir / "acoustic/label_phone_score"),
        },
        "timing_eval": {
            "score_label_dir": str(data_dir / "acoustic/label_phone_score"),
            "align_label_dir": str(data_dir / "acoustic/label_phone_align"),
        },
    }
    if seed is not None:
        overrides["seed"] = int(seed)
    return overrides


def make_batch(B=2, T=32, in_dim=82, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, in_dim)).astype(np.float32))
    lengths = jnp.asarray(sorted(rng.integers(T // 2, T + 1, size=B), reverse=True))
    return x, lengths


def run_model_contract(model, x, lengths, out_dim, extra_args=(), y=None):
    """Init + forward + inference; assert output shapes per prediction type.

    Returns (variables, forward_out, inference_out).
    """
    B, T = x.shape[0], x.shape[1]
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": jax.random.PRNGKey(1)},
        x,
        *extra_args,
        lengths,
        train=True,
    )
    fwd = model.apply(
        variables,
        x,
        *extra_args,
        lengths,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )[0]
    ptype = model.prediction_type()
    if ptype == PredictionType.PROBABILISTIC:
        log_pi, log_sigma, mu = fwd
        G = model.num_gaussians
        assert mu.shape == (B, T, G, out_dim)
        assert log_sigma.shape == (B, T, G, out_dim)
        assert log_pi.shape[2] == G
        inf = model.apply(variables, x, *extra_args, lengths, method="inference")
        mu_i, sigma_i = inf
        assert mu_i.shape == (B, T, out_dim)
        assert sigma_i.shape == (B, T, out_dim)
        assert np.isfinite(np.asarray(mu_i)).all()
    else:
        assert fwd.shape == (B, T, out_dim), fwd.shape
        inf = model.apply(variables, x, *extra_args, lengths, method="inference")
        assert inf.shape == (B, T, out_dim)
        assert np.isfinite(np.asarray(inf)).all()
    return variables, fwd, inf


def build_tiny_multitrack_packed_model(out_dir, sr=24000, mgc_dim=8, bap_dim=3):
    """Pack a tiny random-weight MULTITRACK model (the paper's architecture
    at toy dims): MultiTrackVariancePredictor MDN timing +
    MultiTrackMultistreamSeparateF0ParametricModel acoustic with the AR
    cross-conditioned lf0 decoder (reference recipes/jaCappella_ritsu/
    dev-48k-world-multitrack/conf/train_acoustic/model/
    multitrack_acoustic_nnsvs_world_multi_ar_f0.yaml)."""
    import jax
    import jax.numpy as jnp

    from ensemble_svs_with_interactions_tpu.utils.config import instantiate
    from ensemble_svs_with_interactions_tpu.utils.packing import pack_model
    from ensemble_svs_with_interactions_tpu.utils.scalers import (
        MinMaxScaler,
        StandardScaler,
    )

    pre = "ensemble_svs_with_interactions_tpu.models"
    ss = [mgc_dim, 1, 1, bap_dim]
    out_dim = sum(ss)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "prenet": jax.random.PRNGKey(2),
        "zoneout": jax.random.PRNGKey(3),
    }

    timing = {
        "netG": {
            "_target_": f"{pre}.MultiTrackVariancePredictor",
            "in_dim": 82, "out_dim": 1, "num_speaker": 2, "spk_embed_dim": 4,
            "num_layers": 1, "hidden_dim": 8, "kernel_size": 3,
            "use_mdn": True, "num_gaussians": 2,
        },
        "stream_sizes": [1], "has_dynamic_features": [False], "num_windows": 1,
    }

    def init_timing(cfg):
        module = instantiate(cfg["netG"])
        spks = (jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32))
        return module.init(
            rngs, jnp.zeros((1, 8, 164)), spks, jnp.asarray([8]), train=True
        )

    lf0_kw = dict(
        in_dim=86, out_dim=1, ff_hidden_dim=8, conv_hidden_dim=8,
        lstm_hidden_dim=4, num_lstm_layers=1, decoder_layers=1,
        decoder_hidden_dim=8, prenet_layers=0, prenet_hidden_dim=4,
        prenet_dropout=0.5, scaled_tanh=True, zoneout=0.0,
        reduction_factor=4, downsample_by_conv=True,
        in_lf0_idx=51, out_lf0_idx=0, in_lf0_min=4.5, in_lf0_max=6.5,
        out_lf0_mean=float(np.log(220.0)), out_lf0_scale=0.1,
        in_ph_start_idx=3, in_ph_end_idx=50, embed_dim=8,
    )
    enc_out = 8
    dec_kw = dict(in_dim=enc_out + 2, ff_hidden_dim=8, conv_hidden_dim=8,
                  lstm_hidden_dim=4, num_lstm_layers=1)
    ac = {
        "netG": {
            "_target_": f"{pre}.acoustic.MultiTrackMultistreamSeparateF0ParametricModel",
            "in_dim": 86, "out_dim": out_dim, "stream_sizes": ss,
            "reduction_factor": 4,
            "in_rest_idx": 0, "in_lf0_idx": 51, "out_lf0_idx": mgc_dim,
            "in_lf0_min": 4.5, "in_lf0_max": 6.5,
            "out_lf0_mean": float(np.log(220.0)), "out_lf0_scale": 0.1,
            "encoder": {
                "_target_": f"{pre}.MultiTrackLSTMEncoder",
                "in_dim": 86, "hidden_dim": 4, "out_dim": enc_out,
                "num_layers": 1, "in_ph_start_idx": 3, "in_ph_end_idx": 50,
                "embed_dim": 8,
            },
            "lf0_model": {
                "_target_": f"{pre}.acoustic.MultiTrackBiLSTMResF0NonAttentiveDecoder",
                **lf0_kw,
            },
            "mgc_model": {"_target_": f"{pre}.FFConvLSTM", **dec_kw, "out_dim": ss[0]},
            "vuv_model": {"_target_": f"{pre}.FFConvLSTM", **dec_kw, "out_dim": ss[2]},
            "bap_model": {"_target_": f"{pre}.FFConvLSTM", **dec_kw, "out_dim": ss[3]},
            "speaker_embedding": {
                "_target_": f"{pre}.SpeakerEmbedding",
                "num_embeddings": 2, "embedding_dim": 8,
            },
        },
        "stream_sizes": ss,
        "has_dynamic_features": [False, False, False, False],
        "num_windows": 1,
    }

    def init_acoustic(cfg):
        module = instantiate(cfg["netG"])
        T = 8
        spks = (jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32))
        ys = (jnp.zeros((1, T, out_dim)), jnp.zeros((1, T, out_dim)))
        return module.init(
            rngs, jnp.zeros((1, T, 86)), jnp.zeros((1, T, 86)), spks,
            jnp.asarray([T]), ys, train=True,
        )

    mean = np.zeros(out_dim)
    scale = np.ones(out_dim) * 0.1
    mean[mgc_dim] = np.log(220.0)
    pack_model(
        out_dir,
        {"sample_rate": sr, "frame_period": 5, "feature_type": "world",
         "use_world_codec": True, "relative_f0": False,
         "spk_list": ["spk0", "spk1"]},
        HED,
        {
            "timelag": {
                "model_config": timing, "variables": init_timing(timing),
                "in_scaler": MinMaxScaler(np.zeros(82), np.ones(82)),
                "out_scaler": StandardScaler(np.zeros(1), np.ones(1) * 4, np.ones(1) * 2),
            },
            "duration": {
                "model_config": timing, "variables": init_timing(timing),
                "in_scaler": MinMaxScaler(np.zeros(82), np.ones(82)),
                "out_scaler": StandardScaler(np.ones(1) * 10, np.ones(1) * 4, np.ones(1) * 2),
            },
            "acoustic": {
                "model_config": ac, "variables": init_acoustic(ac),
                "in_scaler": MinMaxScaler(np.zeros(86), np.ones(86)),
                "out_scaler": StandardScaler(mean, scale**2, scale),
            },
        },
    )
    return out_dir


def build_tiny_packed_model(out_dir, sr=24000, mgc_dim=8, bap_dim=3,
                            dynamic_features=True):
    """Pack a tiny random-weight single-track model for CLI/e2e tests.

    dynamic_features=False packs static-only WORLD streams
    ([mgc, 1, 1, bap], num_windows 1) — the fused device-postprocess
    configuration (the flagship recipe's layout)."""
    import jax
    import jax.numpy as jnp

    from ensemble_svs_with_interactions_tpu.utils.config import instantiate
    from ensemble_svs_with_interactions_tpu.utils.packing import pack_model
    from ensemble_svs_with_interactions_tpu.utils.scalers import (
        MinMaxScaler,
        StandardScaler,
    )

    if dynamic_features:
        ss = [mgc_dim * 3, 3, 1, bap_dim * 3]
        hd, num_windows = [True, True, False, True], 3
    else:
        ss = [mgc_dim, 1, 1, bap_dim]
        hd, num_windows = [False, False, False, False], 1
    out_dim = sum(ss)

    def init(cfg, in_dim):
        module = instantiate(cfg["netG"])
        return module.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 8, in_dim)),
            jnp.asarray([8]),
        )

    timing = {
        "netG": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.MDN",
            "in_dim": 82, "hidden_dim": 8, "out_dim": 1, "num_gaussians": 2,
        },
        "stream_sizes": [1], "has_dynamic_features": [False], "num_windows": 1,
    }
    ac = {
        "netG": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFConvLSTM",
            "in_dim": 86, "ff_hidden_dim": 8, "conv_hidden_dim": 8,
            "lstm_hidden_dim": 4, "out_dim": out_dim,
        },
        "stream_sizes": ss,
        "has_dynamic_features": hd,
        "num_windows": num_windows,
    }
    mean = np.zeros(out_dim)
    scale = np.ones(out_dim) * 0.1
    mean[ss[0]] = np.log(220.0)
    pack_model(
        out_dir,
        {"sample_rate": sr, "frame_period": 5, "feature_type": "world",
         "use_world_codec": True, "relative_f0": False},
        HED,
        {
            "timelag": {
                "model_config": timing, "variables": init(timing, 82),
                "in_scaler": MinMaxScaler(np.zeros(82), np.ones(82)),
                "out_scaler": StandardScaler(np.zeros(1), np.ones(1) * 4, np.ones(1) * 2),
            },
            "duration": {
                "model_config": timing, "variables": init(timing, 82),
                "in_scaler": MinMaxScaler(np.zeros(82), np.ones(82)),
                "out_scaler": StandardScaler(np.ones(1) * 10, np.ones(1) * 4, np.ones(1) * 2),
            },
            "acoustic": {
                "model_config": ac, "variables": init(ac, 86),
                "in_scaler": MinMaxScaler(np.zeros(86), np.ones(86)),
                "out_scaler": StandardScaler(mean, scale**2, scale),
            },
        },
    )
    return out_dir
