"""Tests for the converter / normalization CLI tools."""

import numpy as np
from scipy.io import wavfile


def test_sv56_normalization(tmp_path):
    from ensemble_svs_with_interactions_tpu.bin.sv56 import (
        active_speech_level,
        main,
    )

    sr = 24000
    t = np.arange(sr) / sr
    x = np.zeros(2 * sr)
    x[sr // 2 : sr // 2 + sr] = 0.02 * np.sin(2 * np.pi * 220 * t)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    wavfile.write(in_dir / "a.wav", sr, (x * 32767).astype(np.int16))

    main([str(in_dir), str(tmp_path / "out"), "--ndb", "-26"])
    sr2, y = wavfile.read(tmp_path / "out" / "a.wav")
    level, active = active_speech_level(y / 32768.0, sr2)
    assert abs(level - (-26.0)) < 0.5
    # silence must not count as active (tone spans half the file)
    assert 0.3 < active.mean() < 0.7


def test_opencpop_round_trip(tmp_path):
    from ensemble_svs_with_interactions_tpu.bin.nnsvs2opencpop import (
        main as to_opencpop,
    )
    from ensemble_svs_with_interactions_tpu.bin.opencpop2nnsvs import (
        main as from_opencpop,
    )

    oc = tmp_path / "oc"
    (oc / "wavs").mkdir(parents=True)
    row = "|".join(
        [
            "utt1",
            "la la",
            "l a l a",
            "C4 C4 D4 D4",
            "0.5 0.5 0.4 0.4",
            "0.21 0.29 0.13 0.27",
            "0 0 0 0",
        ]
    )
    (oc / "transcriptions.txt").write_text(row + "\n")
    (oc / "train.txt").write_text("utt1|x\n")
    (oc / "test.txt").write_text("utt1|x\n")

    from_opencpop([str(oc), str(tmp_path / "nnsvs")])
    score = (tmp_path / "nnsvs" / "acoustic" / "label_phone_score" / "utt1.lab")
    align = (tmp_path / "nnsvs" / "acoustic" / "label_phone_align" / "utt1.lab")
    assert score.exists() and align.exists()
    assert "/E:C4]@50#" in score.read_text()
    assert (tmp_path / "nnsvs" / "list" / "train_no_dev.list").read_text().strip() == "utt1"

    to_opencpop([str(tmp_path / "nnsvs" / "acoustic"), str(tmp_path / "oc2")])
    back = (tmp_path / "oc2" / "transcriptions.txt").read_text().strip()
    cols = back.split("|")
    assert cols[0] == "utt1"
    assert cols[1] == "l a l a"
    assert cols[3] == "60 60 62 62"  # C4 C4 D4 D4 as MIDI
    assert cols[4] == "0.5 0.5 0.4 0.4"
    assert cols[5] == "0.21 0.29 0.13 0.27"  # 5ms-grid durations round-trip


def test_nnsvs2usfgan(tmp_path):
    import h5py

    from ensemble_svs_with_interactions_tpu.bin.nnsvs2usfgan import main

    D = 60 + 1 + 1 + 5
    rng = np.random.default_rng(5)
    for split in ("train_no_dev", "dev", "eval"):
        d = tmp_path / "dump" / split / "norm" / "in_vocoder"
        d.mkdir(parents=True)
        T = 40
        np.save(d / "u1-feats.npy", rng.normal(size=(T, D)).astype(np.float32))
        np.save(d / "u1-wave.npy", (rng.normal(size=(T * 240,)) * 0.1).astype(np.float32))
    np.save(tmp_path / "sc_mean.npy", np.zeros(D))
    np.save(tmp_path / "sc_var.npy", np.ones(D))
    np.save(tmp_path / "sc_scale.npy", np.ones(D))

    main(
        [
            str(tmp_path / "dump"),
            str(tmp_path / "out"),
            "--scaler-prefix",
            str(tmp_path / "sc"),
            "--sample-rate",
            "48000",
            "--spk",
            "demo",
        ]
    )
    with h5py.File(tmp_path / "out" / "hdf5" / "u1.h5") as f:
        assert set(f.keys()) == {"uv", "f0", "contf0", "cf0", "mcep", "codeap"}
        assert f["mcep"].shape == (40, 60)
        f0 = f["f0"][()]
        uv = f["uv"][()]
        assert (f0[uv < 0.5] == 0).all()  # unvoiced F0 zeroed
    scp = (tmp_path / "out" / "scp" / "demo_sr48000_dev.scp").read_text()
    assert scp.strip().endswith("u1.wav")


def test_enunu2nnsvs(tmp_path):
    import joblib
    import yaml
    from sklearn.preprocessing import MinMaxScaler, StandardScaler

    from ensemble_svs_with_interactions_tpu.bin.enunu2nnsvs import main

    enunu = tmp_path / "enunu"
    (enunu / "stats").mkdir(parents=True)
    (enunu / "hed").mkdir()
    (enunu / "hed" / "q.hed").write_text('QS "C-Phone_l" {*-l+*}\n')
    (enunu / "kana.table").write_text("a a\n")
    rng = np.random.default_rng(0)
    for phase in ("timelag", "duration", "acoustic"):
        (enunu / "model" / phase).mkdir(parents=True)
        (enunu / "model" / phase / "model.yaml").write_text(
            yaml.safe_dump({"netG": {"_target_": "x.Y"}})
        )
        (enunu / "model" / phase / "best.pth").write_bytes(b"FAKE")
        for inout, cls in (("in", MinMaxScaler), ("out", StandardScaler)):
            sc = cls().fit(rng.normal(size=(50, 4)))
            joblib.dump(sc, enunu / "stats" / f"{inout}_{phase}_scaler.joblib")
    (enunu / "enuconfig.yaml").write_text(
        yaml.safe_dump(
            {
                "question_path": "hed/q.hed",
                "table_path": "kana.table",
                "model_dir": "model",
                "stats_dir": "stats",
                "sample_rate": 48000,
                "log_f0_conditioning": True,
                "timelag": {
                    "checkpoint": "best.pth",
                    "allowed_range": [-20, 20],
                    "allowed_range_rest": [-40, 40],
                },
                "duration": {"checkpoint": "best.pth"},
                "acoustic": {"checkpoint": "best.pth", "relative_f0": True},
            }
        )
    )

    main([str(enunu), str(tmp_path / "out")])
    out = tmp_path / "out"
    assert (out / "qst.hed").exists()
    assert (out / "out_acoustic_scaler_mean.npy").exists()
    assert (out / "in_acoustic_scaler_min.npy").exists()
    cfg = yaml.safe_load((out / "config.yaml").read_text())
    assert cfg["sample_rate"] == 48000
    assert cfg["timelag"]["allowed_range"] == [-20, 20]


def test_sweep_sampling():
    from ensemble_svs_with_interactions_tpu.bin.sweep import sample_trials

    spec = {
        "mode": "grid",
        "params": {"a": [1, 2], "b": ["x", "y", "z"]},
    }
    trials = list(sample_trials(spec))
    assert len(trials) == 6
    assert {"a": 2, "b": "z"} in trials

    spec = {
        "mode": "random",
        "n_trials": 5,
        "seed": 3,
        "params": {
            "lr": {"low": 1e-4, "high": 1e-1, "log": True},
            "dim": {"low": 8, "high": 64, "int": True},
            "act": ["relu", "gelu"],
        },
    }
    trials = list(sample_trials(spec))
    assert len(trials) == 5
    for t in trials:
        assert 1e-4 <= t["lr"] <= 1e-1
        assert isinstance(t["dim"], int) and 8 <= t["dim"] <= 64
        assert t["act"] in ("relu", "gelu")


def test_sweep_grid_training(tmp_path):
    import yaml

    from ensemble_svs_with_interactions_tpu.bin.sweep import run_sweep
    from ensemble_svs_with_interactions_tpu.utils.config import _wrap

    rng = np.random.default_rng(0)
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir(), out_dir.mkdir()
    W = rng.normal(size=(8, 3)) * 0.5
    for i in range(6):
        x = rng.normal(size=(30, 8)).astype(np.float32)
        np.save(in_dir / f"u{i}-feats.npy", x)
        np.save(out_dir / f"u{i}-feats.npy", (x @ W).astype(np.float32))

    base = _wrap(
        {
            "seed": 1,
            "verbose": 0,
            "data": {
                "train_no_dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                "dev": {"in_dir": str(in_dir), "out_dir": str(out_dir)},
                "batch_max_frames": 400,
                "time_multiple": 16,
            },
            "model": {
                "netG": {
                    "_target_": "ensemble_svs_with_interactions_tpu.models.FFN",
                    "in_dim": 8,
                    "hidden_dim": 8,
                    "out_dim": 3,
                    "num_layers": 1,
                },
                "stream_sizes": [3],
                "has_dynamic_features": [False],
                "num_windows": 1,
            },
            "train": {
                "out_dir": str(tmp_path / "exp"),
                "nepochs": 1,
                "optim": {"optimizer": {"name": "Adam", "params": {"lr": 0.01}}},
            },
        }
    )
    spec = {"mode": "grid", "params": {"train.optim.optimizer.params.lr": [0.03, 0.001]}}
    loss, idx, params = run_sweep(base, spec, multitrack=False, acoustic=False)
    assert idx in (0, 1)
    assert np.isfinite(loss)
    results = (tmp_path / "exp" / "sweep_results.jsonl").read_text().splitlines()
    assert len(results) == 2
    best = yaml.safe_load((tmp_path / "exp" / "best_trial.yaml").read_text())
    assert best["trial"] == idx
