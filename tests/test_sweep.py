"""Sweep machinery: TPE sampler behavior + run_sweep plumbing +
MLflow-optional metrics writer (reference optuna/MLflow wiring,
nnsvs/train_util.py:1477-1489, recipes/.../config.yaml:100-112)."""

import json

import numpy as np
import yaml

from ensemble_svs_with_interactions_tpu.bin.sweep import TPESampler, run_sweep
from ensemble_svs_with_interactions_tpu.utils.config import _wrap


SPEC = {
    "lr": {"low": 1e-4, "high": 1.0, "log": True},
    "dim": [8, 16, 32, 64],
}


def _objective(trial):
    # minimum at lr=1e-2, dim=32
    return (np.log10(trial["lr"]) + 2.0) ** 2 + 0.5 * (trial["dim"] != 32)


def test_tpe_beats_random():
    """After warmup, TPE concentrates samples near the optimum: its best
    loss over 30 trials beats pure random sampling with the same budget."""

    def run(sampler_seed, tpe):
        s = TPESampler(SPEC, seed=sampler_seed, n_startup=6)
        losses = []
        for _ in range(30):
            t = s.ask() if tpe else s._sample_random()
            loss = _objective(t)
            if tpe:
                s.tell(t, loss)
            losses.append(loss)
        return losses

    tpe_best = np.mean([min(run(seed, True)) for seed in range(5)])
    rand_best = np.mean([min(run(seed, False)) for seed in range(5)])
    assert tpe_best <= rand_best + 1e-9
    # and the later TPE trials cluster near the optimum
    s = TPESampler(SPEC, seed=0, n_startup=6)
    for _ in range(40):
        t = s.ask()
        s.tell(t, _objective(t))
    tail = [s.ask() for _ in range(10)]
    lrs = np.log10([t["lr"] for t in tail])
    assert np.median(np.abs(lrs + 2.0)) < 1.0  # within a decade of 1e-2


def test_tpe_respects_bounds_and_ints():
    spec = {"n": {"low": 2, "high": 9, "int": True}, "c": ["a", "b"]}
    s = TPESampler(spec, seed=1, n_startup=3)
    for i in range(20):
        t = s.ask()
        assert 2 <= t["n"] <= 9 and isinstance(t["n"], int)
        assert t["c"] in ("a", "b")
        s.tell(t, float(t["n"]))
    # best region is n=2; late samples should lean low
    tail = [s.ask()["n"] for _ in range(10)]
    assert np.median(tail) <= 5


def test_run_sweep_tpe_mode(tmp_path):
    base = _wrap({"train": {"out_dir": str(tmp_path / "sweep")}})
    spec = {
        "mode": "tpe",
        "n_trials": 8,
        "n_startup": 3,
        "params": {"lr": {"low": 1e-4, "high": 1.0, "log": True}},
    }

    def train_fn(cfg):
        # out_dir override must be threaded per trial
        assert "trial" in cfg.train.out_dir
        return {"Loss": _objective({"lr": cfg.lr, "dim": 32})}

    best = run_sweep(base, spec, multitrack=False, acoustic=False,
                     train_fn=train_fn)
    assert best[1] is not None
    rows = [
        json.loads(line)
        for line in (tmp_path / "sweep" / "sweep_results.jsonl")
        .read_text().splitlines()
    ]
    assert len(rows) == 8
    best_yaml = yaml.safe_load(
        (tmp_path / "sweep" / "best_trial.yaml").read_text()
    )
    assert best_yaml["dev_loss"] == best[0]


def test_metrics_writer_mlflow_gated(tmp_path):
    """use_mlflow without the package degrades to JSONL with a warning."""
    import warnings

    from ensemble_svs_with_interactions_tpu.train.loop import MetricsWriter

    try:
        import mlflow  # noqa: F401

        has_mlflow = True
    except ImportError:
        has_mlflow = False

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        w = MetricsWriter(tmp_path, use_tensorboard=False, use_mlflow=True,
                          mlflow_params={"model": {"dim": 8}})
        w.log(1, {"Loss": 0.5}, prefix="train/")
        w.close()
    if not has_mlflow:
        assert any("mlflow" in str(c.message) for c in caught)
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
    assert rec["train/Loss"] == 0.5
