"""Hyperparameter sweep over training configs.

Equivalent of the reference's hydra-sweeper/optuna setup
(/root/reference/nnsvs/bin/conf/train/config.yaml:7-17: TPE sampler,
minimize dev loss).  Optuna is not available in this environment, so this
implements the search loop first-party: grid search over explicit lists,
or random search over (log-)uniform ranges, minimizing the dev ``Loss``
reported by the trainer.  Trials and the winner are written to
``<out_dir>/sweep_results.jsonl`` / ``best_trial.yaml``.

Sweep spec (YAML):
  n_trials: 8            # random mode only; grid mode runs the full grid
  mode: random           # random | grid
  params:
    train.optim.optimizer.params.lr: {low: 1e-4, high: 1e-2, log: true}
    model.netG.hidden_dim: [32, 64, 128]

Usage: python -m ...bin.sweep <base_config.yaml> <sweep.yaml>
       [--multitrack] [--acoustic] [overrides...]
"""

from __future__ import annotations

import argparse
import itertools
import json
from pathlib import Path

import numpy as np
import yaml

from ensemble_svs_with_interactions_tpu.utils.config import (
    Config,
    load_config,
    merge,
    parse_overrides,
)


def _set_path(tree: dict, dotted: str, value):
    keys = dotted.split(".")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def sample_trials(spec: dict, seed: int = 123):
    """Yield dicts of dotted-path -> value per trial."""
    params = spec["params"]
    mode = spec.get("mode", "random")
    if mode == "grid":
        names = list(params)
        choices = []
        for name in names:
            v = params[name]
            if not isinstance(v, (list, tuple)):
                raise ValueError(f"grid mode needs lists; got {v!r} for {name}")
            choices.append(list(v))
        for combo in itertools.product(*choices):
            yield dict(zip(names, combo))
        return
    rng = np.random.default_rng(spec.get("seed", seed))
    for _ in range(int(spec.get("n_trials", 10))):
        trial = {}
        for name, v in params.items():
            if isinstance(v, (list, tuple)):
                trial[name] = v[int(rng.integers(len(v)))]
            elif isinstance(v, dict):
                lo, hi = float(v["low"]), float(v["high"])
                if v.get("log", False):
                    x = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
                else:
                    x = float(rng.uniform(lo, hi))
                if v.get("int", False):
                    x = int(round(x))
                trial[name] = x
            else:
                raise ValueError(f"unsupported sweep spec for {name}: {v!r}")
        yield trial


def run_sweep(base: Config, spec: dict, multitrack: bool, acoustic: bool):
    out_dir = Path(base.train.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    results_path = out_dir / "sweep_results.jsonl"

    if multitrack:
        from ensemble_svs_with_interactions_tpu.train.multitrack_trainer import (
            train_multitrack_model,
        )

        def _train(cfg):
            return train_multitrack_model(cfg, is_acoustic=acoustic)

    else:
        from ensemble_svs_with_interactions_tpu.train.trainer import train_model

        def _train(cfg):
            return train_model(cfg, is_acoustic=acoustic)

    best = (float("inf"), None, None)
    with open(results_path, "w") as f:
        for i, trial in enumerate(sample_trials(spec)):
            overrides: dict = {}
            for name, value in trial.items():
                _set_path(overrides, name, value)
            _set_path(overrides, "train.out_dir", str(out_dir / f"trial{i:03d}"))
            cfg = merge(base, overrides)
            metrics = _train(cfg)
            loss = float(metrics.get("Loss", float("nan")))
            row = {"trial": i, "params": trial, "dev_loss": loss}
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(f"trial {i}: loss={loss:.5f} params={trial}")
            if np.isfinite(loss) and loss < best[0]:
                best = (loss, i, trial)

    if best[1] is not None:
        (out_dir / "best_trial.yaml").write_text(
            yaml.safe_dump(
                {"trial": best[1], "dev_loss": best[0], "params": best[2]},
                sort_keys=False,
            )
        )
        print(f"best: trial {best[1]} loss={best[0]:.5f} params={best[2]}")
    return best


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("base_config")
    ap.add_argument("sweep_config")
    ap.add_argument("--multitrack", action="store_true")
    ap.add_argument("--acoustic", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    base = load_config(args.base_config)
    if args.overrides:
        base = merge(base, parse_overrides(args.overrides))
    spec = yaml.safe_load(Path(args.sweep_config).read_text())
    run_sweep(base, spec, args.multitrack, args.acoustic)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
