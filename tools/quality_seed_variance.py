#!/usr/bin/env python
"""Seed-variance calibration for the objective-quality CI gate.

Round-4 verdict Weak #5: the QUALITY.json ceilings in the recipe e2e
tests rested on a single seeded run ("~30-40% above" one measurement) —
under-detecting real regressions and risking flakes.  This tool runs
the SAME mini-recipe the e2e test runs (same corpus builder, same
override dict — tests/util.py) at N training seeds, and emits
mean/std/min/max and the mean+3*sigma ceiling per ObjEval metric.

The committed artifact is SEED_VARIANCE.json; the e2e test ceilings are
derived from it (see tests/test_recipe_multitrack_e2e.py).

Usage: python tools/quality_seed_variance.py [--seeds 1234 1 2 3 4]
           [--out SEED_VARIANCE.json]
Runs on CPU (like the suite).  Each seed takes a few minutes.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

METRICS = ("ObjEval_MGC_MCD", "ObjEval_BAP_MCD", "ObjEval_VUV_ERR",
           "ObjEval_F0_RMSE")


def run_one_seed(corpus, seed: int, tmp: Path) -> dict:
    import yaml

    from ensemble_svs_with_interactions_tpu.bin.run_recipe import main
    from ensemble_svs_with_interactions_tpu.utils.config import (
        load_config,
        merge,
    )
    from tests.test_recipe_multitrack_e2e import PACKAGED_RECIPE, SPKS, SR
    from tests.util import (
        multitrack_mini_recipe_overrides,
        write_multitrack_mini_model_configs,
    )

    work = tmp / "work"
    conf = tmp / "conf"
    write_multitrack_mini_model_configs(conf)
    data_dir = work / "data"
    base = load_config(PACKAGED_RECIPE)
    overrides = multitrack_mini_recipe_overrides(
        corpus, work, conf, data_dir, spks=SPKS, sr=SR, seed=seed
    )
    recipe = merge(base, overrides)
    recipe_path = tmp / "recipe.yaml"
    with open(recipe_path, "w") as f:
        yaml.safe_dump(json.loads(json.dumps(recipe)), f)
    rc = main([str(recipe_path), "--stage", "-1", "--stop-stage", "7"])
    assert rc == 0, f"seed {seed}: recipe stages -1..7 failed"
    rc = main([str(recipe_path), "--stage", "11", "--stop-stage", "11"])
    assert rc == 0, f"seed {seed}: stage 11 failed"
    quality = json.loads((work / "QUALITY.json").read_text())
    return {m: float(quality["acoustic"]["best"][m]) for m in METRICS}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+",
                   default=[1234, 1, 2, 3, 4])
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    # CPU like the suite (the sitecustomize pins the TPU backend)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tests.util import build_synthetic_jacappella_corpus

    per_seed = {}
    with tempfile.TemporaryDirectory() as td:
        corpus = build_synthetic_jacappella_corpus(Path(td) / "corpus")
        for seed in args.seeds:
            t0 = time.time()
            with tempfile.TemporaryDirectory() as run_td:
                per_seed[str(seed)] = run_one_seed(corpus, seed, Path(run_td))
            print(f"seed {seed}: {per_seed[str(seed)]} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)

    stats = {}
    for m in METRICS:
        vals = np.asarray([per_seed[s][m] for s in per_seed])
        stats[m] = {
            "mean": float(vals.mean()),
            "std": float(vals.std(ddof=1)),
            "min": float(vals.min()),
            "max": float(vals.max()),
            "ceiling_mean_plus_3sigma": float(vals.mean() + 3 * vals.std(ddof=1)),
        }
    result = {
        "recipe": "mini multitrack e2e (tests/util.py builders, 2 epochs)",
        "n_seeds": len(args.seeds),
        "seeds": args.seeds,
        "per_seed": per_seed,
        "stats": stats,
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
