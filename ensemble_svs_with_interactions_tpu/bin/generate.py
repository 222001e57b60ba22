"""Offline feature generation: run trained models over feature dumps.

Equivalent of /root/reference/nnsvs/bin/generate.py +
gen_static_features.py + prepare_static_features.py: runs a trained
acoustic model on normalized input dumps and writes denormalized static
features (postfilter / vocoder training targets).

Usage: python -m ...bin.generate <model_dir> <in_feats_dir> <out_dir>
       [--static-only]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ensemble_svs_with_interactions_tpu import gen
from ensemble_svs_with_interactions_tpu.ops.multistream import (
    get_static_features,
    get_static_stream_sizes,
)
from ensemble_svs_with_interactions_tpu.svs import SPSVS


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("in_feats_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--static-only", action="store_true")
    args = ap.parse_args(argv)

    engine = SPSVS(args.model_dir)
    model = engine.acoustic_model
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for path in sorted(Path(args.in_feats_dir).glob("*-feats.npy")):
        x = np.load(path).astype(np.float32)
        pred = model.inference(x)
        is_prob = model.prediction_type().name in (
            "PROBABILISTIC", "MULTISTREAM_HYBRID",
        )
        feats = gen._denorm_and_mlpg(
            pred, engine.out_acoustic_scaler, model.config, is_prob
        )
        if args.static_only and np.any(model.config.has_dynamic_features):
            parts = get_static_features(
                feats[None],
                int(model.config.num_windows),
                list(model.config.stream_sizes),
                list(model.config.has_dynamic_features),
            )
            feats = np.concatenate([np.asarray(p)[0] for p in parts], axis=-1)
        np.save(out_dir / path.name, feats.astype(np.float32))
        n += 1
    print(f"generated features for {n} utterances -> {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
