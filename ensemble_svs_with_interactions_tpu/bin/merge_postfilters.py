"""Merge separately-trained stream postfilters into one MultistreamPostFilter.

Equivalent of /root/reference/utils/merge_postfilters.py: takes mgc / bap
postfilter checkpoints and writes a combined packed postfilter phase.

Usage: python -m ...bin.merge_postfilters <out_dir>
       --mgc-config c.yaml --mgc-ckpt p.ckpt
       [--bap-config c.yaml --bap-ckpt p.ckpt]
       --stream-sizes 60,1,1,5
"""

from __future__ import annotations

import argparse
from pathlib import Path

from flax import serialization

from ensemble_svs_with_interactions_tpu.utils.config import (
    load_config,
    save_config,
)


def _load_params(ckpt_path):
    tree = serialization.msgpack_restore(Path(ckpt_path).read_bytes())
    return tree.get("params", tree)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--mgc-config", required=True)
    ap.add_argument("--mgc-ckpt", required=True)
    ap.add_argument("--bap-config", default=None)
    ap.add_argument("--bap-ckpt", default=None)
    ap.add_argument("--stream-sizes", default="60,1,1,5")
    args = ap.parse_args(argv)

    stream_sizes = [int(s) for s in args.stream_sizes.split(",")]
    mgc_cfg = load_config(args.mgc_config)
    merged_cfg = {
        "netG": {
            "_target_": (
                "ensemble_svs_with_interactions_tpu.models.postfilters."
                "MultistreamPostFilter"
            ),
            "mgc_postfilter": dict(mgc_cfg.netG),
            "bap_postfilter": (
                dict(load_config(args.bap_config).netG) if args.bap_config else None
            ),
            "lf0_postfilter": None,
            "stream_sizes": stream_sizes,
        },
        "stream_sizes": stream_sizes,
        "has_dynamic_features": [False] * len(stream_sizes),
        "num_windows": 1,
    }
    # keys must match MultistreamPostFilter's submodule attribute names,
    # which is how flax scopes the merged param tree
    params = {"mgc_postfilter": _load_params(args.mgc_ckpt)}
    if args.bap_ckpt:
        params["bap_postfilter"] = _load_params(args.bap_ckpt)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_config(merged_cfg, out_dir / "postfilter_model.yaml")
    with open(out_dir / "postfilter_model.params", "wb") as f:
        f.write(serialization.to_bytes({"params": params}))
    print(f"merged postfilter -> {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
