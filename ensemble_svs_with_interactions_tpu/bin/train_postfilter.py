"""Learned-postfilter GAN trainer CLI (equivalent of the reference's
nnsvs/bin/train_postfilter.py: LSGAN + feature matching over
Conv2dPostFilter / Conv2dD).

Usage: python -m ...bin.train_postfilter config.yaml [overrides...]
"""

from __future__ import annotations

import sys

from ensemble_svs_with_interactions_tpu.train.postfilter_trainer import (
    train_postfilter,
)
from ensemble_svs_with_interactions_tpu.utils.config import (
    load_config,
    merge,
    parse_overrides,
)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    config = load_config(argv[0])
    if len(argv) > 1:
        config = merge(config, parse_overrides(argv[1:]))
    train_postfilter(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
