"""Multitrack timelag/duration trainer CLI
(equivalent of /root/reference/nnsvs/bin/train_multitrack.py)."""

from __future__ import annotations

import sys

from ensemble_svs_with_interactions_tpu.train.multitrack_trainer import (
    train_multitrack_model,
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
    train_multitrack_model(config, is_acoustic=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
