"""Generic trainer CLI for timelag/duration models.

Equivalent of /root/reference/nnsvs/bin/train.py (hydra app); here:
``python -m ensemble_svs_with_interactions_tpu.bin.train config.yaml
[key=value overrides...]``
"""

from __future__ import annotations

import sys

from ensemble_svs_with_interactions_tpu.train.trainer import train_model
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
    train_model(config, is_acoustic=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
