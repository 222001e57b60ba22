"""Multi-speaker acoustic trainer CLI (equivalent of the reference's
nnsvs/bin/train_acoustic_multi.py).

Same engine as ``bin.train_acoustic``: setting ``data.spk_names`` switches
the dataset to speaker-id-from-filename-prefix mode and the model's
``spks`` input is fed automatically.
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
    train_model(config, is_acoustic=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
