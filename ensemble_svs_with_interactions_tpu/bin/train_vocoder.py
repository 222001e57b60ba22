"""uSFGAN-family vocoder trainer CLI (the reference delegates this to
external parallel_wavegan/usfgan packages — recipe stages 10/11/13;
this framework trains its own generators first-party).

Usage: python -m ...bin.train_vocoder config.yaml [overrides...]
"""

from __future__ import annotations

import sys

from ensemble_svs_with_interactions_tpu.train.vocoder_trainer import train_vocoder
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
    train_vocoder(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
