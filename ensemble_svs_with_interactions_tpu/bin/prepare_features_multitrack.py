"""Multitrack feature extraction CLI (surface parity with the reference's
prepare_features_multitrack.py / prepare_features_multitrack_sync.py).

Identical to ``bin.prepare_features`` with ``save_note_times`` forced on:
per-utterance ``-times.npy`` note-onset arrays are saved alongside the
feature dumps for the cross-track note merge.
"""

from __future__ import annotations

import sys

from ensemble_svs_with_interactions_tpu.bin.prepare_features import run
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
    config = merge(config, {"save_note_times": True})
    run(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
