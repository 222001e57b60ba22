"""Multitrack timing evaluation CLI (surface parity with the reference's
evaluate_timing_multitrack.py:1-211).

Same engine as ``bin.evaluate_timing`` with the multitrack pairing forced
on; kept as a separate entry point so reference recipes keep working.

Usage: python -m ...bin.evaluate_timing_multitrack <model_dir>
       <score_label_dir> <align_label_dir> <out_dir> [--spk-names a,b]
"""

from __future__ import annotations

import sys

from ensemble_svs_with_interactions_tpu.bin.evaluate_timing import main as _main


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--multitrack" not in argv:
        argv.append("--multitrack")
    return _main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
