"""Note-synchronized multitrack feature extraction CLI (surface parity
with the reference's prepare_features_multitrack_sync.py:91-309).

In this framework the note-onset ``-times.npy`` arrays required for the
cross-track note merge are produced by the same extraction path, so this
is the same tool as ``bin.prepare_features_multitrack``; the name is kept
so recipes written against the reference keep working.
"""

from ensemble_svs_with_interactions_tpu.bin.prepare_features_multitrack import main

if __name__ == "__main__":
    raise SystemExit(main())
