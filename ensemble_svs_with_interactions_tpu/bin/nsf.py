"""NSF.exe-compatible CLI: f0/mgc/bap files -> waveform.

Argument surface mirrors /root/reference/neutrino_compat/bin/NSF.py:

    python -m ...bin.nsf input.f0 input.mgc input.bap model_dir output.wav
"""

from __future__ import annotations

import argparse
from pathlib import Path

from scipy.io import wavfile

from ensemble_svs_with_interactions_tpu.neutrino import (
    NEUTRINO,
    load_neutrino_features,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_f0")
    ap.add_argument("input_mgc")
    ap.add_argument("input_bap")
    ap.add_argument("model_dir")
    ap.add_argument("output_wav")
    ap.add_argument("--vocoder", default="world")
    args = ap.parse_args(argv)

    model_dir = Path(args.model_dir)
    if not model_dir.exists():
        model_dir = Path("model") / model_dir
    engine = NEUTRINO(model_dir, verbose=1)

    from ensemble_svs_with_interactions_tpu.ops.multistream import (
        get_static_stream_sizes,
    )

    static = get_static_stream_sizes(
        engine.acoustic_model.config.stream_sizes,
        engine.acoustic_model.config.has_dynamic_features,
        engine.acoustic_model.config.num_windows,
    )
    f0, mgc, bap = load_neutrino_features(
        args.input_f0, args.input_mgc, args.input_bap,
        int(static[0]), engine.get_num_aperiodicities(),
    )
    wav = engine.predict_waveform_neutrino(f0, mgc, bap, vocoder_type=args.vocoder)
    wavfile.write(args.output_wav, engine.sample_rate, wav)
    print(f"NSF: wrote {args.output_wav} ({len(wav)/engine.sample_rate:.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
