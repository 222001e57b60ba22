"""Analysis-by-synthesis (copy-synthesis) check.

Equivalent of /root/reference/nnsvs/bin/anasyn.py: run WORLD analysis on a
wav, optionally round-trip through the codecs (mgc/bap), and re-synthesize.
Useful to verify the vocoder ceiling on a corpus.

Usage: python -m ...bin.anasyn <wav_in> <wav_out> [--sample-rate N]
       [--f0-extractor dio|harvest] [--use-codec] [--mgc-order N]
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy.io import wavfile

from ensemble_svs_with_interactions_tpu.data.data_source import load_wav
from ensemble_svs_with_interactions_tpu.ops import world


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wav_in")
    ap.add_argument("wav_out")
    ap.add_argument("--sample-rate", type=int, default=None)
    ap.add_argument("--f0-extractor", default="dio", choices=["dio", "harvest"])
    ap.add_argument("--f0-floor", type=float, default=71.0)
    ap.add_argument("--f0-ceil", type=float, default=800.0)
    ap.add_argument("--use-codec", action="store_true",
                    help="round-trip through the mgc/bap codecs")
    ap.add_argument("--mgc-order", type=int, default=59)
    args = ap.parse_args(argv)

    x, fs = load_wav(args.wav_in, args.sample_rate)
    extractor = world.harvest if args.f0_extractor == "harvest" else world.dio
    f0, t = extractor(x, fs, f0_floor=args.f0_floor, f0_ceil=args.f0_ceil)
    f0 = world.stonemask(x, f0, t, fs)
    sp = world.cheaptrick(x, f0, t, fs)
    ap_ = world.d4c(x, f0, t, fs)

    if args.use_codec:
        fft_size = world.get_cheaptrick_fft_size(fs)
        mgc = np.asarray(world.code_spectral_envelope(sp, fs, args.mgc_order + 1))
        bap = np.asarray(world.code_aperiodicity(ap_, fs))
        sp = np.asarray(world.decode_spectral_envelope(mgc, fs, fft_size))
        ap_ = np.asarray(world.decode_aperiodicity(bap, fs, fft_size))

    y = np.asarray(world.synthesize(f0, sp, ap_, fs))
    peak = np.abs(y).max()
    if peak > 1.0:
        y = y / peak
    wavfile.write(args.wav_out, fs, (y * 32767).astype(np.int16))
    n = min(len(x), len(y))
    rms_db = 20 * np.log10(
        (np.sqrt(np.mean(y[:n] ** 2)) + 1e-12)
        / (np.sqrt(np.mean(x[:n] ** 2)) + 1e-12)
    )
    print(
        f"copy-synthesis: {len(y)/fs:.2f}s, voiced {np.mean(f0>0):.2f}, "
        f"RMS delta {rms_db:+.2f} dB -> {args.wav_out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
