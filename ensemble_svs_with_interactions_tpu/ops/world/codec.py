"""WORLD spectral-envelope and aperiodicity codecs (first-party).

Replaces pyworld's ``code/decode_spectral_envelope``,
``code/decode_aperiodicity``, ``get_cheaptrick_fft_size`` and
``get_num_aperiodicities`` (reference call sites:
/root/reference/nnsvs/gen.py:1430-1455,2045-2065, nnsvs/util.py:70-110).

Spectral codec: log-envelope resampled on a mel-frequency axis, DCT-II,
keep the leading coefficients; decode inverts.  Aperiodicity codec: band
aperiodicities at 3 kHz intervals in dB, decoded by linear interpolation
over frequency.  Everything is expressed as gathers/matmuls/FFT-free ops
that work identically on NumPy arrays (host, data prep) and jnp arrays
(jitted inference path).

Spectral-codec bases
--------------------
``basis="world"`` (the default) reproduces pyworld's
``CodeSpectralEnvelope``/``DecodeSpectralEnvelope`` algorithm
(WORLD src/codec.cpp):

* the log envelope is resampled by linear interpolation **in the mel
  domain** onto a grid of ``fft_size//2`` points
  ``mel_i = floor_mel + (ceil_mel - floor_mel) * i / (fft_size//2)``
  spanning [40 Hz, min(fs/2, 20 kHz)) (``kFloorFrequency`` /
  ``kCeilFrequency``; ceiling endpoint-exclusive);
* a length-``N = fft_size//2`` DCT-II computed in WORLD via the Makhoul
  even/odd-permutation real FFT with weights
  ``2*cos/sin(k*pi/fft_size)/sqrt(fft_size)`` (``weight[0] /= sqrt(2)``)
  and a ``1/sqrt(N)`` FFT normalization — algebraically identical to an
  **orthonormal DCT-II scaled by 1/sqrt(N)**:
  ``coded[0] = mean(melsp)``,
  ``coded[k] = sqrt(2)/N * sum_n melsp[n] cos(pi k (2n+1) / (2N))``;
* decode is the exact inverse (``melsp = coded[0] + sqrt(2) *
  sum_{k>=1} coded[k] cos(...)``) followed by mel-domain linear
  interpolation back to the FFT bins with boundary anchors at 0 mel and
  ``mel(fs/2)`` carrying duplicated edge values (WORLD's
  ``GetParametersForDecoding`` axis extension), then ``exp``.

The normalization is pinned by the self-consistency of WORLD's own
code/decode pair (the scales above are the unique ones under which
WORLD's forward weights invert exactly); tests/test_world.py carries a
literal loop-based transcription of the codec.cpp algorithm as an
oracle.  ``basis="orthonormal"`` keeps round-1/2's self-consistent
legacy basis ([one FFT bin, fs/2] span, bin-domain interpolation,
orthonormal DCT) for packs trained with it; set
``ESVS_SPECTRAL_CODEC_BASIS=orthonormal`` to flip the default.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# WORLD constants (world/constantnumbers.h)
FREQUENCY_INTERVAL = 3000.0
UPPER_LIMIT = 15000.0
FLOOR_FREQUENCY = 40.0  # kFloorFrequency (spectral codec mel-axis floor)
CEIL_FREQUENCY = 20000.0  # kCeilFrequency (spectral codec mel-axis ceiling)
FLOOR_F0 = 71.0
DEFAULT_F0_FLOOR = FLOOR_F0
SAFE_GUARD_MINIMUM = 1e-12
MIN_DB = -60.0


def get_cheaptrick_fft_size(fs: int, f0_floor: float = FLOOR_F0) -> int:
    """FFT size used by CheapTrick: 2^ceil(log2(3 fs / f0_floor + 1))."""
    return int(2 ** (1 + int(np.log2(3.0 * fs / f0_floor + 1.0))))


def get_num_aperiodicities(fs: int) -> int:
    """Number of coded band aperiodicities (3 kHz bands capped at 15 kHz)."""
    return int(min(UPPER_LIMIT, fs / 2.0 - FREQUENCY_INTERVAL) / FREQUENCY_INTERVAL)


def _xp(x):
    return np if isinstance(x, np.ndarray) else jnp


# --------------------------------------------------------------------------
# Spectral envelope codec (mel axis + DCT)
# --------------------------------------------------------------------------


def _freq_to_mel(f):
    return 1127.01048 * np.log(f / 700.0 + 1.0)


def _mel_to_freq(m):
    return 700.0 * (np.exp(m / 1127.01048) - 1.0)


@lru_cache(maxsize=8)
def _world_codec_tables(fs: int, fft_size: int):
    """Gather indices/weights + scaled DCT matrices for the pyworld-exact
    ``basis="world"`` codec (WORLD src/codec.cpp; see module docstring).

    Returns ``(code_gather, decode_gather, code_dct, decode_dct)`` where
    ``code_gather = (i0, w1)`` resamples the log envelope from FFT bins
    onto the mel grid (linear interp in mel), ``decode_gather =
    (a0, a1, v1)`` resamples the reconstructed mel envelope back onto
    FFT bins through WORLD's endpoint-extended anchor axis, and the DCT
    matrices carry WORLD's normalization (orthonormal / sqrt(N) forward,
    orthonormal * sqrt(N) inverse).
    """
    half = fft_size // 2  # N: DCT length == mel grid size
    n_bins = half + 1
    bin_mels = _freq_to_mel(np.arange(n_bins) * fs / fft_size)
    floor_mel = _freq_to_mel(FLOOR_FREQUENCY)
    ceil_mel = _freq_to_mel(min(fs / 2.0, CEIL_FREQUENCY))
    mel_axis = floor_mel + (ceil_mel - floor_mel) * np.arange(half) / half

    # code: sample log|S| (given at bin mels) on the mel grid.
    # bin_mels is strictly increasing and mel_axis lies inside its span,
    # so this is plain linear interpolation (WORLD interp1).
    pos = np.interp(mel_axis, bin_mels, np.arange(n_bins, dtype=np.float64))
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_bins - 2)
    w1 = pos - i0

    # decode: WORLD extends the anchor axis with 0 mel and mel(fs/2),
    # both carrying duplicated edge values of the mel envelope.
    anchors = np.concatenate([[0.0], mel_axis, [_freq_to_mel(fs / 2.0)]])
    pos_inv = np.interp(bin_mels, anchors, np.arange(half + 2, dtype=np.float64))
    j0 = np.clip(np.floor(pos_inv).astype(np.int64), 0, half)
    v1 = pos_inv - j0
    # anchor k holds melsp[clip(k - 1, 0, half - 1)]
    a0 = np.clip(j0 - 1, 0, half - 1)
    a1 = np.clip(j0, 0, half - 1)

    dct = _ortho_dct_matrix(half)
    code_dct = dct / np.sqrt(half)
    decode_dct = dct * np.sqrt(half)
    return (i0, w1.astype(np.float64)), (a0, a1, v1.astype(np.float64)), code_dct, decode_dct


def _ortho_dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    dct = np.cos(np.pi * (k[:, None]) * (2 * k[None, :] + 1) / (2 * n))
    dct *= np.sqrt(2.0 / n)
    dct[0] *= np.sqrt(0.5)
    return dct


def default_spectral_codec_basis() -> str:
    """Default basis for code/decode_spectral_envelope ("world" unless
    overridden via ESVS_SPECTRAL_CODEC_BASIS)."""
    return os.environ.get("ESVS_SPECTRAL_CODEC_BASIS", "world")


@lru_cache(maxsize=8)
def _mel_axis_weights(fs: int, fft_size: int):
    """Legacy ``basis="orthonormal"`` tables (rounds 1-2): linear-
    interpolation gathers for linear->mel and mel->linear resampling of
    the log envelope over [one FFT bin, fs/2], plus orthonormal DCT
    matrices.  Self-consistent but NOT pyworld-compatible; kept for
    packs trained with it.
    """
    half = fft_size // 2
    linear_freqs = np.arange(half + 1) * fs / fft_size
    mel_lo = _freq_to_mel(float(fs) / fft_size)  # one bin up from DC
    mel_hi = _freq_to_mel(fs / 2.0)
    mel_axis = np.linspace(mel_lo, mel_hi, half)
    mel_freqs = _mel_to_freq(mel_axis)

    # linear -> mel gather
    pos = mel_freqs / (fs / fft_size)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, half)
    i1 = np.clip(i0 + 1, 0, half)
    w1 = pos - i0
    # mel -> linear gather
    pos_inv = np.interp(linear_freqs, mel_freqs, np.arange(half))
    j0 = np.clip(np.floor(pos_inv).astype(np.int64), 0, half - 1)
    j1 = np.clip(j0 + 1, 0, half - 1)
    v1 = pos_inv - j0

    # orthonormal DCT-II / DCT-III matrices over mel axis
    dct = _ortho_dct_matrix(half)
    return (i0, i1, w1.astype(np.float64)), (j0, j1, v1.astype(np.float64)), dct


def code_spectral_envelope(
    spectrogram, fs: int, number_of_dimensions: int, basis: str | None = None
):
    """(T, fft//2+1) power envelope -> (T, D) mel-cepstral-like code.

    ``basis="world"`` (default) is pyworld's CodeSpectralEnvelope
    (reference call sites /root/reference/nnsvs/gen.py:1453,2050,
    nnsvs/data/data_source.py:464); ``basis="orthonormal"`` is the
    legacy round-1/2 self-consistent codec.
    """
    basis = basis or default_spectral_codec_basis()
    fft_size = (spectrogram.shape[-1] - 1) * 2
    xp = _xp(spectrogram)
    log_sp = xp.log(spectrogram)
    if basis == "world":
        (i0, w1), _, code_dct, _ = _world_codec_tables(fs, fft_size)
        if xp is jnp:
            i0, w1 = jnp.asarray(i0), jnp.asarray(w1)
            code_dct = jnp.asarray(code_dct)
        mel_sp = log_sp[..., i0] * (1.0 - w1) + log_sp[..., i0 + 1] * w1
        return mel_sp @ code_dct[:number_of_dimensions].T
    if basis != "orthonormal":
        raise ValueError(f"unknown spectral codec basis: {basis!r}")
    (i0, i1, w1), _, dct = _mel_axis_weights(fs, fft_size)
    if xp is jnp:
        i0, i1, w1 = jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(w1)
        dct = jnp.asarray(dct)
    mel_sp = log_sp[..., i0] * (1.0 - w1) + log_sp[..., i1] * w1
    coded = mel_sp @ dct.T
    return coded[..., :number_of_dimensions]


@lru_cache(maxsize=8)
def spectral_decode_cepstrum_basis(
    fs: int, fft_size: int, dim: int, basis: str | None = None
):
    """(dim, fft_size) f32 matrix taking coded mgc straight to the FOLDED
    min-phase cepstrum: ``exp(rfft(coded @ M))`` is the min-phase transfer
    function of the decoded envelope.

    The whole chain decode -> 0.5*log -> irfft -> min-phase fold is
    linear in the coded vector (the codec decodes in the LOG amplitude
    domain), so the synthesis kernel can replace four elementwise/FFT
    passes over (T, fft//2+1) with one MXU matmul.  Built by pushing the
    identity through :func:`decode_spectral_envelope` itself, so it is
    exact for whichever codec basis is active."""
    basis = basis or default_spectral_codec_basis()
    eye = np.eye(dim)
    logw = np.log(
        np.asarray(
            decode_spectral_envelope(eye, fs, fft_size, basis=basis),
            np.float64,
        )
    )
    c = np.fft.irfft(0.5 * logw, n=fft_size, axis=-1)
    half = fft_size // 2
    folded = np.concatenate(
        [
            c[:, :1],
            2.0 * c[:, 1:half],
            c[:, half : half + 1],
            np.zeros((dim, fft_size - half - 1)),
        ],
        axis=1,
    )
    return folded.astype(np.float32)


def decode_spectral_envelope(coded, fs: int, fft_size: int, basis: str | None = None):
    """(T, D) code -> (T, fft//2+1) power envelope (see code_spectral_envelope)."""
    basis = basis or default_spectral_codec_basis()
    xp = _xp(coded)
    D = coded.shape[-1]
    if basis == "world":
        _, (a0, a1, v1), _, decode_dct = _world_codec_tables(fs, fft_size)
        if xp is jnp:
            a0, a1, v1 = jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(v1)
            decode_dct = jnp.asarray(decode_dct)
        mel_sp = coded @ decode_dct[:D, :]
        log_sp = mel_sp[..., a0] * (1.0 - v1) + mel_sp[..., a1] * v1
        return xp.exp(log_sp)
    if basis != "orthonormal":
        raise ValueError(f"unknown spectral codec basis: {basis!r}")
    _, (j0, j1, v1), dct = _mel_axis_weights(fs, fft_size)
    if xp is jnp:
        j0, j1, v1 = jnp.asarray(j0), jnp.asarray(j1), jnp.asarray(v1)
        dct = jnp.asarray(dct)
    # inverse DCT with zero-padded high-order coefficients
    mel_sp = coded @ dct[:D, :]
    log_sp = mel_sp[..., j0] * (1.0 - v1) + mel_sp[..., j1] * v1
    return xp.exp(log_sp)


# --------------------------------------------------------------------------
# Aperiodicity codec (3 kHz bands, dB domain)
# --------------------------------------------------------------------------


def code_aperiodicity(aperiodicity, fs: int):
    """(T, fft//2+1) linear aperiodicity -> (T, n_bands) dB band values.

    WORLD's CodeAperiodicity converts the whole spectrum to dB first and
    linearly interpolates (interp1Q) at the band-center frequencies
    k*3000 Hz; band centers that fall between FFT bins blend the two
    neighbours in the dB domain.  (At fs=48000/fft 2048 the centers land
    exactly on bins, so this only differs at e.g. 44.1 kHz.)
    """
    xp = _xp(aperiodicity)
    fft_size = (aperiodicity.shape[-1] - 1) * 2
    n = get_num_aperiodicities(fs)
    pos = (FREQUENCY_INTERVAL * np.arange(1, n + 1)) * fft_size / fs
    i0 = np.minimum(np.floor(pos).astype(np.int64), fft_size // 2)
    i1 = np.minimum(i0 + 1, fft_size // 2)
    w1 = pos - i0
    if xp is jnp:
        i0, i1 = jnp.asarray(i0), jnp.asarray(i1)
        w1 = jnp.asarray(w1)
    db = 20.0 * xp.log10(xp.maximum(aperiodicity, SAFE_GUARD_MINIMUM))
    return db[..., i0] * (1.0 - w1) + db[..., i1] * w1


@lru_cache(maxsize=8)
def _aperiodicity_interp_weights(fs: int, fft_size: int):
    n = get_num_aperiodicities(fs)
    half = fft_size // 2
    freqs = np.arange(half + 1) * fs / fft_size
    # anchor frequencies: 0 Hz at MIN_DB, band centers, nyquist at ~0 dB
    anchors = np.concatenate(
        [[0.0], FREQUENCY_INTERVAL * np.arange(1, n + 1), [fs / 2.0]]
    )
    seg = np.clip(np.searchsorted(anchors, freqs, side="right") - 1, 0, n)
    w = (freqs - anchors[seg]) / (anchors[seg + 1] - anchors[seg])
    return n, seg.astype(np.int64), w.astype(np.float64)


def decode_aperiodicity(coded_aperiodicity, fs: int, fft_size: int):
    """(T, n_bands) dB codes -> (T, fft//2+1) linear aperiodicity."""
    xp = _xp(coded_aperiodicity)
    n, seg, w = _aperiodicity_interp_weights(fs, fft_size)
    if xp is jnp:
        seg, w = jnp.asarray(seg), jnp.asarray(w)
    T = coded_aperiodicity.shape[0]
    lo_db = xp.full((T, 1), MIN_DB, dtype=coded_aperiodicity.dtype)
    # WORLD anchors the nyquist end at -kMySafeGuardMinimum dB (~0 dB)
    hi_db = xp.full((T, 1), -SAFE_GUARD_MINIMUM, dtype=coded_aperiodicity.dtype)
    anchors_db = xp.concatenate([lo_db, coded_aperiodicity, hi_db], axis=-1)
    a0 = anchors_db[..., seg]
    a1 = anchors_db[..., seg + 1]
    db = a0 * (1.0 - w) + a1 * w
    return xp.power(10.0, db / 20.0)
