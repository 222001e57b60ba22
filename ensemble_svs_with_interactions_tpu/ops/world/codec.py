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

KNOWN DIVERGENCE (documented, see PARITY.md): the spectral codec is
self-consistent (code/decode roundtrip-tested) but not bit-compatible
with pyworld's CodeSpectralEnvelope — WORLD spans its mel axis over
[40 Hz, min(fs/2, 20 kHz)] with endpoint-exclusive spacing and uses an
FFT-based DCT with its own normalization, while this codec spans
[one bin, fs/2] with an orthonormal DCT.  Models trained with THIS
framework's codec are unaffected; porting a torch checkpoint that was
trained on pyworld-coded mgc decodes through a slightly different basis.
A faithful port needs golden pyworld fixtures to validate against, which
this environment cannot produce (no pyworld, no egress).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# WORLD constants (world/constantnumbers.h)
FREQUENCY_INTERVAL = 3000.0
UPPER_LIMIT = 15000.0
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
def _mel_axis_weights(fs: int, fft_size: int):
    """Linear-interpolation gather (indices, weights) for linear->mel and
    mel->linear resampling of the log envelope, plus DCT matrices.

    The mel axis has fft_size//2 points spanning [mel(f_low), mel(f_high)]
    with half-bin guards, mirroring WORLD's codec design.
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
    n = half
    k = np.arange(n)
    dct = np.cos(np.pi * (k[:, None]) * (2 * k[None, :] + 1) / (2 * n))
    dct *= np.sqrt(2.0 / n)
    dct[0] *= np.sqrt(0.5)
    return (i0, i1, w1.astype(np.float64)), (j0, j1, v1.astype(np.float64)), dct


def code_spectral_envelope(spectrogram, fs: int, number_of_dimensions: int):
    """(T, fft//2+1) power envelope -> (T, D) mel-cepstral-like code."""
    fft_size = (spectrogram.shape[-1] - 1) * 2
    (i0, i1, w1), _, dct = _mel_axis_weights(fs, fft_size)
    xp = _xp(spectrogram)
    if xp is jnp:
        i0, i1, w1 = jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(w1)
        dct = jnp.asarray(dct)
    log_sp = xp.log(spectrogram)
    mel_sp = log_sp[..., i0] * (1.0 - w1) + log_sp[..., i1] * w1
    coded = mel_sp @ dct.T
    return coded[..., :number_of_dimensions]


def decode_spectral_envelope(coded, fs: int, fft_size: int):
    """(T, D) code -> (T, fft//2+1) power envelope."""
    _, (j0, j1, v1), dct = _mel_axis_weights(fs, fft_size)
    xp = _xp(coded)
    half = fft_size // 2
    if xp is jnp:
        j0, j1, v1 = jnp.asarray(j0), jnp.asarray(j1), jnp.asarray(v1)
        dct = jnp.asarray(dct)
    D = coded.shape[-1]
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
    hi_db = xp.full((T, 1), -1e-7, dtype=coded_aperiodicity.dtype)
    anchors_db = xp.concatenate([lo_db, coded_aperiodicity, hi_db], axis=-1)
    a0 = anchors_db[..., seg]
    a1 = anchors_db[..., seg + 1]
    db = a0 * (1.0 - w) + a1 * w
    return xp.power(10.0, db / 20.0)
