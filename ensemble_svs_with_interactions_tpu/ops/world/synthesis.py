"""WORLD-style synthesis as a jitted TPU kernel.

Replaces ``pyworld.synthesize`` on the inference hot path (reference call
site: /root/reference/nnsvs/gen.py:1606-1612 — there it is native C++ running
per-pulse on the CPU; here the whole vocoder is a single XLA program).

Algorithm (batched over frames, no data-dependent control flow):
  1. Per-frame minimum-phase impulse response of the TOTAL envelope via
     the cepstrum method — one batched (T, fft) FFT pass.
  2. WORLD's periodic/aperiodic split (periodic = sp * (1 - ap^2),
     aperiodic = sp * ap^2) is applied in the conv stage's frequency
     domain as real per-frame weights sqrt(1-ap^2) / sqrt(ap^2) on the
     pulse / noise excitation spectra.  Output MAGNITUDES are identical
     to filtering each path through its own min-phase response; only the
     phase of the aperiodicity ratio component differs (zero-phase
     instead of min-phase), which halves the cepstrum FFT work.
  3. Excitation: a pulse train from the cumulative phase of the sample-rate
     F0 track (pulse amplitude sqrt(fs/f0) for unit average PSD) plus unit
     white noise.
  4. Time-varying filtering: excitation chunked per frame, convolved with
     that frame's response via an fft_size-point circular FFT product,
     overlap-added with a static-shape shift-add (no scatter).  Because
     the convolution FFT length equals the cepstrum FFT length, the
     min-phase transfer function never leaves the frequency domain (the
     IR's linear-convolution tail beyond fft_size - hop, ~-120 dB, wraps
     circularly — inaudible for CheapTrick-smooth envelopes).

Everything is static-shape: jit recompiles only per (num_frames bucket,
fft_size, hop).  Callers should pad frame counts to buckets.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12

# Compensates the harmonic-path envelope inflation of the analysis chain
# (ops/world/analysis.py NOISE_CALIBRATION notes): pulse amplitude factor
# sqrt(1.06 / 1.73), measured by the copy-synthesis invariance tests.
PULSE_CALIBRATION = 0.783


def minimum_phase_spectrum(power_spec, fft_size: int):
    """(T, half+1) power spectrum -> (T, half+1) complex min-phase
    transfer function (the rfft of the causal min-phase IR)."""
    half = fft_size // 2
    logamp = 0.5 * jnp.log(jnp.maximum(power_spec, _EPS))
    c = jnp.fft.irfft(logamp, n=fft_size, axis=-1)
    # fold negative quefrencies onto positive ones (min-phase cepstrum)
    fold = jnp.concatenate(
        [
            c[..., :1],
            2.0 * c[..., 1:half],
            c[..., half : half + 1],
            jnp.zeros_like(c[..., half + 1 :]),
        ],
        axis=-1,
    )
    return jnp.exp(jnp.fft.rfft(fold, n=fft_size, axis=-1))


def minimum_phase_ir(power_spec, fft_size: int):
    """(T, half+1) power spectrum -> (T, fft_size) causal min-phase IRs."""
    return jnp.fft.irfft(
        minimum_phase_spectrum(power_spec, fft_size), n=fft_size, axis=-1
    )


def _overlap_add(chunks, hop: int, out_len: int):
    """OLA (T, L) chunks at stride ``hop`` into a length-out_len signal.

    Static-shape shift-add: reshape each chunk into K hop-sized pieces and
    accumulate K shifted (T, hop) planes — no scatter ops.
    """
    T, L = chunks.shape
    K = -(-L // hop)  # ceil
    pad = K * hop - L
    chunks = jnp.pad(chunks, ((0, 0), (0, pad)))
    pieces = chunks.reshape(T, K, hop)
    acc = jnp.zeros((T + K, hop), chunks.dtype)
    for k in range(K):
        acc = acc.at[k : k + T].add(pieces[:, k, :])
    return acc.reshape(-1)[:out_len]


def _wrapped_phase(inc):
    """Cumulative phase mod 1 (cycles) of per-sample increments, float32.

    Two-level accumulation: an absolute f32 cumsum loses fractional
    resolution past ~2^13 cycles (a 4-min 220 Hz track accumulates ~53k
    cycles -> fractional granularity ~0.004 cycles, defeating the
    fractional pulse delay).  Blocks of 4096 samples cumsum locally
    (<~40 cycles, exact to ~4e-6); block totals propagate mod 1, so the
    outer cumsum stays small too.
    """
    NB = 4096
    n_blocks = -(-inc.shape[0] // NB)
    inc_pad = jnp.pad(inc, (0, n_blocks * NB - inc.shape[0]))
    inner = jnp.cumsum(inc_pad.reshape(n_blocks, NB), axis=1)
    block_tot = jnp.mod(inner[:, -1], 1.0)
    offsets = jnp.mod(
        jnp.concatenate(
            [jnp.zeros((1,), inner.dtype), jnp.cumsum(block_tot)[:-1]]
        ),
        1.0,
    )
    return jnp.mod(offsets[:, None] + inner, 1.0).reshape(-1)[: inc.shape[0]]


def _synthesize_body(f0, sp, ap, noise, fs: int, hop: int, fft_size: int):
    """Undecorated kernel body — synthesis_sharded re-jits it with explicit
    shardings; the single-device path uses the jitted ``_synthesize_impl``.

    The coded-stream path (:func:`synthesize_from_streams`) skips the
    ``sp`` -> transfer-function step: its min-phase cepstrum comes
    straight from the mgc matmul (codec.spectral_decode_cepstrum_basis)
    and enters at :func:`_synthesize_from_transfer`."""
    # ONE min-phase pass on the total envelope, kept in the FREQUENCY
    # domain (no irfft->rfft round trip: the conv FFT length below equals
    # fft_size, so the cepstrum rfft IS the convolution transfer
    # function).  The periodic/aperiodic power split becomes frequency-
    # domain excitation weights (magnitude-identical to per-path
    # min-phase responses).
    H = minimum_phase_spectrum(sp, fft_size)
    return _synthesize_from_transfer(f0, H, ap, noise, fs, hop, fft_size)


def _synthesize_from_transfer(
    f0, H, ap, noise, fs: int, hop: int, fft_size: int
):
    """Excitation + time-varying filtering given the complex min-phase
    transfer function H (T, fft//2+1) of the spectral envelope."""
    T = f0.shape[0]
    N = T * hop

    voiced = f0 > 0.0
    f0_safe = jnp.where(voiced, f0, 1.0)

    # ---- excitation ------------------------------------------------------
    # sample-rate f0 (frame hold)
    f0_samples = jnp.repeat(jnp.where(voiced, f0, 0.0), hop)
    inc = f0_samples / fs  # cycles per sample
    phase = _wrapped_phase(inc)
    # a pulse fires where the wrapped phase wraps past 1.0
    prev_phase = jnp.concatenate([jnp.zeros((1,), phase.dtype), phase[:-1]])
    new_pulse = phase < prev_phase
    amp = PULSE_CALIBRATION * jnp.sqrt(fs / jnp.repeat(f0_safe, hop))
    # fractional pulse placement: the true phase crossing lies mu samples
    # BEFORE the sample where the phase wraps; rounding it to the grid
    # phase-modulates the pulse train (sidebands ~2*pi*f*mu/fs between
    # harmonics).  An 8-tap Hann-windowed-sinc split realizes the
    # fractional delay with a flat passband (pyworld likewise
    # phase-corrects per pulse).
    cycles_per_sample = jnp.maximum(inc, 1e-9)
    mu = jnp.clip(phase / cycles_per_sample, 0.0, 1.0)
    fire = new_pulse & (f0_samples > 0)
    a = jnp.where(fire, amp, 0.0)
    zero = jnp.zeros((1,), amp.dtype)
    # pulse at s = t0 - mu; tap at t0 + j carries h(j + mu),
    # h(u) = sinc(u) * hann(u / HALF) for |u| < HALF
    HALF = 4
    parts = []
    for j in range(-HALF, HALF):
        u = j + mu
        h = jnp.sinc(u) * (0.5 + 0.5 * jnp.cos(jnp.pi * u / HALF))
        tap = a * h
        if j < 0:
            tap = jnp.concatenate([tap[-j:], jnp.tile(zero, -j)])
        elif j > 0:
            tap = jnp.concatenate([jnp.tile(zero, j), tap[:-j]])
        parts.append(tap)
    pulses = sum(parts).astype(jnp.float32)

    # ---- per-frame responses --------------------------------------------
    ap2 = jnp.clip(ap, 0.0, 1.0) ** 2
    # unvoiced frames: everything is noise
    ap2 = jnp.where(voiced[:, None], ap2, jnp.ones_like(ap2))

    # ---- time-varying filtering (chunked FFT convolution + OLA) ----------
    # Circular convolution of each hop-sized excitation chunk with the
    # full fft_size-tap IR in an fft_size buffer: the linear-conv tail
    # (IR taps beyond fft_size - hop, ~-120 dB for CheapTrick-smooth
    # envelopes) wraps onto the chunk start — inaudible, and it saves
    # two more full FFT passes per frame.
    exc = jnp.stack([pulses, noise.astype(jnp.float32)]).reshape(2 * T, hop)
    X = jnp.fft.rfft(exc, n=fft_size, axis=-1).reshape(2, T, -1)
    # sqrt power weights on the envelope's own half+1 bins
    w_per = jnp.sqrt(jnp.maximum(1.0 - ap2, 0.0))
    w_apr = jnp.sqrt(ap2)
    Y = (X[0] * w_per + X[1] * w_apr) * H
    y = jnp.fft.irfft(Y, n=fft_size, axis=-1)
    return _overlap_add(y, hop, N)


_synthesize_impl = partial(jax.jit, static_argnames=("fs", "hop", "fft_size"))(
    _synthesize_body
)


def quantize_peak_norm_int16(wav, lengths=None):
    """Per-signal peak normalization + int16 quantization (device side).

    Keeps the device->host transfer at 2 bytes/sample (the reference's
    final wav conversion, gen.py:1733-1743, done on host after transfer).
    wav: (B, N); lengths: (B,) valid sample counts for the peak search.
    """
    if lengths is not None:
        mask = jnp.arange(wav.shape[1])[None, :] < lengths[:, None]
        peak = jnp.max(jnp.abs(jnp.where(mask, wav, 0.0)), axis=1, keepdims=True)
    else:
        peak = jnp.max(jnp.abs(wav), axis=1, keepdims=True)
    wav = wav / jnp.maximum(peak, 1e-8)
    return jnp.clip(wav * 32767.0, -32768.0, 32767.0).astype(jnp.int16)


def _highpass_mask(fs: int, fft_size: int, cutoff: float):
    """Smooth high-pass weighting over rfft bins (replaces the host-side
    70 Hz Butterworth bandpass of postprocess_waveform on the fused path)."""
    freqs = np.arange(fft_size // 2 + 1) * fs / fft_size
    # raised-cosine transition from 0 at 0.5*cutoff to 1 at 1.5*cutoff
    lo, hi = 0.5 * cutoff, 1.5 * cutoff
    t = np.clip((freqs - lo) / (hi - lo), 0.0, 1.0)
    return (0.5 - 0.5 * np.cos(np.pi * t)).astype(np.float32)


@lru_cache(maxsize=8)
def _highpass_cepstrum(fs: int, fft_size: int, cutoff: float):
    """Folded min-phase cepstrum of the high-pass amplitude mask — an
    additive constant on the mgc-derived cepstrum (log-domain product)."""
    hp = _highpass_mask(fs, fft_size, cutoff).astype(np.float64)
    logamp = np.log(np.maximum(hp, 1e-7))  # stopband floor -140 dB
    c = np.fft.irfft(logamp, n=fft_size)
    half = fft_size // 2
    return np.concatenate(
        [c[:1], 2.0 * c[1:half], c[half : half + 1],
         np.zeros(fft_size - half - 1)]
    ).astype(np.float32)


@partial(
    jax.jit,
    static_argnames=("fs", "hop", "fft_size", "vuv_threshold", "highpass_cutoff"),
)
def _synthesize_from_streams_impl(
    mgc, lf0, vuv, bap, noise, fs: int, hop: int, fft_size: int,
    vuv_threshold: float, highpass_cutoff: float = 0.0,
):
    """Batched fused vocoder: coded streams -> waveforms, all on device.

    mgc (B, T, M), lf0 (B, T, 1), vuv (B, T, 1), bap (B, T, A) ->
    (B, T*hop).  Fuses the WORLD codecs (device matmuls/gathers), V/UV
    gating and the synthesis kernel into one XLA program — the reference's
    equivalent path crosses host/native boundaries three times
    (gen.py:2022-2080 + pyworld.synthesize).

    The spectral side never materializes the envelope: mgc goes straight
    to the folded min-phase cepstrum through ONE precomputed matmul
    (codec.spectral_decode_cepstrum_basis — decode, 0.5*log, irfft and
    the min-phase fold are all linear in the coded vector), and the
    output high-pass is a constant cepstrum offset.  Numerically this
    also beats the decode->exp->log chain: 0.5*log(exp(x)) == 0.5*x with
    no f32 exp under/overflow.
    """
    def one(mgc_b, lf0_b, vuv_b, bap_b, noise_b):
        return _from_streams_single_body(
            mgc_b, lf0_b, vuv_b, bap_b, noise_b,
            fs, hop, fft_size, vuv_threshold, highpass_cutoff,
        )

    return jax.vmap(one)(mgc, lf0, vuv, bap, noise)


def _from_streams_single_body(
    mgc, lf0, vuv, bap, noise, fs: int, hop: int, fft_size: int,
    vuv_threshold: float, highpass_cutoff: float,
):
    """One track of the fused coded-stream vocoder: (T, D) streams +
    (T*hop,) noise -> (T*hop,) waveform.  The batched path vmaps this;
    the time-sharded path (synthesis_sharded) jits it with the frame
    axis sharded over a mesh."""
    from ensemble_svs_with_interactions_tpu.ops.world.codec import (
        decode_aperiodicity,
        spectral_decode_cepstrum_basis,
    )

    Mc = jnp.asarray(
        spectral_decode_cepstrum_basis(fs, fft_size, int(mgc.shape[-1]))
    )
    # HIGHEST: the cepstrum feeds an exp — bf16 matmul error here would
    # tint the envelope by ~0.1 dB-scale wobbles
    c = jnp.einsum(
        "td,df->tf", mgc, Mc, precision=jax.lax.Precision.HIGHEST
    )
    if highpass_cutoff > 0:
        c = c + jnp.asarray(
            _highpass_cepstrum(fs, fft_size, highpass_cutoff)
        )[None, :]
    H = jnp.exp(jnp.fft.rfft(c, n=fft_size, axis=-1))  # (T, half+1)

    ap = decode_aperiodicity(bap, fs, fft_size)
    voiced = vuv[..., 0] > vuv_threshold
    ap = jnp.where(voiced[..., None], ap, jnp.maximum(ap, 1.0 - 1e-7))
    ap = jnp.clip(ap, 0.0, 1.0)
    f0 = jnp.where(voiced, jnp.exp(lf0[..., 0]), 0.0)
    return _synthesize_from_transfer(f0, H, ap, noise, fs, hop, fft_size)


def synthesize_from_streams(
    mgc,
    lf0,
    vuv,
    bap,
    fs: int,
    frame_period: float = 5.0,
    vuv_threshold: float = 0.5,
    key=None,
    highpass_cutoff: float = 0.0,
    fft_size: int | None = None,
):
    """Batched coded-stream synthesis.  Accepts (T, D) or (B, T, D).

    ``fft_size`` sets the synthesis working resolution (min-phase IR
    length == convolution FFT length == decoded-envelope bins).  Default
    is CheapTrick's analysis size (2048 at 48 kHz); the coded streams are
    resolution-independent, so decoding onto a smaller axis trades
    envelope detail for FFT work.  ``ESVS_VOCODER_FFT_SIZE`` overrides
    (A/B'd against an SNR bound — see tests/test_world.py and
    docs/performance.md)."""
    single = jnp.ndim(mgc) == 2
    arrs = [jnp.asarray(a, jnp.float32) for a in (mgc, lf0, vuv, bap)]
    if single:
        arrs = [a[None] for a in arrs]
    mgc, lf0, vuv, bap = arrs
    hop = int(fs * frame_period / 1000.0)
    from ensemble_svs_with_interactions_tpu.ops.world.codec import (
        get_cheaptrick_fft_size,
    )

    if fft_size is None:
        env = os.environ.get("ESVS_VOCODER_FFT_SIZE")
        fft_size = int(env) if env else get_cheaptrick_fft_size(fs)
    if fft_size < 4 * hop:
        raise ValueError(
            f"fft_size {fft_size} too small for hop {hop}: the circular "
            "convolution tail would wrap audibly (need >= 4*hop)"
        )
    B, T = lf0.shape[0], lf0.shape[1]
    if key is None:
        key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (B, T * hop), dtype=jnp.float32)
    wav = _synthesize_from_streams_impl(
        mgc, lf0, vuv, bap, noise, fs, hop, fft_size, float(vuv_threshold),
        float(highpass_cutoff),
    )
    return wav[0] if single else wav


def synthesize(
    f0,
    spectrogram,
    aperiodicity,
    fs: int,
    frame_period: float = 5.0,
    key=None,
):
    """Synthesize a waveform from WORLD parameters.

    Args:
        f0: (T,) fundamental frequency in Hz (0 = unvoiced).
        spectrogram: (T, fft//2+1) power spectral envelope (CheapTrick).
        aperiodicity: (T, fft//2+1) linear aperiodicity in [0, 1] (D4C).
        fs: sampling rate.
        frame_period: frame shift in ms.
        key: PRNG key for the noise excitation (seeded default if None).

    Returns:
        (T * hop,) float32 waveform.
    """
    hop = int(fs * frame_period / 1000.0)
    fft_size = (spectrogram.shape[-1] - 1) * 2
    T = int(f0.shape[0])
    if key is None:
        key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (T * hop,), dtype=jnp.float32)
    return _synthesize_impl(
        jnp.asarray(f0, jnp.float32),
        jnp.asarray(spectrogram, jnp.float32),
        jnp.asarray(aperiodicity, jnp.float32),
        noise,
        fs,
        hop,
        fft_size,
    )
