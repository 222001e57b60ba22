"""WORLD-style synthesis as a jitted TPU kernel.

Replaces ``pyworld.synthesize`` on the inference hot path (reference call
site: /root/reference/nnsvs/gen.py:1606-1612 — there it is native C++ running
per-pulse on the CPU; here the whole vocoder is a single XLA program).

Algorithm (batched over frames, no data-dependent control flow):
  1. Split the envelope into periodic / aperiodic power using WORLD's
     convention: periodic = sp * (1 - ap^2), aperiodic = sp * ap^2.
  2. Per-frame minimum-phase impulse responses via the cepstrum method —
     two batched (T, fft) FFTs, XLA-fused.
  3. Excitation: a pulse train from the cumulative phase of the sample-rate
     F0 track (pulse amplitude sqrt(fs/f0) for unit average PSD) plus unit
     white noise.
  4. Time-varying filtering: excitation chunked per frame, convolved with
     that frame's IR via FFT, overlap-added with a static-shape shift-add
     (no scatter).

Everything is static-shape: jit recompiles only per (num_frames bucket,
fft_size, hop).  Callers should pad frame counts to buckets.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12

# Compensates the harmonic-path envelope inflation of the analysis chain
# (ops/world/analysis.py NOISE_CALIBRATION notes): pulse amplitude factor
# sqrt(1.06 / 1.73), measured by the copy-synthesis invariance tests.
PULSE_CALIBRATION = 0.783


def minimum_phase_ir(power_spec, fft_size: int):
    """(T, half+1) power spectrum -> (T, fft_size) causal min-phase IRs."""
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
    H = jnp.exp(jnp.fft.rfft(fold, n=fft_size, axis=-1))
    return jnp.fft.irfft(H, n=fft_size, axis=-1)


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


@partial(jax.jit, static_argnames=("fs", "hop", "fft_size"))
def _synthesize_impl(f0, sp, ap, noise, fs: int, hop: int, fft_size: int):
    T = f0.shape[0]
    N = T * hop
    half = fft_size // 2

    voiced = f0 > 0.0
    f0_safe = jnp.where(voiced, f0, 1.0)

    # ---- excitation ------------------------------------------------------
    # sample-rate f0 (frame hold)
    f0_samples = jnp.repeat(jnp.where(voiced, f0, 0.0), hop)
    phase = jnp.cumsum(f0_samples) / fs  # cycles
    k = jnp.floor(phase)
    new_pulse = jnp.concatenate([jnp.zeros((1,), k.dtype), jnp.diff(k)]) > 0
    amp = PULSE_CALIBRATION * jnp.sqrt(fs / jnp.repeat(f0_safe, hop))
    # fractional pulse placement: the true phase crossing lies mu samples
    # BEFORE the sample where floor(phase) increments; rounding it to the
    # grid phase-modulates the pulse train (sidebands ~2*pi*f*mu/fs between
    # harmonics).  An 8-tap Hann-windowed-sinc split realizes the
    # fractional delay with a flat passband (pyworld likewise
    # phase-corrects per pulse).
    cycles_per_sample = jnp.maximum(f0_samples / fs, 1e-9)
    mu = jnp.clip((phase - k) / cycles_per_sample, 0.0, 1.0)
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
    per_power = sp * (1.0 - ap2)
    apr_power = sp * ap2
    # one batched cepstrum pass for both paths (3 large FFT calls, not 6)
    h_both = minimum_phase_ir(
        jnp.concatenate([per_power, apr_power], axis=0), fft_size
    )
    h_per, h_apr = h_both[:T], h_both[T:]

    # ---- time-varying filtering (chunked FFT convolution + OLA) ----------
    conv_len = fft_size + hop
    Lfft = int(2 ** np.ceil(np.log2(conv_len)))

    # batched excitation/IR transforms; the periodic and aperiodic paths
    # are summed in the FREQUENCY domain so one inverse FFT covers both
    exc = jnp.stack([pulses, noise.astype(jnp.float32)]).reshape(2 * T, hop)
    X = jnp.fft.rfft(exc, n=Lfft, axis=-1).reshape(2, T, -1)
    H = jnp.fft.rfft(
        jnp.concatenate([h_per, h_apr], axis=0), n=Lfft, axis=-1
    ).reshape(2, T, -1)
    Y = X[0] * H[0] + X[1] * H[1]
    y = jnp.fft.irfft(Y, n=Lfft, axis=-1)[:, :conv_len]
    return _overlap_add(y, hop, N)


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
    """
    from ensemble_svs_with_interactions_tpu.ops.world.codec import (
        decode_aperiodicity,
        decode_spectral_envelope,
    )

    B, T = lf0.shape[0], lf0.shape[1]
    sp = decode_spectral_envelope(mgc, fs, fft_size)  # (B, T, half+1)
    if highpass_cutoff > 0:
        # fold the output high-pass into the spectral envelope (power domain)
        hp = jnp.asarray(_highpass_mask(fs, fft_size, highpass_cutoff))
        sp = sp * (hp * hp)[None, None, :]
    ap = decode_aperiodicity(
        bap.reshape(B * T, -1), fs, fft_size
    ).reshape(B, T, -1)
    voiced = vuv[..., 0] > vuv_threshold
    ap = jnp.where(voiced[..., None], ap, jnp.maximum(ap, 1.0 - 1e-7))
    ap = jnp.clip(ap, 0.0, 1.0)
    f0 = jnp.where(voiced, jnp.exp(lf0[..., 0]), 0.0)

    def one(f0_b, sp_b, ap_b, noise_b):
        return _synthesize_impl(f0_b, sp_b, ap_b, noise_b, fs, hop, fft_size)

    return jax.vmap(one)(f0, sp, ap, noise)


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
):
    """Batched coded-stream synthesis.  Accepts (T, D) or (B, T, D)."""
    single = jnp.ndim(mgc) == 2
    arrs = [jnp.asarray(a, jnp.float32) for a in (mgc, lf0, vuv, bap)]
    if single:
        arrs = [a[None] for a in arrs]
    mgc, lf0, vuv, bap = arrs
    hop = int(fs * frame_period / 1000.0)
    from ensemble_svs_with_interactions_tpu.ops.world.codec import (
        get_cheaptrick_fft_size,
    )

    fft_size = get_cheaptrick_fft_size(fs)
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
