"""Time-sharded WORLD synthesis: one long utterance over a device mesh.

The fused vocoder kernel (``synthesis._synthesize_impl``) is per-frame
parallel almost everywhere — the min-phase envelope FFTs and the chunked
FFT convolution (the dominant cost) touch one frame at a time; only the
excitation phase cumsum and the overlap-add couple neighbouring frames.
That makes it a textbook GSPMD program: jit the SAME kernel body with the
frame/sample axes sharded over the mesh and let XLA partition the
per-frame FFTs and insert the (cheap, 1-D) collectives for the cumsum
and the OLA boundary exchange.

This complements the batch-parallel ensemble path (``parallel.mesh`` /
``svs.py`` SPMD inference, which shards TRACKS): here a single long track
is split across chips, the long-form scaling axis the reference's
pyworld synthesis (single-threaded C++, gen.py:1606-1612) has no answer
to.  Numerics are bit-near the single-device kernel (>40 dB SNR,
tests/test_world.py): GSPMD partitions the same XLA program, but the
partitioned cumsum/OLA collectives may reduce in a different order, so
float results are not bit-identical — there is still no halo or
phase-offset approximation, only reduction-order noise.

The single-device bench path is untouched: this module wraps the
undecorated kernel body in its own jit with explicit in_shardings.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ensemble_svs_with_interactions_tpu.ops.world import synthesis as _syn


@lru_cache(maxsize=None)
def _sharded_impl(mesh: Mesh, axis: str, fs: int, hop: int, fft_size: int):
    shard = NamedSharding(mesh, P(axis))
    shard2d = NamedSharding(mesh, P(axis, None))
    def run(f0, sp, ap, noise):
        return _syn._synthesize_body(f0, sp, ap, noise, fs, hop, fft_size)

    return jax.jit(
        run,
        in_shardings=(shard, shard2d, shard2d, shard),
        out_shardings=NamedSharding(mesh, P()),
    )


def synthesize_time_sharded(
    f0,
    spectrogram,
    aperiodicity,
    fs: int,
    frame_period: float = 5.0,
    key=None,
    mesh: Mesh | None = None,
    axis: str | None = None,
):
    """Synthesize one waveform with frames sharded over a device mesh.

    Same contract as :func:`synthesis.synthesize` — f0 (T,) Hz,
    spectrogram (T, fft//2+1) power envelope, aperiodicity (T, fft//2+1)
    in [0, 1] — plus a ``mesh`` (default: a 1-D mesh over all devices).
    Frames are padded to a multiple of the mesh size with silent frames
    (f0 0, envelope 1, aperiodicity 1, noise 0 → zero output) and the
    result is trimmed back to T * hop samples, so the padded program
    produces the exact single-device waveform.
    """
    if mesh is None:
        from ensemble_svs_with_interactions_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if axis is None:
        axis = mesh.axis_names[0]
    n = int(mesh.devices.size)

    hop = int(fs * frame_period / 1000.0)
    fft_size = (spectrogram.shape[-1] - 1) * 2
    T = int(f0.shape[0])
    if key is None:
        key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (T * hop,), dtype=jnp.float32)

    pad = (-T) % n
    f0 = jnp.pad(jnp.asarray(f0, jnp.float32), (0, pad))
    sp = jnp.pad(
        jnp.asarray(spectrogram, jnp.float32),
        ((0, pad), (0, 0)),
        constant_values=1.0,
    )
    ap = jnp.pad(
        jnp.asarray(aperiodicity, jnp.float32),
        ((0, pad), (0, 0)),
        constant_values=1.0,
    )
    noise = jnp.pad(noise, (0, pad * hop))

    wav = _sharded_impl(mesh, axis, fs, hop, fft_size)(f0, sp, ap, noise)
    return wav[: T * hop]


@lru_cache(maxsize=None)
def _sharded_streams_impl(
    mesh: Mesh, axis: str, fs: int, hop: int, fft_size: int,
    vuv_threshold: float, highpass_cutoff: float,
):
    shard = NamedSharding(mesh, P(axis))
    shard2d = NamedSharding(mesh, P(axis, None))

    def run(mgc, lf0, vuv, bap, noise):
        return _syn._from_streams_single_body(
            mgc, lf0, vuv, bap, noise,
            fs, hop, fft_size, vuv_threshold, highpass_cutoff,
        )

    return jax.jit(
        run,
        in_shardings=(shard2d, shard2d, shard2d, shard2d, shard),
        out_shardings=NamedSharding(mesh, P()),
    )


def synthesize_from_streams_time_sharded(
    mgc,
    lf0,
    vuv,
    bap,
    fs: int,
    frame_period: float = 5.0,
    vuv_threshold: float = 0.5,
    key=None,
    highpass_cutoff: float = 0.0,
    mesh: Mesh | None = None,
    axis: str | None = None,
):
    """One long CODED-stream track with frames sharded over a device mesh.

    Same contract as :func:`synthesis.synthesize_from_streams` on a
    single (T, D) track — the FULL fused vocoder (cepstrum matmul codec
    decode, V/UV gating, synthesis, high-pass) runs as one GSPMD program,
    so a single long utterance scales across chips without leaving the
    coded domain.  Frames pad to a multiple of the mesh size with silent
    frames (vuv 0, zero noise -> zero output) and trim back, and the
    noise draw matches the batched kernel's (B=1 row), so numerics are
    bit-near the single-device path (>40 dB SNR, reduction order)."""
    if mesh is None:
        from ensemble_svs_with_interactions_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if axis is None:
        axis = mesh.axis_names[0]
    n = int(mesh.devices.size)

    hop = int(fs * frame_period / 1000.0)
    from ensemble_svs_with_interactions_tpu.ops.world.codec import (
        get_cheaptrick_fft_size,
    )

    fft_size = get_cheaptrick_fft_size(fs)
    arrs = [jnp.asarray(a, jnp.float32) for a in (mgc, lf0, vuv, bap)]
    T = int(arrs[1].shape[0])
    if key is None:
        key = jax.random.PRNGKey(0)
    # same stream as the batched kernel's B=1 noise row -> testable parity
    noise = jax.random.normal(key, (1, T * hop), dtype=jnp.float32)[0]

    pad = (-T) % n
    arrs = [jnp.pad(a, ((0, pad), (0, 0))) for a in arrs]
    noise = jnp.pad(noise, (0, pad * hop))

    wav = _sharded_streams_impl(
        mesh, axis, fs, hop, fft_size,
        float(vuv_threshold), float(highpass_cutoff),
    )(*arrs, noise)
    return wav[: T * hop]
