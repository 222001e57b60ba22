"""Parity tests: native C++ analysis kernels vs the NumPy reference path.

The native layer (ensemble_svs_with_interactions_tpu/native/) replaces the
reference's pyworld C++ on the data-prep hot path; these tests pin it to
the vectorized NumPy implementation bit-near-exactly so either path can
serve as the oracle for the other.
"""

import os

import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu import native
from ensemble_svs_with_interactions_tpu.ops.world import analysis

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native kernels unavailable (no g++?)"
)


@pytest.fixture
def signal():
    fs = 48000
    t = np.arange(fs * 2) / fs
    f0 = 196.0 * (1 + 0.08 * np.sin(2 * np.pi * 5.5 * t))  # vibrato around G3
    rng = np.random.default_rng(7)
    x = np.zeros_like(t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    for k, a in enumerate([1.0, 0.5, 0.3, 0.2, 0.1], start=1):
        x += a * np.sin(k * phase)
    x *= 0.3
    x += 0.02 * rng.standard_normal(len(t))
    x[: fs // 4] = 0.02 * rng.standard_normal(fs // 4)  # unvoiced head
    return x, fs


def _numpy_path(fn, *args, **kwargs):
    os.environ["ESVS_DISABLE_NATIVE"] = "1"
    try:
        return fn(*args, **kwargs)
    finally:
        os.environ["ESVS_DISABLE_NATIVE"] = "0"


def test_nccf_parity(signal):
    x, fs = signal
    centers = np.arange(0, len(x) - 1, 240, dtype=np.int64)
    got = analysis._nccf_candidates(x, fs, centers, 71.0, 800.0, 5)
    want = _numpy_path(analysis._nccf_candidates, x, fs, centers, 71.0, 800.0, 5)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-9, atol=1e-9)  # f0
    np.testing.assert_allclose(got[1], want[1], rtol=1e-9, atol=1e-12)  # score
    np.testing.assert_allclose(got[2], want[2], rtol=1e-9)  # energy


def test_harvest_parity(signal):
    x, fs = signal
    got, t1 = analysis.harvest(x, fs)
    want, t2 = _numpy_path(analysis.harvest, x, fs)
    np.testing.assert_allclose(t1, t2)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-7)


def test_cheaptrick_parity(signal):
    x, fs = signal
    f0, ts = analysis.harvest(x, fs)
    got = analysis.cheaptrick(x, f0, ts, fs)
    want = _numpy_path(analysis.cheaptrick, x, f0, ts, fs)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_d4c_parity(signal):
    x, fs = signal
    f0, ts = analysis.harvest(x, fs)
    got = analysis.d4c(x, f0, ts, fs)
    want = _numpy_path(analysis.d4c, x, f0, ts, fs)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_stonemask_parity(signal):
    x, fs = signal
    f0, ts = analysis.dio(x, fs)
    got = analysis.stonemask(x, f0, ts, fs)
    want = _numpy_path(analysis.stonemask, x, f0, ts, fs)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_native_is_faster(signal):
    """The point of the native layer: it must beat NumPy clearly."""
    import time

    x, fs = signal
    t0 = time.perf_counter()
    f0, ts = analysis.harvest(x, fs)
    analysis.cheaptrick(x, f0, ts, fs)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    _numpy_path(analysis.harvest, x, fs)
    _numpy_path(analysis.cheaptrick, x, f0, ts, fs)
    t_np = time.perf_counter() - t0
    assert t_nat < t_np, (t_nat, t_np)


def test_disable_env_var(signal):
    x, fs = signal
    os.environ["ESVS_DISABLE_NATIVE"] = "1"
    try:
        assert not native.available()
    finally:
        os.environ["ESVS_DISABLE_NATIVE"] = "0"
    assert native.available()


def test_stale_so_missing_symbol_falls_back(signal, monkeypatch):
    """A cached .so missing a newer export (AttributeError from dlsym)
    must fall back to the NumPy path, not crash every lib() caller."""
    import ensemble_svs_with_interactions_tpu.native as nat

    monkeypatch.setattr(nat, "_LIB", None)
    monkeypatch.setattr(nat, "_TRIED", False)

    def bad_declare(lib):
        raise AttributeError("undefined symbol: esvs_new_kernel")

    monkeypatch.setattr(nat, "_declare", bad_declare)
    monkeypatch.setattr(nat, "_build", lambda so: False)
    # real so exists on disk; _declare rejects it, rebuild "fails"
    assert nat.lib() is None
    assert nat.available() is False  # cached, no re-raise
    # fresh state + working declare restores the library
    monkeypatch.undo()
    nat._TRIED = False
    nat._LIB = None
    assert nat.available()
