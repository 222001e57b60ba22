"""First-party native (C++) kernels for host-side analysis.

The reference delegates its host-side DSP to native extensions (pyworld /
pysptk / nnmnkwii Cython); this package is the equivalent native layer for
the TPU rebuild: fused per-frame C++ kernels for the WORLD analysis stack
(``world_kernels.cpp``), bound via ctypes (no pybind11 in this
environment).

The shared library is compiled on demand with g++ and cached next to the
source; the build is skipped (and ``lib()`` returns None) when a compiler
is unavailable or ``ESVS_DISABLE_NATIVE=1``, in which case callers fall
back to the vectorized NumPy implementations in ``ops/world/analysis.py``
— both paths are parity-tested against each other (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "world_kernels.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_c_double_p = ctypes.POINTER(ctypes.c_double)
_c_int64_p = ctypes.POINTER(ctypes.c_int64)
_c_uint8_p = ctypes.POINTER(ctypes.c_uint8)


def _so_path() -> Path:
    tag = sysconfig.get_platform().replace("-", "_").replace(".", "_")
    return _HERE / f"_world_kernels_{tag}.so"


def _build(so: Path) -> bool:
    # compile to a unique temp file and rename into place: several
    # data-prep worker processes may race the first build, and linking
    # straight onto the final path would truncate a file another process
    # has already dlopen'ed
    tmp = so.with_suffix(f".tmp{os.getpid()}")
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fno-math-errno",
        str(_SRC),
        "-o",
        str(tmp),
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=300
        )
        if proc.returncode == 0 and tmp.exists():
            os.replace(tmp, so)
            return True
        return False
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        tmp.unlink(missing_ok=True)


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.esvs_cheaptrick.restype = None
    lib.esvs_cheaptrick.argtypes = [
        _c_double_p, ctypes.c_int64,            # x, n
        _c_double_p, _c_int64_p, ctypes.c_int64,  # f0_safe, centers, T
        ctypes.c_int64, ctypes.c_int64,          # fs, fft_size
        ctypes.c_double, ctypes.c_double,        # q1, noise_calibration
        _c_double_p,                             # env out (T, half+1)
    ]
    lib.esvs_nccf.restype = None
    lib.esvs_nccf.argtypes = [
        _c_double_p, ctypes.c_int64,             # x, n
        _c_int64_p, ctypes.c_int64,              # centers, T
        ctypes.c_int64,                          # fs
        ctypes.c_double, ctypes.c_double,        # f0_floor, f0_ceil
        ctypes.c_int64,                          # K
        _c_double_p, _c_double_p, _c_double_p,   # f0_cand, score, energy
    ]
    lib.esvs_refine_if.restype = None
    lib.esvs_refine_if.argtypes = [
        _c_double_p, ctypes.c_int64,             # x, n
        _c_double_p, _c_int64_p, ctypes.c_int64,  # est (inout), centers, T
        ctypes.c_int64,                          # fs
        ctypes.c_double, ctypes.c_int64, ctypes.c_int64,  # periods, n_harm, iters
    ]
    lib.esvs_d4c_coarse.restype = None
    lib.esvs_d4c_coarse.argtypes = [
        _c_double_p, ctypes.c_int64,             # x, n
        _c_double_p, _c_int64_p, ctypes.c_int64,  # period (samples), centers, T
        ctypes.c_int64, ctypes.c_int64,          # fft_size, L_long
        ctypes.c_int64,                          # fs
        ctypes.c_double,                         # freq_interval
        ctypes.c_int64,                          # n_bands
        _c_double_p,                             # coarse out (T, n_bands)
    ]
    lib.esvs_periodicity.restype = None
    lib.esvs_periodicity.argtypes = [
        _c_double_p, ctypes.c_int64,             # x, n
        _c_double_p, _c_int64_p, ctypes.c_int64,  # f0_safe, centers, T
        ctypes.c_int64, ctypes.c_int64,          # fs, max_lag
        _c_double_p,                             # periodicity out (T,)
    ]
    return lib


def lib() -> Optional[ctypes.CDLL]:
    """The loaded kernel library, building it on first use; None if
    unavailable or disabled via ESVS_DISABLE_NATIVE=1."""
    global _LIB, _TRIED
    if os.environ.get("ESVS_DISABLE_NATIVE", "0") == "1":
        return None
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        so = _so_path()
        try:
            if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
                if not _build(so):
                    _TRIED = True
                    return None
            _LIB = _declare(ctypes.CDLL(str(so)))
        except (OSError, AttributeError):
            # stale/incompatible cache (AttributeError = a cached .so
            # missing a newer export; mtimes are unreliable after copies/
            # clones): rebuild once, else fall back to NumPy
            try:
                so.unlink(missing_ok=True)
                if _build(so):
                    _LIB = _declare(ctypes.CDLL(str(so)))
            except (OSError, AttributeError):
                _LIB = None
        _TRIED = True
        return _LIB


def available() -> bool:
    return lib() is not None


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


# --------------------------------------------------------------------------
# NumPy-facing wrappers (contiguous float64/int64 in, float64 out)
# --------------------------------------------------------------------------


def cheaptrick(x, f0_safe, centers, fs: int, fft_size: int, q1: float,
               noise_calibration: float) -> np.ndarray:
    L = lib()
    assert L is not None
    x = np.ascontiguousarray(x, np.float64)
    f0_safe = np.ascontiguousarray(f0_safe, np.float64)
    centers = np.ascontiguousarray(centers, np.int64)
    T = len(f0_safe)
    env = np.empty((T, fft_size // 2 + 1), np.float64)
    L.esvs_cheaptrick(
        _ptr(x, _c_double_p), len(x),
        _ptr(f0_safe, _c_double_p), _ptr(centers, _c_int64_p), T,
        fs, fft_size, q1, noise_calibration,
        _ptr(env, _c_double_p),
    )
    return env


def nccf(x, centers, fs: int, f0_floor: float, f0_ceil: float, K: int):
    L = lib()
    assert L is not None
    x = np.ascontiguousarray(x, np.float64)
    centers = np.ascontiguousarray(centers, np.int64)
    T = len(centers)
    f0_cand = np.empty((T, K), np.float64)
    score = np.empty((T, K), np.float64)
    energy = np.empty((T,), np.float64)
    L.esvs_nccf(
        _ptr(x, _c_double_p), len(x),
        _ptr(centers, _c_int64_p), T, fs, f0_floor, f0_ceil, K,
        _ptr(f0_cand, _c_double_p), _ptr(score, _c_double_p),
        _ptr(energy, _c_double_p),
    )
    return f0_cand, score, energy


def refine_if(x, est, centers, fs: int, periods: float, n_harm: int,
              iters: int) -> np.ndarray:
    L = lib()
    assert L is not None
    x = np.ascontiguousarray(x, np.float64)
    est = np.array(est, np.float64)  # copied: kernel refines in place
    centers = np.ascontiguousarray(centers, np.int64)
    L.esvs_refine_if(
        _ptr(x, _c_double_p), len(x),
        _ptr(est, _c_double_p), _ptr(centers, _c_int64_p), len(est),
        fs, periods, n_harm, iters,
    )
    return est


def d4c_coarse(x, period, centers, fs: int, fft_size: int, L_long: int,
               freq_interval: float, n_bands: int) -> np.ndarray:
    L = lib()
    assert L is not None
    x = np.ascontiguousarray(x, np.float64)
    period = np.ascontiguousarray(period, np.float64)
    centers = np.ascontiguousarray(centers, np.int64)
    T = len(period)
    coarse = np.empty((T, n_bands), np.float64)
    L.esvs_d4c_coarse(
        _ptr(x, _c_double_p), len(x),
        _ptr(period, _c_double_p), _ptr(centers, _c_int64_p), T,
        fft_size, L_long, fs, freq_interval, n_bands,
        _ptr(coarse, _c_double_p),
    )
    return coarse


def periodicity(x, f0_safe, centers, fs: int, max_lag: int) -> np.ndarray:
    L = lib()
    assert L is not None
    x = np.ascontiguousarray(x, np.float64)
    f0_safe = np.ascontiguousarray(f0_safe, np.float64)
    centers = np.ascontiguousarray(centers, np.int64)
    T = len(f0_safe)
    out = np.empty((T,), np.float64)
    L.esvs_periodicity(
        _ptr(x, _c_double_p), len(x),
        _ptr(f0_safe, _c_double_p), _ptr(centers, _c_int64_p), T,
        fs, max_lag, _ptr(out, _c_double_p),
    )
    return out
