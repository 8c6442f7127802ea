"""ctypes bindings for the native pitch extractors (pitch.cpp).

The shared library is built on first use with g++ (cached next to the
source). A pure-numpy autocorrelation fallback keeps the pipeline functional
on hosts without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pitch.cpp")
_LIB = os.path.join(_DIR, "libkantts_pitch.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            try:
                subprocess.check_call([
                    "g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB,
                ])
            except Exception as e:  # pragma: no cover
                logging.warning("native pitch build failed (%s); "
                                "using numpy fallback", e)
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        for fn in (lib.rapt_pitch, lib.yin_pitch):
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
        _lib = lib
        return _lib


def _call(fn_name: str, x: np.ndarray, sr: int, hop: int,
          min_f0: float, max_f0: float) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    max_frames = len(x) // hop + 1
    out = np.zeros(max_frames, dtype=np.float32)
    if lib is None:
        return _numpy_autocorr_pitch(x, sr, hop, min_f0, max_f0)
    fn = getattr(lib, fn_name)
    n = fn(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr, hop,
        min_f0, max_f0, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames,
    )
    return out[:n]


def rapt(x: np.ndarray, fs: int, hopsize: int, min: float = 40.0,
         max: float = 800.0) -> np.ndarray:
    """RAPT-style NCCF+Viterbi tracker (pysptk.sptk.rapt call contract)."""
    return _call("rapt_pitch", x, fs, hopsize, min, max)


def yin(x: np.ndarray, fs: int, hopsize: int, min: float = 40.0,
        max: float = 800.0) -> np.ndarray:
    """YIN estimator (the ensemble's second independent method)."""
    return _call("yin_pitch", x, fs, hopsize, min, max)


def _numpy_autocorr_pitch(x, sr, hop, min_f0, max_f0):
    """Slow but dependency-free fallback."""
    lag_min = int(sr / max_f0)
    lag_max = int(sr / min_f0)
    wlen = max(2 * lag_min, sr // 100)
    n_frames = len(x) // hop
    out = np.zeros(n_frames, dtype=np.float32)
    for t in range(n_frames):
        start = t * hop
        if start + wlen + lag_max >= len(x):
            break
        seg = x[start : start + wlen + lag_max]
        seg = seg - seg.mean()
        base = seg[:wlen]
        denom0 = np.sqrt((base ** 2).sum() + 1e-12)
        best_c, best_lag = 0.0, 0
        for lag in range(lag_min, lag_max):
            shifted = seg[lag : lag + wlen]
            c = (base * shifted).sum() / (
                denom0 * np.sqrt((shifted ** 2).sum() + 1e-12)
            )
            if c > best_c:
                best_c, best_lag = c, lag
        if best_c > 0.5 and best_lag > 0:
            out[t] = sr / best_lag
    return out
