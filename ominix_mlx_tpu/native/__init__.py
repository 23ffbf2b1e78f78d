"""Native (C++) host-runtime components, loaded via ctypes.

Compiled on first use with g++ (no pybind11 in this image — plain C ABI).
Every entry point has a pure-numpy fallback so the framework works without
a toolchain; the native path is the production one (the reference's host
runtime is Rust/C++ throughout).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libominix_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.join(_HERE, "resample.cc")
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     src, "-o", _LIB_PATH],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.resample_sinc.restype = ctypes.c_int64
            lib.resample_sinc.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int]
            lib.pcm16_to_float.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]
            lib.float_to_pcm16.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def resample_sinc(samples: np.ndarray, src_rate: int, dst_rate: int,
                  taps: int = 16) -> np.ndarray:
    """Band-limited (windowed-sinc) resample; falls back to numpy linear."""
    if src_rate == dst_rate:
        return np.asarray(samples, np.float32)
    x = np.ascontiguousarray(samples, np.float32)
    n_out = int(round(len(x) * dst_rate / src_rate))
    lib = _load()
    if lib is None:
        xi = np.arange(n_out) * (src_rate / dst_rate)
        return np.interp(xi, np.arange(len(x)), x).astype(np.float32)
    out = np.empty(n_out, np.float32)
    lib.resample_sinc(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        float(src_rate), float(dst_rate),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out, taps)
    return out


def pcm16_to_float(pcm: np.ndarray) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, np.int16)
    lib = _load()
    if lib is None:
        return pcm.astype(np.float32) / 32768.0
    out = np.empty(len(pcm), np.float32)
    lib.pcm16_to_float(pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                       len(pcm),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def float_to_pcm16(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is None:
        return (np.clip(x, -1, 1) * 32767.0).round().astype(np.int16)
    out = np.empty(len(x), np.int16)
    lib.float_to_pcm16(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       len(x),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return out
