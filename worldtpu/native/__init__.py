"""Native runtime helpers, compiled on demand with the system C compiler.

The shared library is built from worldtpu_native.c into
``~/.cache/worldtpu/`` (or $WORLDTPU_CACHE) the first time it is needed and
loaded with ctypes.  Pure-Python fallbacks exist for every entry point, so
the package works without a C toolchain (just slower in parity tests).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

_SRC = pathlib.Path(__file__).with_name("worldtpu_native.c")
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    cache = pathlib.Path(
        os.environ.get("WORLDTPU_CACHE", os.path.expanduser("~/.cache/worldtpu")))
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / "worldtpu_native.so"
    try:
        if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["cc", "-O2", "-ffp-contract=off", "-fPIC", "-shared",
                 str(_SRC), "-o", str(so)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.worldtpu_randn_init.argtypes = [ctypes.c_void_p]
        lib.worldtpu_randn_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.worldtpu_int_trunc_sum.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.worldtpu_int_trunc_sum.restype = ctypes.c_double
        lib.worldtpu_filter_f0.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


class _State(ctypes.Structure):
    _fields_ = [("x", ctypes.c_uint32), ("y", ctypes.c_uint32),
                ("z", ctypes.c_uint32), ("w", ctypes.c_uint32)]


class XorshiftRandn:
    """The reference's stateful randn() stream
    (/root/reference/src/world_matlabfunctions.cpp:243-264), starting from the
    hard-coded seed of a fresh process."""

    def __init__(self):
        self._lib = _build_and_load()
        if self._lib is not None:
            self._st = _State()
            self._lib.worldtpu_randn_init(ctypes.byref(self._st))
        else:
            self._x, self._y, self._z, self._w = (
                123456789, 362436069, 521288629, 88675123)

    def draw(self, n: int):
        import numpy as np
        out = np.empty(n, dtype=np.float64)
        if self._lib is not None:
            self._lib.worldtpu_randn_fill(
                ctypes.byref(self._st),
                out.ctypes.data_as(ctypes.c_void_p), n)
            return out
        m = 0xFFFFFFFF
        x, y, z, w = self._x, self._y, self._z, self._w
        for i in range(n):
            x, y, z = y, z, w
            tmp = 0
            for _ in range(12):
                t = (x ^ (x << 11)) & m
                x, y, z = y, z, w
                w = ((w ^ (w >> 19)) ^ (t ^ (t >> 8))) & m
                tmp = (tmp + (w >> 4)) & m
            out[i] = tmp / 268435456.0 - 6.0
        self._x, self._y, self._z, self._w = x, y, z, w
        return out


def filter_f0(x, b, a):
    """Two time-reversing biquad passes (zero-lag smoothing), exactly the
    arithmetic of contour._filtering_f0's one_pass applied twice.  Returns
    None if the native library is unavailable (caller falls back)."""
    import numpy as np
    lib = _build_and_load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    tmp = np.empty_like(x)
    out = np.empty_like(x)
    lib.worldtpu_filter_f0(
        x.ctypes.data_as(ctypes.c_void_p), x.shape[0],
        tmp.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_double(b[0]), ctypes.c_double(b[1]),
        ctypes.c_double(a[0]), ctypes.c_double(a[1]))
    return out


def int_trunc_sum(x) -> float:
    """Replica of the reference's int-initialized accumulate
    (/root/reference/src/harvest.cpp:239)."""
    import numpy as np
    x = np.ascontiguousarray(x, dtype=np.float64)
    lib = _build_and_load()
    if lib is not None:
        return lib.worldtpu_int_trunc_sum(
            x.ctypes.data_as(ctypes.c_void_p), x.shape[0])
    acc = 0
    for v in x:
        acc = int(acc + v)
    return float(acc)


_CPP_SRC = pathlib.Path(__file__).with_name("corpusio.cpp")
_CPP_LIB = None
_CPP_TRIED = False


def _build_and_load_cpp():
    """The C++ corpus IO library (threaded batched WAV reader)."""
    global _CPP_LIB, _CPP_TRIED
    if _CPP_TRIED:
        return _CPP_LIB
    _CPP_TRIED = True
    cache = pathlib.Path(
        os.environ.get("WORLDTPU_CACHE",
                       os.path.expanduser("~/.cache/worldtpu")))
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / "worldtpu_corpusio.so"
    try:
        if not so.exists() or so.stat().st_mtime < _CPP_SRC.stat().st_mtime:
            subprocess.run(
                ["c++", "-std=c++17", "-O2", "-fPIC", "-shared", "-pthread",
                 str(_CPP_SRC), "-o", str(so)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.worldtpu_load_wavs.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32]
        lib.worldtpu_load_wavs.restype = ctypes.c_int64
        _CPP_LIB = lib
    except Exception:
        _CPP_LIB = None
    return _CPP_LIB


def load_wavs_batch(paths, T, n_threads=8):
    """Read mono PCM wavs into a zero-padded [len(paths), T] float32 batch
    with the threaded C++ loader.  Returns (x, lengths, rates, bits) or
    None if the native library is unavailable (caller falls back to the
    Python reader).  Per-file failures leave lengths[i] == -1."""
    import numpy as np
    lib = _build_and_load_cpp()
    if lib is None:
        return None
    n = len(paths)
    x = np.zeros((n, T), np.float32)
    lengths = np.empty(n, np.int64)
    rates = np.empty(n, np.int32)
    bits = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths])
    lib.worldtpu_load_wavs(
        arr, n, T, x.ctypes.data_as(ctypes.c_void_p),
        lengths.ctypes.data_as(ctypes.c_void_p),
        rates.ctypes.data_as(ctypes.c_void_p),
        bits.ctypes.data_as(ctypes.c_void_p), n_threads)
    return x, lengths, rates, bits
