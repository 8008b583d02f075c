"""Lazy-compiled native kernels for the sequential EMA-family folds.

The batch EMA/RSI/KAMA recursions (operators/analytics.py) are
irreducibly sequential per series — the only removable cost at scale is
Python bytecode per element. This module compiles ``fold_kernels.c``
(same IEEE expression trees, ``-ffp-contract=off`` so no FMA rewrite)
into a per-source-hash cached ``.so`` and exposes numpy-in/numpy-out
wrappers. Everything is gated: no compiler, failed compile, or failed
self-check → the callers fall back to the Python folds, bit-identical
by construction (the unit tests assert equality on long series).

The cache key is the md5 of the C source, so editing the kernels
invalidates stale builds; compilation goes to a unique temp name then
``os.rename`` (atomic) so concurrent Spark Python workers race safely.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fold_kernels.c")
_LIB = None
_TRIED = False


def _build() -> ctypes.CDLL | None:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.md5(src).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), f"sg_fold_{tag}.so")
    if not os.path.exists(cache):
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=tempfile.gettempdir())
        os.close(fd)
        try:
            subprocess.run(
                ["gcc", "-O2", "-fPIC", "-shared", "-ffp-contract=off",
                 "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=60,
            )
            os.rename(tmp, cache)  # atomic: concurrent workers race safely
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    lib = ctypes.CDLL(cache)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.ema_fold.argtypes = [dp, ctypes.c_long, ctypes.c_long,
                             ctypes.c_double, dp]
    lib.rsi_fold.argtypes = [dp, ctypes.c_long, ctypes.c_long, dp]
    lib.kama_fold.argtypes = [dp, ctypes.c_long, ctypes.c_long, dp, dp]
    for fn in (lib.ema_fold, lib.rsi_fold, lib.kama_fold):
        fn.restype = None
    return lib


def _lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build()
            if _LIB is not None and not _selfcheck(_LIB):
                _LIB = None
        except Exception:
            _LIB = None
    return _LIB


def _selfcheck(lib) -> bool:
    """One fixed fold compared against the Python reference — guards
    against an exotic toolchain producing different rounding (then we
    silently stay on the Python path rather than risk oracle drift)."""
    v = [1.0, 2.5, -3.25, 7.125, 0.3, 11.0, -2.2, 5.05]
    n, k = 3, 2.0 / 4
    e = (v[0] + v[1] + v[2]) / 3.0
    ref = [e]
    for x in v[3:]:
        e = e + k * (x - e)
        ref.append(e)
    arr = np.asarray(v)
    out = np.full(len(v), np.nan)
    lib.ema_fold(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                 len(v), n, k,
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out[2:].tolist() == ref


def _c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ema(v: np.ndarray, n: int, k: float) -> np.ndarray | None:
    """Native EMA fold; None when the native path is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(v, dtype=np.float64)
    out = np.full(len(v), np.nan)
    lib.ema_fold(_c(v), len(v), n, k, _c(out))
    return out


def rsi(v: np.ndarray, n: int) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(v, dtype=np.float64)
    out = np.full(len(v), np.nan)
    lib.rsi_fold(_c(v), len(v), n, _c(out))
    return out


def kama(v: np.ndarray, n: int, sc: np.ndarray) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(v, dtype=np.float64)
    sc = np.ascontiguousarray(sc, dtype=np.float64)
    out = np.full(len(v), np.nan)
    lib.kama_fold(_c(v), len(v), n, _c(sc), _c(out))
    return out
