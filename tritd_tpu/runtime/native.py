"""ctypes bindings for the native runtime kernels, with JAX fallbacks.

`capped_simplex_projection` / `flsa` here are the exact sequential
counterparts of the jit'd operators in :mod:`tritd_tpu.ops.prox` — same
contracts as the reference's MEX kernels (SURVEY §2.4). `available()`
reports whether the native path loaded; every entry point transparently
falls back to JAX when it did not.
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np

from .build import build_library


@functools.cache
def _lib():
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.capped_simplex_projection.argtypes = [dp, ctypes.c_int64, ctypes.c_double, dp]
    lib.capped_simplex_projection.restype = None
    lib.flsa.argtypes = [dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double, dp]
    lib.flsa.restype = None
    lib.soft_threshold.argtypes = [dp, ctypes.c_int64, ctypes.c_double, dp]
    lib.soft_threshold.restype = None
    return lib


def available() -> bool:
    return _lib() is not None


def _as_c(v: np.ndarray):
    return v.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def capped_simplex_projection(v, s: float) -> np.ndarray:
    """Exact projection onto {x : 0 <= x <= 1, sum x = s}."""
    lib = _lib()
    v = np.ascontiguousarray(v, np.float64)
    if lib is None:
        from ..ops.prox import capped_simplex_projection as jx

        return np.asarray(jx(v, s))
    out = np.empty_like(v)
    lib.capped_simplex_projection(_as_c(v), v.size, float(s), _as_c(out))
    return out


def flsa(v, lam1: float, lam2: float) -> np.ndarray:
    """Exact fused-lasso signal approximator (Condat TV + l1 shrink)."""
    lib = _lib()
    v = np.ascontiguousarray(v, np.float64)
    if lib is None:
        from ..ops.prox import flsa as jx

        return np.asarray(jx(v, lam1, lam2, iters=2000))
    out = np.empty_like(v)
    lib.flsa(_as_c(v), v.size, float(lam1), float(lam2), _as_c(out))
    return out


def soft_threshold(v, lam: float) -> np.ndarray:
    lib = _lib()
    v = np.ascontiguousarray(v, np.float64)
    if lib is None:
        return np.sign(v) * np.maximum(np.abs(v) - lam, 0.0)
    out = np.empty_like(v)
    lib.soft_threshold(_as_c(v), v.size, float(lam), _as_c(out))
    return out
