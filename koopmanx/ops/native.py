"""ctypes bindings to the native C++ components in ``csrc/``.

The shared library is built lazily with g++ on first use and cached next to
the sources. Callers must handle :class:`NativeUnavailable` (no toolchain /
non-CPython environments) — every native component has a pure-Python
fallback elsewhere in the package.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO_ROOT, "csrc")
_LIB_PATH = os.path.join(_CSRC, "libkoopmanx_native.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _sources() -> list:
    return sorted(
        os.path.join(_CSRC, f)
        for f in os.listdir(_CSRC)
        if f.endswith(".cpp")
    )


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        *_sources(),
        "-o",
        _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        srcs = _sources()
        if not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in srcs
        ):
            try:
                _build()
            except (OSError, subprocess.CalledProcessError) as e:
                raise NativeUnavailable(f"could not build native lib: {e}")
        lib = ctypes.CDLL(_LIB_PATH)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.boxqp_solve.restype = ctypes.c_int
        lib.boxqp_solve.argtypes = [ctypes.c_int, dp, dp, dp, dp, dp, ctypes.c_int]
        lib.boxqp_solve_batch.restype = ctypes.c_int
        lib.boxqp_solve_batch.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            dp,
            dp,
            dp,
            dp,
            dp,
            ctypes.c_int,
        ]
        # plant simulator (csrc/plant_sim.cpp)
        lib.koopman_plant_dim.restype = ctypes.c_int
        lib.koopman_plant_dim.argtypes = [ctypes.c_int]
        lib.koopman_plant_step.restype = ctypes.c_int
        lib.koopman_plant_step.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double, dp, dp, dp, dp,
        ]
        lib.koopman_plant_step_batch.restype = ctypes.c_int
        lib.koopman_plant_step_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            dp, ctypes.c_int, dp, dp, dp,
        ]
        lib.koopman_plant_rollout.restype = ctypes.c_int
        lib.koopman_plant_rollout.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            dp, dp, dp, dp,
        ]
        _LIB = lib
        return lib


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def boxqp_solve(
    p: np.ndarray,
    q: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    max_iter: int = 200,
) -> np.ndarray:
    """Exact box-QP solve: min 1/2 x'Px + q'x s.t. lo <= x <= hi.

    Accepts single problems (P (n, n)) or batches (P (B, n, n)); all inputs
    are converted to contiguous float64.
    """
    lib = _load()
    p = np.ascontiguousarray(p, dtype=np.float64)
    q = np.ascontiguousarray(q, dtype=np.float64)
    if p.ndim == 2:
        n = p.shape[0]
        lo_b = np.ascontiguousarray(np.broadcast_to(lo, (n,)), dtype=np.float64)
        hi_b = np.ascontiguousarray(np.broadcast_to(hi, (n,)), dtype=np.float64)
        x = np.zeros(n, dtype=np.float64)
        rc = lib.boxqp_solve(
            n, _as_c(p), _as_c(q), _as_c(lo_b), _as_c(hi_b), _as_c(x), max_iter
        )
        if rc == 2:
            raise RuntimeError("boxqp: singular free block (P not SPD?)")
        return x
    b, n = p.shape[0], p.shape[-1]
    lo_b = np.ascontiguousarray(
        np.broadcast_to(lo, (b, n)), dtype=np.float64
    )
    hi_b = np.ascontiguousarray(
        np.broadcast_to(hi, (b, n)), dtype=np.float64
    )
    x = np.zeros((b, n), dtype=np.float64)
    rc = lib.boxqp_solve_batch(
        b, n, _as_c(p), _as_c(q), _as_c(lo_b), _as_c(hi_b), _as_c(x), max_iter
    )
    if rc == 2:
        raise RuntimeError("boxqp: singular free block (P not SPD?)")
    return x


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False
