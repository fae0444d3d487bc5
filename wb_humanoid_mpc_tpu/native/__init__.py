"""Native MRT runtime core: ctypes bindings with on-demand compilation.

Builds `mrt_core.cpp` with the system C++ compiler on first import (cached
next to the source); falls back to pure-numpy implementations when no
compiler is available, so the framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mrt_core.cpp")
_SO = os.path.join(_DIR, "_mrt_core.so")

_lib = None


def _build() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return True
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    d = ctypes.POINTER(ctypes.c_double)
    i = ctypes.POINTER(ctypes.c_int)
    lib.mrt_evaluate_policy.argtypes = [d, d, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_double,
                                        ctypes.c_double, ctypes.c_double, d, d]
    lib.mrt_joint_torques.argtypes = [d, d, d, d, d, d, d, ctypes.c_int, d]
    lib.tsbuf_create.restype = ctypes.c_void_p
    lib.tsbuf_create.argtypes = [ctypes.c_int]
    lib.tsbuf_destroy.argtypes = [ctypes.c_void_p]
    lib.tsbuf_write.argtypes = [ctypes.c_void_p, d, ctypes.c_int]
    lib.tsbuf_read.argtypes = [ctypes.c_void_p, d, ctypes.c_int]
    lib.tsbuf_read.restype = ctypes.c_uint64
    lib.mrt_control_tick.argtypes = [
        d, d, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i, ctypes.c_int, d, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, d, d, ctypes.c_int, d]
    _lib = lib
    return lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def available() -> bool:
    return _load() is not None


def evaluate_policy(xs: np.ndarray, us: np.ndarray, t0: float, dt: float,
                    t: float):
    """Native policy interpolation; numpy fallback when unavailable."""
    xs = np.ascontiguousarray(xs, dtype=np.float64)
    us = np.ascontiguousarray(us, dtype=np.float64)
    N, nx = us.shape[0], xs.shape[1]
    nu = us.shape[1]
    lib = _load()
    if lib is None:
        s = np.clip((t - t0) / dt, 0.0, N)
        k = min(int(s), N - 1)
        a = np.clip(s - k, 0.0, 1.0)
        return (1 - a) * xs[k] + a * xs[k + 1], us[k].copy()
    x_out = np.empty(nx)
    u_out = np.empty(nu)
    lib.mrt_evaluate_policy(_dp(xs), _dp(us), N, nx, nu, t0, dt, t,
                            _dp(x_out), _dp(u_out))
    return x_out, u_out


def joint_torques(q_des, qd_des, kp, kd, ff, q, qd):
    arrs = [np.ascontiguousarray(a, dtype=np.float64)
            for a in (q_des, qd_des, kp, kd, ff, q, qd)]
    n = len(arrs[0])
    lib = _load()
    if lib is None:
        return arrs[2] * (arrs[0] - arrs[5]) + arrs[3] * (arrs[1] - arrs[6]) + arrs[4]
    out = np.empty(n)
    lib.mrt_joint_torques(*[_dp(a) for a in arrs], n, _dp(out))
    return out


class ThreadSafeBuffer:
    """Seqlock latest-value exchange (reference `ThreadSafe<T>` /
    `RobotHWInterfaceBase` double buffering) — lock-free writer."""

    def __init__(self, n: int):
        self.n = n
        lib = _load()
        self._lib = lib
        if lib is not None:
            self._h = lib.tsbuf_create(n)
        else:
            self._h = None
            self._data = np.zeros(n)

    def write(self, data: np.ndarray) -> None:
        data = np.ascontiguousarray(data, dtype=np.float64)
        if self._h is not None:
            self._lib.tsbuf_write(self._h, _dp(data), self.n)
        else:
            self._data = data.copy()

    def read(self) -> np.ndarray:
        out = np.empty(self.n)
        if self._h is not None:
            self._lib.tsbuf_read(self._h, _dp(out), self.n)
            return out
        return self._data.copy()

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            try:
                self._lib.tsbuf_destroy(self._h)
            except Exception:
                pass
