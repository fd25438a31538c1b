"""Native (C++) runtime components, bound via ctypes.

The shared library is built lazily from the committed source with g++ (no
pybind11 in this image); if the toolchain is unavailable the framework falls
back to the pure-Python implementations transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "slamgraph.cc")
_LIB = os.path.join(_HERE, "libslamgraph.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                "-o", _LIB, _SRC,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.sg_create.restype = ctypes.c_void_p
        lib.sg_destroy.argtypes = [ctypes.c_void_p]
        lib.sg_clear.argtypes = [ctypes.c_void_p]
        lib.sg_add_obs.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.sg_add_obs.restype = ctypes.c_int
        lib.sg_erase_obs.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.sg_erase_obs.restype = ctypes.c_int
        lib.sg_erase_mp.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.sg_erase_kf.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.sg_n_obs_kf.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.sg_n_obs_kf.restype = ctypes.c_int64
        lib.sg_n_obs_mp.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.sg_n_obs_mp.restype = ctypes.c_int64
        lib.sg_covis_counts.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.sg_covis_counts.restype = ctypes.c_int64
        _lib = lib
        return _lib


class ObservationGraph:
    """Native (map-point, keyframe) incidence store with covisibility counts.

    Mirrors MapPoint.observations; KeyFrame.update_connections queries it.
    """

    def __init__(self):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native slamgraph unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.sg_create())

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_h", None)
        if lib is not None and h:
            lib.sg_destroy(h)

    def clear(self) -> None:
        self._lib.sg_clear(self._h)

    def add(self, mp_id: int, kf_id: int) -> bool:
        return bool(self._lib.sg_add_obs(self._h, mp_id, kf_id))

    def erase(self, mp_id: int, kf_id: int) -> bool:
        return bool(self._lib.sg_erase_obs(self._h, mp_id, kf_id))

    def erase_map_point(self, mp_id: int) -> None:
        self._lib.sg_erase_mp(self._h, mp_id)

    def erase_keyframe(self, kf_id: int) -> None:
        self._lib.sg_erase_kf(self._h, kf_id)

    def n_obs_kf(self, kf_id: int) -> int:
        return int(self._lib.sg_n_obs_kf(self._h, kf_id))

    def n_obs_mp(self, mp_id: int) -> int:
        return int(self._lib.sg_n_obs_mp(self._h, mp_id))

    def covis_counts(self, kf_id: int) -> dict[int, int]:
        cap = 256
        while True:
            ids = np.empty(cap, np.int64)
            wts = np.empty(cap, np.int64)
            n = self._lib.sg_covis_counts(
                self._h,
                kf_id,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                wts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                cap,
            )
            if n >= 0:
                return {int(i): int(w) for i, w in zip(ids[:n], wts[:n])}
            cap = -n


def available() -> bool:
    return load_library() is not None
