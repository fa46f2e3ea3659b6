"""ctypes bridge to the C++ kernel-map builder (csrc/kernel_maps.cpp).

Compiled lazily with g++ into a per-user cache dir (no pybind11 in the
image; plain C ABI + ctypes).  ``lib()`` returns None when no compiler is
available — callers keep the numpy fallback.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc", "kernel_maps.cpp")


def _build() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    cache = os.environ.get("PQ3D_NATIVE_CACHE",
                           os.path.expanduser("~/.cache/pq3d_tpu"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"kernel_maps_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", _SRC, "-o", tmp], check=True,
                       capture_output=True)
        os.replace(tmp, so)
    return so


def lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("PQ3D_DISABLE_NATIVE"):
            return None
        try:
            so = _build()
            L = ctypes.CDLL(so)
            L.pq3d_neighbor_map.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
            L.pq3d_neighbor_map.restype = None
            L.pq3d_downsample.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p]
            L.pq3d_downsample.restype = ctypes.c_int64
            L.pq3d_fps.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p]
            L.pq3d_fps.restype = None
            _LIB = L
        except Exception:
            _LIB = None
    return _LIB
