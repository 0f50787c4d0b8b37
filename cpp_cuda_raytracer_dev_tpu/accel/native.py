"""ctypes binding + on-demand compilation for the native KD builder.

`build_kd_native` is a drop-in replacement for `kd_build.build_kd`
(bit-identical outputs, tests/test_native.py); `build_kd_fast` picks the
native builder when a toolchain is available and falls back to numpy
otherwise. The shared library is compiled once with g++ and cached next to
the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from .kd_build import KDTree, build_kd

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kd_native.cpp")
_LIB = os.path.join(_HERE, "libkdnative.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_compile_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _compile_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _compile_failed:
            return None
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _LIB, _SRC],
                    check=True, capture_output=True, timeout=120)
            except (subprocess.SubprocessError, FileNotFoundError):
                _compile_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.kd_build.restype = ctypes.c_int64
        lib.kd_build.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int64,
            f32p, f32p, i8p, f32p, f32p, i32p, i32p, i32p, i32p, i32p, i64p,
        ]
        _lib = lib
        return lib


def native_available() -> bool:
    return _load() is not None


def build_kd_native(aabb_min: np.ndarray, aabb_max: np.ndarray,
                    min_node_size: int = 1) -> KDTree:
    lib = _load()
    if lib is None:
        raise RuntimeError("native KD builder unavailable (no g++?)")
    amin = np.ascontiguousarray(aabb_min, np.float32)
    amax = np.ascontiguousarray(aabb_max, np.float32)
    n = amin.shape[0]
    cap = 2 * n
    out = dict(
        bounds_min=np.zeros((cap, 3), np.float32),
        bounds_max=np.zeros((cap, 3), np.float32),
        cut_code=np.zeros(cap, np.int8),
        s1=np.zeros(cap, np.float32), s2=np.zeros(cap, np.float32),
        left=np.full(cap, -1, np.int32), right=np.full(cap, -1, np.int32),
        parent=np.zeros(cap, np.int32),
        leaf_start=np.full(cap, -1, np.int32),
        leaf_count=np.zeros(cap, np.int32),
    )
    perm = np.zeros(n, np.int64)
    num = lib.kd_build(amin, amax, n, min_node_size,
                       out["bounds_min"], out["bounds_max"],
                       out["cut_code"], out["s1"], out["s2"], out["left"],
                       out["right"], out["parent"], out["leaf_start"],
                       out["leaf_count"], perm)
    if num <= 0:
        raise RuntimeError(f"kd_build failed: {num}")
    return KDTree(**{k: v[:num] for k, v in out.items()}, perm=perm,
                  min_node_size=min_node_size)


def build_kd_fast(aabb_min: np.ndarray, aabb_max: np.ndarray,
                  min_node_size: int = 1) -> KDTree:
    """Native if possible, numpy otherwise."""
    if native_available():
        return build_kd_native(aabb_min, aabb_max, min_node_size)
    return build_kd(aabb_min, aabb_max, min_node_size)
