"""ctypes bindings for the native host-preprocessing library.

`native/mlsp_host.cpp` provides C++ equivalents of the reference's
host-side native dependencies (pointnet2_ops FPS, PCL radius search,
PCL NormalEstimation) for the data-loading path and as independent
oracles. Builds on demand with g++ (no pybind11 in the image); every
entry point has a pure-device fallback in `mlsp_tpu.ops`, so the
library is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO = os.path.join(_DIR, "libmlsp_host.so")
_lib = None


def _build() -> bool:
    src = os.path.join(_DIR, "mlsp_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO, src],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.mlsp_scale_to_unit_cube.argtypes = [f32p, ctypes.c_int64]
    lib.mlsp_fps.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_int64, i64p]
    lib.mlsp_radius_count.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                                      ctypes.c_int64, f32p]
    lib.mlsp_estimate_normals.argtypes = [f32p, ctypes.c_int64,
                                          ctypes.c_int64, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _require():
    lib = load()
    if lib is None:
        raise RuntimeError(
            "native library unavailable (g++ build failed or missing); "
            "use the device kernels in mlsp_tpu.ops instead"
        )
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def scale_to_unit_cube(pts: np.ndarray) -> np.ndarray:
    lib = _require()
    out = np.ascontiguousarray(pts, np.float32).copy()
    lib.mlsp_scale_to_unit_cube(_fptr(out), out.shape[0])
    return out


def fps(pts: np.ndarray, npoint: int, start: int = 0) -> np.ndarray:
    lib = _require()
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.zeros(npoint, np.int64)
    lib.mlsp_fps(_fptr(pts), pts.shape[0], npoint, start,
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def radius_count(pts: np.ndarray, radius: float, cap: int = 100) -> np.ndarray:
    lib = _require()
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.zeros(pts.shape[0], np.float32)
    lib.mlsp_radius_count(_fptr(pts), pts.shape[0], radius, cap, _fptr(out))
    return out


def estimate_normals(pts: np.ndarray, k: int = 20) -> np.ndarray:
    lib = _require()
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.zeros_like(pts)
    lib.mlsp_estimate_normals(_fptr(pts), pts.shape[0], k, _fptr(out))
    return out
