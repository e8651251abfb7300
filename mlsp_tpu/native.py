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
             "-pthread", "-o", _SO, src],
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
    src = os.path.join(_DIR, "mlsp_host.cpp")
    stale = (os.path.exists(src) and os.path.exists(_SO)
             and os.path.getmtime(src) > os.path.getmtime(_SO))
    if (not os.path.exists(_SO) or stale) and not _build():
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
    ccpp = ctypes.POINTER(ctypes.c_char_p)
    lib.mlsp_npy_sizes.argtypes = [ccpp, ctypes.c_int64, ctypes.c_int32, i64p]
    lib.mlsp_npy_sizes.restype = ctypes.c_int64
    lib.mlsp_load_npy_clouds.argtypes = [
        ccpp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, f32p, i64p]
    lib.mlsp_load_npy_clouds.restype = ctypes.c_int64
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


# ---------------------------------------------------------------------------
# Threaded npy ingest (the native data loader; native/mlsp_host.cpp).
# ---------------------------------------------------------------------------

_ROT_AXIS = {None: -1, "x": 0, "y": 1, "z": 2}


def _path_array(paths: list[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def _raise_ingest(code: int, paths: list[str]) -> None:
    if code == 0:
        return
    # encoding: parse_rc * 1e6 - file_index (native loader error codes)
    rc, i = -((-code) // 1000000), (-code) % 1000000
    raise ValueError(
        f"native npy ingest failed on {paths[i]!r} (code {rc}: "
        "expects little-endian f4/f8, C-order, 2-D [P, D>=3] .npy)")


def npy_sizes(paths: list[str], n_threads: int = 0) -> np.ndarray:
    """Row counts of many .npy files (parallel header-only reads)."""
    lib = _require()
    out = np.zeros(len(paths), np.int64)
    nt = n_threads or min(16, os.cpu_count() or 1)
    _raise_ingest(
        int(lib.mlsp_npy_sizes(
            _path_array(paths), len(paths), nt,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))),
        paths)
    return out


def load_npy_clouds(
    paths: list[str],
    pad_points: int,
    unit_cube: bool = True,
    rotate_axis: str | None = None,
    rotate_angle: float = 0.0,
    rotate_mask: np.ndarray | None = None,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch ingest of pre-bucketed .npy clouds.

    Each file is parsed, xyz-decoded to f32, unit-cube normalised,
    alignment-rotated (where `rotate_mask` is set), and repeat-padded to
    `pad_points` rows — the exact per-cloud pipeline of
    `data/pipeline.py::standardize_clouds`, executed by a C++ thread
    pool. Files must have <= pad_points rows (bucket first with
    :func:`npy_sizes`). Returns (clouds [n, pad_points, 3] f32,
    original row counts [n] int64).
    """
    lib = _require()
    out = np.empty((len(paths), pad_points, 3), np.float32)
    npts = np.zeros(len(paths), np.int64)
    mask = None
    if rotate_mask is not None:
        mask = np.ascontiguousarray(rotate_mask, np.uint8)
        mask = mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    nt = n_threads or min(16, os.cpu_count() or 1)
    _raise_ingest(
        int(lib.mlsp_load_npy_clouds(
            _path_array(paths), len(paths), pad_points, int(unit_cube),
            _ROT_AXIS[rotate_axis], float(rotate_angle), mask, nt,
            _fptr(out),
            npts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))),
        paths)
    return out, npts
