"""Depth-first space-filling-curve leaf enumeration (cellArray order).

The reference flattens octree leaves depth-first — base cells in i,j,k
order, children recursively in 2x2x2 i,j,k order (writeCell,
/root/reference/equiSources.f90:4044-4079) — for snapshots, restart, and
the standalone converters (readCellArray.f90, convertFormats.f90,
hdf42bin.f90:222-269).

This module wraps the native C++ enumerator (csrc/ftte_native.cpp, built on
first use with g++ and bound via ctypes) with a pure-Python fallback.  The
octree is described by per-level refinement bitmaps: level l is a dense
(nx*2^l, ny*2^l, nz*2^l) uint8 array, nonzero where that cell is refined.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_LIB_FAILED = False


def _build_library() -> ctypes.CDLL | None:
    global _LIB_FAILED
    src = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                       "ftte_native.cpp")
    src = os.path.abspath(src)
    if not os.path.exists(src):
        _LIB_FAILED = True
        return None
    cache = os.path.join(tempfile.gettempdir(),
                         f"ftte_native_{os.getuid()}.so")
    try:
        if (not os.path.exists(cache)
                or os.path.getmtime(cache) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", cache, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(cache)
    except (OSError, subprocess.CalledProcessError):
        _LIB_FAILED = True
        return None

    pp = ctypes.POINTER(ctypes.c_uint8)
    lib.ftte_sfc_count.restype = ctypes.c_int64
    lib.ftte_sfc_count.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int,
                                   ctypes.POINTER(pp)]
    lib.ftte_sfc_enumerate.restype = ctypes.c_int64
    lib.ftte_sfc_enumerate.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(pp), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    return lib


def _get_lib() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is None and not _LIB_FAILED:
        _LIB = _build_library()
    return _LIB


def _bitmap_pointers(refined: list[np.ndarray]):
    ptr_t = ctypes.POINTER(ctypes.c_uint8)
    arr = (ptr_t * max(len(refined), 1))()
    keepalive = []
    for i, r in enumerate(refined):
        r = np.ascontiguousarray(r, np.uint8)
        keepalive.append(r)
        arr[i] = r.ctypes.data_as(ptr_t)
    return arr, keepalive


def enumerate_leaves(nx: int, ny: int, nz: int,
                     refined: list[np.ndarray]) -> dict[str, np.ndarray]:
    """Leaves in cellArray depth-first order.

    Returns dict with 'level' (int64), 'src' (flat index into the leaf's
    level grid), and leaf centers 'x','y','z' in box units.
    """
    lib = _get_lib()
    if lib is not None:
        arr, keep = _bitmap_pointers(refined)
        n = lib.ftte_sfc_count(nx, ny, nz, len(refined), arr)
        level = np.empty(n, np.int64)
        src = np.empty(n, np.int64)
        x = np.empty(n, np.float64)
        y = np.empty(n, np.float64)
        z = np.empty(n, np.float64)
        lib.ftte_sfc_enumerate(
            nx, ny, nz, len(refined), arr,
            level.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            z.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return {"level": level, "src": src, "x": x, "y": y, "z": z}
    return _enumerate_python(nx, ny, nz, refined)


def _enumerate_python(nx: int, ny: int, nz: int,
                      refined: list[np.ndarray]) -> dict[str, np.ndarray]:
    """Pure-Python fallback (same ordering)."""
    out_level, out_src = [], []
    out_x, out_y, out_z = [], [], []

    def is_refined(level, i, j, k):
        if level >= len(refined) or refined[level] is None:
            return False
        return bool(refined[level][i, j, k])

    def visit(level, i, j, k):
        if is_refined(level, i, j, k):
            for di in range(2):
                for dj in range(2):
                    for dk in range(2):
                        visit(level + 1, 2 * i + di, 2 * j + dj, 2 * k + dk)
        else:
            sy, sz = ny << level, nz << level
            out_level.append(level)
            out_src.append((i * sy + j) * sz + k)
            out_x.append((i + 0.5) / (nx << level))
            out_y.append((j + 0.5) / sy)
            out_z.append((k + 0.5) / sz)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    visit(0, i, j, k)
    finally:
        sys.setrecursionlimit(old)
    return {"level": np.array(out_level, np.int64),
            "src": np.array(out_src, np.int64),
            "x": np.array(out_x), "y": np.array(out_y), "z": np.array(out_z)}


def gather_leaves(enum: dict[str, np.ndarray],
                  level_fields: list[np.ndarray]) -> np.ndarray:
    """SFC-ordered leaf values from per-level dense fields
    (writeCell semantics)."""
    out = np.empty(len(enum["level"]), np.float64)
    for lv, field in enumerate(level_fields):
        m = enum["level"] == lv
        out[m] = np.asarray(field, np.float64).reshape(-1)[enum["src"][m]]
    return out


def scatter_leaves(enum: dict[str, np.ndarray], values: np.ndarray,
                   level_shapes: list[tuple[int, int, int]]) -> list[np.ndarray]:
    """Inverse of gather_leaves (readLatestIonization semantics)."""
    fields = [np.zeros(int(np.prod(s))) for s in level_shapes]
    for lv in range(len(level_shapes)):
        m = enum["level"] == lv
        fields[lv][enum["src"][m]] = values[m]
    return [f.reshape(s) for f, s in zip(fields, level_shapes)]
