"""ctypes bindings for the native C++ host runtime (see src/geot_native.cc).

Compile-on-first-use with g++; all entry points fall back to numpy when the
toolchain or the shared library is unavailable, so the package never hard-
depends on the native build. `python -m geot_tpu.native` builds eagerly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "build",
    "sort_by_key",
    "build_plan_arrays",
    "build_bat_tiles",
    "read_mtx",
    "coo_to_csr_host",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "geot_native.cc")
_LIB_PATH = os.path.join(_DIR, "libgeot_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(verbose: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        "-o", _LIB_PATH, _SRC,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        if verbose:
            print(res.stderr)
        return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.geot_sort_by_key.restype = ctypes.c_int
        lib.geot_sort_by_key.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i32p]
        lib.geot_plan_num_tiles.restype = ctypes.c_int64
        lib.geot_plan_num_tiles.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.geot_build_plan.restype = ctypes.c_int
        lib.geot_build_plan.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i32p, i32p, i32p, f32p, i32p,
        ]
        lib.geot_mtx_open.restype = ctypes.c_int64
        lib.geot_mtx_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.geot_mtx_read.restype = ctypes.c_int64
        lib.geot_mtx_read.argtypes = [
            ctypes.c_char_p, i32p, i32p, f32p, ctypes.c_int64,
        ]
        lib.geot_coo_to_csr.restype = ctypes.c_int
        lib.geot_coo_to_csr.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i32p]
        lib.geot_bat_num_tiles.restype = ctypes.c_int64
        lib.geot_bat_num_tiles.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.geot_build_bat_tiles.restype = ctypes.c_int
        lib.geot_build_bat_tiles.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i32p, i32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def sort_by_key(key: np.ndarray, num_keys: int) -> Optional[np.ndarray]:
    """Stable counting-sort permutation by int32 key, or None (fallback)."""
    lib = _load()
    if lib is None:
        return None
    key = np.ascontiguousarray(key, dtype=np.int32)
    perm = np.empty(len(key), dtype=np.int32)
    rc = lib.geot_sort_by_key(_i32p(key), len(key), int(num_keys), _i32p(perm))
    return perm if rc == 0 else None


def build_plan_arrays(
    dst_sorted: np.ndarray,
    src: Optional[np.ndarray],
    num_segments: int,
    e_tile: int,
    s_tile: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Native SegmentPlan slot arrays:
    (src_slots, dst_slots, edge_pos, mask, out_block) or None."""
    lib = _load()
    if lib is None:
        return None
    dst_sorted = np.ascontiguousarray(dst_sorted, dtype=np.int32)
    nnz = len(dst_sorted)
    num_tiles = lib.geot_plan_num_tiles(
        _i32p(dst_sorted), nnz, int(num_segments), int(e_tile), int(s_tile)
    )
    if num_tiles < 0:
        return None
    te = int(num_tiles) * e_tile
    src_c = (
        np.ascontiguousarray(src, dtype=np.int32)
        if src is not None
        else np.zeros(0, np.int32)
    )
    src_slots = np.empty(te, np.int32)
    dst_slots = np.empty(te, np.int32)
    edge_pos = np.empty(te, np.int32)
    mask = np.empty(te, np.float32)
    out_block = np.empty(int(num_tiles), np.int32)
    rc = lib.geot_build_plan(
        _i32p(dst_sorted),
        _i32p(src_c) if src is not None else None,
        nnz,
        int(num_segments),
        int(e_tile),
        int(s_tile),
        _i32p(src_slots),
        _i32p(dst_slots),
        _i32p(edge_pos),
        _f32p(mask),
        _i32p(out_block),
    )
    if rc != 0:
        return None
    shape = (int(num_tiles), e_tile)
    return (
        src_slots.reshape(shape),
        dst_slots.reshape(shape),
        edge_pos.reshape(shape),
        mask.reshape(shape),
        out_block,
    )


def read_mtx(path: str):
    """MatrixMarket COO loader (native; parity with the reference's
    `read_mtx_file`, `csrc/dataloader/dataloader.hpp:66-150`). Returns
    (row, col, val, num_rows, num_cols) or None."""
    lib = _load()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    sym = ctypes.c_int()
    cap = lib.geot_mtx_open(
        path.encode(), ctypes.byref(rows), ctypes.byref(cols), ctypes.byref(sym)
    )
    if cap < 0:
        return None
    row = np.empty(int(cap), np.int32)
    col = np.empty(int(cap), np.int32)
    val = np.empty(int(cap), np.float32)
    n = lib.geot_mtx_read(path.encode(), _i32p(row), _i32p(col), _f32p(val), cap)
    if n < 0:
        return None
    return row[:n], col[:n], val[:n], int(rows.value), int(cols.value)


def build_bat_tiles(
    dst_sorted: np.ndarray,
    num_segments: int,
    e_tile: int,
    s_tile: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native (window, value-block) BAT incidence arrays (ob, vb) incl.
    empty-window coverage tiles, or None (numpy fallback)."""
    lib = _load()
    if lib is None:
        return None
    dst_sorted = np.ascontiguousarray(dst_sorted, dtype=np.int32)
    nnz = len(dst_sorted)
    t = lib.geot_bat_num_tiles(
        _i32p(dst_sorted), nnz, int(num_segments), int(e_tile), int(s_tile)
    )
    if t < 0:
        return None
    ob = np.empty(int(t), np.int32)
    vb = np.empty(int(t), np.int32)
    rc = lib.geot_build_bat_tiles(
        _i32p(dst_sorted), nnz, int(num_segments), int(e_tile), int(s_tile),
        _i32p(ob), _i32p(vb),
    )
    return (ob, vb) if rc == 0 else None


def coo_to_csr_host(dst_sorted: np.ndarray, num_rows: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    dst_sorted = np.ascontiguousarray(dst_sorted, dtype=np.int32)
    out = np.empty(num_rows + 1, np.int32)
    rc = lib.geot_coo_to_csr(_i32p(dst_sorted), len(dst_sorted), num_rows, _i32p(out))
    return out if rc == 0 else None
