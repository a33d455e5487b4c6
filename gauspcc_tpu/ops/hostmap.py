"""ctypes bindings for the native host-side voxel-geometry builder.

The codec's integer set operations — dyadic child expansion and
submanifold-conv neighbor maps over lex-sorted coords — are branchy
pointer-chasing that the TPU runs ~100x slower than a host core (the
on-device binary-search map costs ~2.2 s at 262k voxels; this builder
~20 ms). The device keeps all NN math; these maps are uploaded as plain
int32 gather tables (gauspcc_tpu/ops/sparse.py NeighborMap convention:
idx < 0 means no neighbor). Mirrors torchsparse's host kmap construction
in the reference (GausPcgc/train.py:32-34 kmap_mode="hashmap").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgauspcc_nm.so"))

_lock = threading.Lock()
_lib = None


def _build_library() -> None:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "neighbor.cpp"))
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
            src, "-o", _LIB_PATH, "-lpthread",
        ],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "neighbor.cpp")
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(src):
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.nm_children.restype = ctypes.c_int64
        lib.nm_children.argtypes = [
            i32p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int64, i32p, i32p, i32p,
        ]
        lib.nm_build.restype = ctypes.c_int64
        lib.nm_build.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, i32p,
        ]
        lib.nm_build_packed.restype = ctypes.c_int64
        lib.nm_build_packed.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, i32p, ctypes.POINTER(ctypes.c_uint16),
        ]
        _lib = lib
        return lib


def _n_threads() -> int:
    return max(1, (os.cpu_count() or 2) - 1)


def expand_children(pcoords: np.ndarray, pocc: np.ndarray, ccap: int):
    """Occupied children of lex-sorted parents, lex-sorted, padded to ccap.

    pcoords: int32 [Np, 3] valid parents (not padded); pocc: uint8 [Np].
    Returns (ccoords int32 [ccap, 3], octant int32 [ccap],
    parent_idx int32 [ccap] (-1 pad), n_children).
    """
    lib = _load()
    pcoords = np.ascontiguousarray(pcoords, dtype=np.int32)
    pocc = np.ascontiguousarray(pocc, dtype=np.uint8)
    np_ = pcoords.shape[0]
    ccoords = np.empty((ccap, 3), np.int32)
    octant = np.empty(ccap, np.int32)
    parent_idx = np.empty(ccap, np.int32)
    n = lib.nm_children(
        pcoords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pocc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np_, ccap,
        ccoords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        octant.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        parent_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        raise ValueError(f"child capacity {ccap} overflow for {np_} parents")
    return ccoords, octant, parent_idx, int(n)


def build_map(coords: np.ndarray, n_valid: int, kernel_size: int,
              ncap: int | None = None) -> np.ndarray:
    """Neighbor gather table for a submanifold conv.

    coords: int32 [>=n_valid, 3], valid prefix lex-sorted unique,
    non-negative. Returns idx int32 [K^3, ncap], -1 where no neighbor.
    """
    lib = _load()
    coords = np.ascontiguousarray(coords, dtype=np.int32)
    if ncap is None:
        ncap = coords.shape[0]
    k3 = kernel_size**3
    out = np.empty((k3, ncap), np.int32)
    rc = lib.nm_build(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_valid, ncap, kernel_size, _n_threads(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError("nm_build failed (bad arguments)")
    return out


def build_map_packed(coords: np.ndarray, n_valid: int, kernel_size: int,
                     ncap: int | None = None):
    """Packed window map (lo int32 [K^2, ncap], codes uint16 [K^2, ncap]).

    Per (dz, dy) kernel row: lo = window start into the sorted sources;
    codes hold a 3-bit window slot per x-offset bin (7 = no neighbor), so
    the full tap index is lo + slot. 6 bytes/voxel/row vs 4*K for the
    dense table — sized for the host->device upload, which is the serial
    latency driver of codec decode. kernel_size <= 5.
    """
    lib = _load()
    coords = np.ascontiguousarray(coords, dtype=np.int32)
    if ncap is None:
        ncap = coords.shape[0]
    k2 = kernel_size**2
    lo = np.empty((k2, ncap), np.int32)
    codes = np.empty((k2, ncap), np.uint16)
    rc = lib.nm_build_packed(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_valid, ncap, kernel_size, _n_threads(),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if rc != 0:
        raise ValueError("nm_build_packed failed (bad arguments)")
    return lo, codes
