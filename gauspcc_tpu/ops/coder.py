"""ctypes bindings for the native chunk-parallel arithmetic coder.

The TPU (XLA) computes probability/CDF tables; this module hands the
normalized uint16 CDF rows to the C++ library (native/ac_coder.cpp) which
performs the serial bit-emit/consume across host threads. This mirrors the
split in the reference (HAC/utils/encodings_cuda.py + arithmetic.zip):
device does math, coder does bits.

The shared library is built on first import if missing (g++, no deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgauspcc_ac.so"))

# Default chunk size: symbols per independent coder chunk. The reference uses
# 10_000 (encodings_cuda.py:6 `chunk_size_cuda`); host cores are far faster
# per-chunk than one CUDA thread, so fewer/larger chunks lower the per-chunk
# framing overhead while still saturating the thread pool.
DEFAULT_CHUNK_SIZE = 65536

_lock = threading.Lock()
_lib = None


def _build_library() -> None:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "ac_coder.cpp"))
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
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "ac_coder.cpp")
        ):
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ac_max_chunk_bytes.restype = ctypes.c_int64
        lib.ac_max_chunk_bytes.argtypes = [ctypes.c_int64]
        lib.ac_encode.restype = ctypes.c_int64
        lib.ac_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ac_decode.restype = ctypes.c_int32
        lib.ac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_int16),
        ]
        lib.ac_dec_create.restype = ctypes.c_void_p
        lib.ac_dec_create.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.ac_dec_next.restype = ctypes.c_int64
        lib.ac_dec_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int32, ctypes.c_int64, ctypes.POINTER(ctypes.c_int16),
        ]
        lib.ac_dec_free.restype = None
        lib.ac_dec_free.argtypes = [ctypes.c_void_p]
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.ac_encode_gauss.restype = ctypes.c_int64
        lib.ac_encode_gauss.argtypes = [
            f32p, f32p, f32p, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ac_decode_gauss.restype = ctypes.c_int32
        lib.ac_decode_gauss.argtypes = [
            f32p, f32p, f32p, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_int16),
        ]
        _lib = lib
        return lib


class IncrementalDecoder:
    """Stateful sequential decoder over a stream produced by
    encode_int16_cdf. Feed CDF rows progressively (autoregressive decode:
    each batch's rows may depend on previously decoded symbols)."""

    def __init__(self, stream: bytes, n_total: int,
                 chunk_size: int = DEFAULT_CHUNK_SIZE):
        self._lib = _load()
        n_chunks = int(np.frombuffer(stream[:4], dtype=np.uint32)[0])
        expect = (n_total + chunk_size - 1) // chunk_size
        if n_total > 0 and n_chunks != expect:
            raise ValueError(f"stream has {n_chunks} chunks, expected {expect}")
        chunk_lens = np.frombuffer(
            stream[4 : 4 + 4 * n_chunks], dtype=np.uint32
        ).astype(np.int64)
        payload = np.frombuffer(stream[4 + 4 * n_chunks :], dtype=np.uint8)
        payload = np.ascontiguousarray(payload)
        self._handle = self._lib.ac_dec_create(
            payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            payload.size,
            chunk_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_chunks, chunk_size, n_total,
        )
        self._remaining = n_total

    def decode(self, cdf_u16: np.ndarray) -> np.ndarray:
        """Decode the next cdf_u16.shape[0] symbols."""
        cdf_u16 = np.ascontiguousarray(cdf_u16, dtype=np.uint16)
        count, lp = cdf_u16.shape
        if count > self._remaining:
            raise ValueError("decoding past end of stream")
        out = np.empty(count, dtype=np.int16)
        rc = self._lib.ac_dec_next(
            self._handle,
            cdf_u16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            lp, count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        )
        if rc != count:
            raise ValueError("incremental decode failed")
        self._remaining -= count
        return out

    def close(self):
        if self._handle:
            self._lib.ac_dec_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _n_threads() -> int:
    return max(1, (os.cpu_count() or 2) - 1)


def encode_int16_cdf(
    cdf_u16: np.ndarray,
    symbols: np.ndarray,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> bytes:
    """Encode `symbols[i]` under the normalized CDF row `cdf_u16[i]`.

    Returns a self-contained byte stream: u32 n_chunks, u32 chunk byte
    lengths, then the concatenated chunk payloads. Empty input encodes to
    the 4-byte header alone.
    """
    lib = _load()
    cdf_u16 = np.ascontiguousarray(cdf_u16, dtype=np.uint16)
    symbols = np.ascontiguousarray(symbols, dtype=np.int16)
    assert cdf_u16.ndim == 2 and symbols.ndim == 1
    n, lp = cdf_u16.shape
    assert symbols.shape[0] == n
    if n == 0:
        return np.uint32(0).tobytes()

    n_chunks = (n + chunk_size - 1) // chunk_size
    stride = lib.ac_max_chunk_bytes(chunk_size)
    out = np.empty(n_chunks * stride, dtype=np.uint8)
    chunk_lens = np.zeros(n_chunks, dtype=np.int64)

    total = lib.ac_encode(
        cdf_u16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n, lp,
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        chunk_size, _n_threads(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        chunk_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if total < 0:
        raise ValueError("ac_encode failed (bad arguments)")

    parts = [np.uint32(n_chunks).tobytes(), chunk_lens.astype(np.uint32).tobytes()]
    for c in range(n_chunks):
        s = c * stride
        parts.append(out[s : s + chunk_lens[c]].tobytes())
    return b"".join(parts)


def _as_mix(mu, sigma, w, n: int):
    """[N] or [N, K] model arrays -> contiguous f32 [N*K] + K."""
    mu = np.ascontiguousarray(mu, dtype=np.float32).reshape(n, -1)
    k = mu.shape[1]
    sigma = np.ascontiguousarray(sigma, dtype=np.float32).reshape(n, k)
    if w is None:
        w = np.ones((n, k), np.float32)
    w = np.ascontiguousarray(w, dtype=np.float32).reshape(n, k)
    return mu, sigma, w, k


def encode_gauss(mu, sigma, symbols, rmin: int, rmax: int, w=None,
                 chunk_size: int = DEFAULT_CHUNK_SIZE) -> bytes:
    """Encode residual symbols under per-element Gaussian(-mixture) models
    evaluated inside the coder (native ac_encode_gauss): mu/sigma are in
    residual units, symbols[i] = residual - rmin in [0, rmax - rmin].
    Same stream framing as encode_int16_cdf."""
    lib = _load()
    symbols = np.ascontiguousarray(symbols, dtype=np.int16)
    n = symbols.shape[0]
    if n == 0:
        return np.uint32(0).tobytes()
    mu, sigma, w, k = _as_mix(mu, sigma, w, n)
    lp = rmax - rmin + 2
    n_chunks = (n + chunk_size - 1) // chunk_size
    stride = lib.ac_max_chunk_bytes(chunk_size)
    out = np.empty(n_chunks * stride, dtype=np.uint8)
    chunk_lens = np.zeros(n_chunks, dtype=np.int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    total = lib.ac_encode_gauss(
        mu.ctypes.data_as(f32p), sigma.ctypes.data_as(f32p),
        w.ctypes.data_as(f32p), k, n, rmin, lp,
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        chunk_size, _n_threads(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        chunk_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if total < 0:
        raise ValueError("ac_encode_gauss failed (bad arguments)")
    parts = [np.uint32(n_chunks).tobytes(),
             chunk_lens.astype(np.uint32).tobytes()]
    for c in range(n_chunks):
        s = c * stride
        parts.append(out[s : s + chunk_lens[c]].tobytes())
    return b"".join(parts)


def decode_gauss(mu, sigma, stream: bytes, rmin: int, rmax: int, w=None,
                 chunk_size: int = DEFAULT_CHUNK_SIZE) -> np.ndarray:
    """Inverse of :func:`encode_gauss`; returns int16 symbols [N]."""
    lib = _load()
    mu_arr = np.asarray(mu)
    n = mu_arr.reshape(mu_arr.shape[0], -1).shape[0] if mu_arr.ndim > 1 \
        else mu_arr.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int16)
    mu, sigma, w, k = _as_mix(mu, sigma, w, n)
    lp = rmax - rmin + 2
    n_chunks = (n + chunk_size - 1) // chunk_size
    n_chunks_stored = int(np.frombuffer(stream[:4], dtype=np.uint32)[0])
    if n_chunks_stored != n_chunks:
        raise ValueError(
            f"stream has {n_chunks_stored} chunks but N={n} implies {n_chunks}")
    chunk_lens = np.frombuffer(
        stream[4 : 4 + 4 * n_chunks], dtype=np.uint32
    ).astype(np.int64)
    payload = np.ascontiguousarray(
        np.frombuffer(stream[4 + 4 * n_chunks :], dtype=np.uint8))
    out_sym = np.empty(n, dtype=np.int16)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.ac_decode_gauss(
        mu.ctypes.data_as(f32p), sigma.ctypes.data_as(f32p),
        w.ctypes.data_as(f32p), k, n, rmin, lp,
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        chunk_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        chunk_size, _n_threads(),
        out_sym.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    if rc != 0:
        raise ValueError("ac_decode_gauss failed (bad arguments)")
    return out_sym


def decode_int16_cdf(
    cdf_u16: np.ndarray,
    stream: bytes,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> np.ndarray:
    """Inverse of :func:`encode_int16_cdf`; returns int16 symbols [N]."""
    lib = _load()
    cdf_u16 = np.ascontiguousarray(cdf_u16, dtype=np.uint16)
    assert cdf_u16.ndim == 2
    n, lp = cdf_u16.shape
    n_chunks_stored = int(np.frombuffer(stream[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.zeros(0, dtype=np.int16)
    n_chunks = (n + chunk_size - 1) // chunk_size
    if n_chunks_stored != n_chunks:
        raise ValueError(
            f"stream has {n_chunks_stored} chunks but N={n}, chunk_size={chunk_size} "
            f"imply {n_chunks}"
        )
    chunk_lens = np.frombuffer(
        stream[4 : 4 + 4 * n_chunks], dtype=np.uint32
    ).astype(np.int64)
    payload = np.frombuffer(stream[4 + 4 * n_chunks :], dtype=np.uint8)
    payload = np.ascontiguousarray(payload)
    out_sym = np.empty(n, dtype=np.int16)
    rc = lib.ac_decode(
        cdf_u16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n, lp,
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        chunk_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        chunk_size, _n_threads(),
        out_sym.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    if rc != 0:
        raise ValueError("ac_decode failed (bad arguments)")
    return out_sym
