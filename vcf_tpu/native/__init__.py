"""ctypes bindings for the native entropy runtime (entropy.cpp).

The shared library is built on demand with g++ (see `build()`); every
entry point has a pure-Python fallback in vcf_tpu/entropy, so the
framework degrades gracefully if no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "entropy.cpp")
_LIB_PATH = os.path.join(_DIR, "libvcfentropy.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile entropy.cpp -> libvcfentropy.so. Returns True on success."""
    if (
        not force
        and os.path.exists(_LIB_PATH)
        and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
    ):
        return True
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB_PATH, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.vcf_huf_encode.restype = ctypes.c_int64
        lib.vcf_huf_encode.argtypes = [
            c_u16p, ctypes.c_int64, c_u8p, ctypes.c_int, c_u8p, ctypes.c_int64,
        ]
        lib.vcf_huf_decode.restype = ctypes.c_int64
        lib.vcf_huf_decode.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_int64, c_u8p, ctypes.c_int, c_u16p,
        ]
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        lib.vcf_hist8.restype = None
        lib.vcf_hist8.argtypes = [c_u8p, ctypes.c_int64, c_i64p]
        lib.vcf_huf_encode8.restype = ctypes.c_int64
        lib.vcf_huf_encode8.argtypes = [
            c_u8p, ctypes.c_int64, c_u8p, c_u8p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.vcf_huf_decode8.restype = ctypes.c_int64
        lib.vcf_huf_decode8.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_int64, c_u8p, c_u8p,
        ]
        lib.vcf_rc_encode.restype = ctypes.c_int64
        lib.vcf_rc_encode.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_int, c_u8p, ctypes.c_int64,
        ]
        lib.vcf_rc_decode.restype = ctypes.c_int64
        lib.vcf_rc_decode.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, c_u8p,
        ]
        lib.vcf_cbahc_encode.restype = ctypes.c_int64
        lib.vcf_cbahc_encode.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_int, c_u8p, ctypes.c_int64,
        ]
        lib.vcf_cbahc_decode.restype = ctypes.c_int64
        lib.vcf_cbahc_decode.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, c_u8p,
        ]
        lib.vcf_png_unfilter.restype = ctypes.c_int64
        lib.vcf_png_unfilter.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, c_u8p,
        ]
        lib.vcf_png_filter.restype = ctypes.c_int64
        lib.vcf_png_filter.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, c_u8p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u16p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def hist8(flat: np.ndarray) -> np.ndarray:
    """Multi-threaded 256-bin histogram of a uint8 array."""
    lib = _load()
    assert lib is not None
    syms = np.ascontiguousarray(flat, dtype=np.uint8)
    out = np.zeros(256, dtype=np.int64)
    lib.vcf_hist8(
        _u8p(syms), syms.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    )
    return out


def huffman_encode8(flat: np.ndarray, lengths: np.ndarray, chunk_syms: int) -> bytes:
    """Chunked multi-threaded uint8 Huffman encode (self-framing payload)."""
    lib = _load()
    assert lib is not None
    syms = np.ascontiguousarray(flat, dtype=np.uint8)
    lens = np.ascontiguousarray(lengths, dtype=np.uint8)
    max_len = int(lens.max()) if lens.size else 1
    n_chunks = (syms.size + chunk_syms - 1) // chunk_syms if syms.size else 0
    cap = syms.size * ((max_len + 7) // 8 + 1) + 8 * n_chunks + 64
    out = np.empty(cap, dtype=np.uint8)
    n = lib.vcf_huf_encode8(_u8p(syms), syms.size, _u8p(lens), _u8p(out), cap, chunk_syms)
    if n < 0:
        raise RuntimeError("native huffman encode8 failed")
    return out[:n].tobytes()


def huffman_decode8(payload: bytes, n_symbols: int, lengths: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    lens = np.ascontiguousarray(lengths, dtype=np.uint8)
    src = np.frombuffer(payload, dtype=np.uint8)
    out = np.empty(n_symbols, dtype=np.uint8)
    n = lib.vcf_huf_decode8(_u8p(src), src.size, n_symbols, _u8p(lens), _u8p(out))
    if n != n_symbols:
        raise RuntimeError("native huffman decode8 failed")
    return out


def huffman_encode(flat: np.ndarray, codes: np.ndarray, lengths: np.ndarray) -> bytes:
    """Encode int symbols with canonical codes derived from `lengths`."""
    lib = _load()
    assert lib is not None
    syms = np.ascontiguousarray(flat, dtype=np.uint16)
    lens = np.ascontiguousarray(lengths, dtype=np.uint8)
    # capacity: worst case max_len bits per symbol
    max_len = int(lens.max()) if lens.size else 1
    cap = syms.size * ((max_len + 7) // 8 + 1) + 16
    out = np.empty(cap, dtype=np.uint8)
    n = lib.vcf_huf_encode(
        _u16p(syms), syms.size, _u8p(lens), lens.size, _u8p(out), cap
    )
    if n < 0:
        raise RuntimeError("native huffman encode failed")
    return out[:n].tobytes()


def huffman_decode(payload: bytes, n_symbols: int, lengths: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    lens = np.ascontiguousarray(lengths, dtype=np.uint8)
    src = np.frombuffer(payload, dtype=np.uint8)
    out = np.empty(n_symbols, dtype=np.uint16)
    n = lib.vcf_huf_decode(
        _u8p(src), src.size, n_symbols, _u8p(lens), lens.size, _u16p(out)
    )
    if n != n_symbols:
        raise RuntimeError("native huffman decode failed")
    return out


# ---------------------------------------------------------------------------
# Adaptive range coder (CBAAC)
# ---------------------------------------------------------------------------

def rc_encode(data: np.ndarray, order: int) -> bytes:
    lib = _load()
    assert lib is not None
    syms = np.ascontiguousarray(data, dtype=np.uint8)
    cap = syms.size + (syms.size >> 1) + 1024
    out = np.empty(cap, dtype=np.uint8)
    n = lib.vcf_rc_encode(_u8p(syms), syms.size, order, _u8p(out), cap)
    if n < 0:
        raise RuntimeError("native range-coder encode failed")
    return out[:n].tobytes()


def rc_decode(payload: bytes, n_symbols: int, order: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    src = np.frombuffer(payload, dtype=np.uint8)
    out = np.empty(n_symbols, dtype=np.uint8)
    n = lib.vcf_rc_decode(_u8p(src), src.size, n_symbols, order, _u8p(out))
    if n != n_symbols:
        raise RuntimeError("native range-coder decode failed")
    return out


# ---------------------------------------------------------------------------
# Context-based adaptive Huffman (CBAHC)
# ---------------------------------------------------------------------------

def cbahc_encode(data: np.ndarray, order: int) -> bytes:
    lib = _load()
    assert lib is not None
    syms = np.ascontiguousarray(data, dtype=np.uint8)
    cap = syms.size * 5 + 1024  # adaptive Huffman worst case < 32 bits/sym
    out = np.empty(cap, dtype=np.uint8)
    n = lib.vcf_cbahc_encode(_u8p(syms), syms.size, order, _u8p(out), cap)
    if n < 0:
        raise RuntimeError("native cbahc encode failed")
    return out[:n].tobytes()


def cbahc_decode(payload: bytes, n_symbols: int, order: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    src = np.frombuffer(payload, dtype=np.uint8)
    out = np.empty(n_symbols, dtype=np.uint8)
    n = lib.vcf_cbahc_decode(_u8p(src), src.size, n_symbols, order, _u8p(out))
    if n != n_symbols:
        raise RuntimeError("native cbahc decode failed")
    return out


# ---------------------------------------------------------------------------
# PNG scanline unfiltering
# ---------------------------------------------------------------------------

def png_unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG per-scanline filters 0-4 (sequential hot loop)."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty((h, stride), dtype=np.uint8)
    n = lib.vcf_png_unfilter(_u8p(src), h, stride, bpp, _u8p(out))
    if n != h:
        raise RuntimeError("native png unfilter failed")
    return out


def png_filter(raw: np.ndarray, bpp: int) -> bytes:
    """Adaptive per-row PNG filtering (encode hot loop, r5): one native
    pass computes all five candidate costs, a second writes the winner.
    Byte-identical to the Python _filter_rows."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(raw, dtype=np.uint8)
    h, stride = src.shape
    out = np.empty((h, stride + 1), dtype=np.uint8)
    n = lib.vcf_png_filter(_u8p(src), h, stride, bpp, _u8p(out))
    if n != h:
        raise RuntimeError("native png filter failed")
    return out.tobytes()


# ---------------------------------------------------------------------------
# libdeflate bindings (zlib-format streams, 2-4x faster than the zlib
# module; output remains readable by any standard inflate — the PNG
# container stays cross-readable by cv2/imageio, test_containers.py)
# ---------------------------------------------------------------------------

_DEFLATE_NAMES = ("libdeflate.so.0", "libdeflate.so")
_deflate_lib = None
_deflate_tried = False
_deflate_lock = threading.Lock()


def _load_deflate():
    global _deflate_lib, _deflate_tried
    with _deflate_lock:
        if _deflate_lib is not None or _deflate_tried:
            return _deflate_lib
        _deflate_tried = True
        for name in _DEFLATE_NAMES:
            try:
                lib = ctypes.CDLL(name)
            except OSError:
                continue
            lib.libdeflate_alloc_compressor.restype = ctypes.c_void_p
            lib.libdeflate_alloc_compressor.argtypes = [ctypes.c_int]
            lib.libdeflate_alloc_decompressor.restype = ctypes.c_void_p
            lib.libdeflate_alloc_decompressor.argtypes = []
            lib.libdeflate_zlib_compress.restype = ctypes.c_size_t
            lib.libdeflate_zlib_compress.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t,
            ]
            lib.libdeflate_zlib_compress_bound.restype = ctypes.c_size_t
            lib.libdeflate_zlib_compress_bound.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
            ]
            lib.libdeflate_zlib_decompress.restype = ctypes.c_int
            lib.libdeflate_zlib_decompress.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
            ]
            _deflate_lib = lib
            break
        return _deflate_lib


# libdeflate (de)compressor objects are single-thread use — keep one
# per (thread, level) or the frame-parallel batch path corrupts state
_deflate_tls = threading.local()


def deflate_available() -> bool:
    return _load_deflate() is not None


def zlib_compress(data: bytes, level: int = 6) -> bytes:
    """zlib-format compress via libdeflate (levels 1-12)."""
    lib = _load_deflate()
    assert lib is not None
    level = min(max(level, 1), 12)
    comps = getattr(_deflate_tls, "comps", None)
    if comps is None:
        comps = _deflate_tls.comps = {}
    comp = comps.get(level)
    if comp is None:
        comp = comps[level] = lib.libdeflate_alloc_compressor(level)
    bound = lib.libdeflate_zlib_compress_bound(comp, len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.libdeflate_zlib_compress(comp, data, len(data), out, bound)
    if n == 0:
        raise RuntimeError("libdeflate compress failed")
    return out.raw[:n]


def zlib_decompress(data: bytes, out_size: int) -> bytes:
    """zlib-format decompress via libdeflate (exact output size known)."""
    lib = _load_deflate()
    assert lib is not None
    decomp = getattr(_deflate_tls, "decomp", None)
    if decomp is None:
        decomp = _deflate_tls.decomp = lib.libdeflate_alloc_decompressor()
    out = ctypes.create_string_buffer(out_size)
    actual = ctypes.c_size_t(0)
    rc = lib.libdeflate_zlib_decompress(
        decomp, data, len(data), out, out_size, ctypes.byref(actual))
    if rc != 0:
        raise RuntimeError(f"libdeflate decompress failed rc={rc}")
    return out.raw[: actual.value]
