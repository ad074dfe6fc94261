"""LZ4 frame compress/decompress via ctypes on the system liblz4.

The reference txt_db records are ``lz4.frame.compress(msgpack)`` blobs
(data/data.py:19,161-169); the python ``lz4`` package is not available here,
but the native library is — this binding is wire-compatible with
lz4.frame so released txt DBs decode unchanged.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for name in ("liblz4.so.1", "liblz4.so", ctypes.util.find_library("lz4")):
        if not name:
            continue
        try:
            _lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if _lib is None:
        raise RuntimeError("liblz4 not found")
    _lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    _lib.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t, ctypes.c_void_p]
    _lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    _lib.LZ4F_compressFrame.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
    ]
    _lib.LZ4F_isError.restype = ctypes.c_uint
    _lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
    _lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    _lib.LZ4F_createDecompressionContext.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint,
    ]
    _lib.LZ4F_freeDecompressionContext.restype = ctypes.c_size_t
    _lib.LZ4F_freeDecompressionContext.argtypes = [ctypes.c_void_p]
    _lib.LZ4F_decompress.restype = ctypes.c_size_t
    _lib.LZ4F_decompress.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_void_p,
    ]
    return _lib


LZ4F_VERSION = 100


def compress(data: bytes) -> bytes:
    lib = _load()
    bound = lib.LZ4F_compressFrameBound(len(data), None)
    out = ctypes.create_string_buffer(bound)
    n = lib.LZ4F_compressFrame(out, bound, data, len(data), None)
    if lib.LZ4F_isError(n):
        raise RuntimeError(f"LZ4F_compressFrame error {n}")
    return out.raw[:n]


def decompress(data: bytes) -> bytes:
    lib = _load()
    ctx = ctypes.c_void_p()
    err = lib.LZ4F_createDecompressionContext(ctypes.byref(ctx), LZ4F_VERSION)
    if lib.LZ4F_isError(err):
        raise RuntimeError("LZ4F context creation failed")
    try:
        chunks = []
        src = ctypes.create_string_buffer(data, len(data))
        src_off = 0
        dst_cap = max(4 * len(data), 1 << 16)
        dst = ctypes.create_string_buffer(dst_cap)
        while src_off < len(data):
            src_size = ctypes.c_size_t(len(data) - src_off)
            dst_size = ctypes.c_size_t(dst_cap)
            rc = lib.LZ4F_decompress(
                ctx,
                dst, ctypes.byref(dst_size),
                ctypes.byref(src, src_off), ctypes.byref(src_size),
                None,
            )
            if lib.LZ4F_isError(rc):
                raise RuntimeError(f"LZ4F_decompress error {rc}")
            chunks.append(dst.raw[: dst_size.value])
            src_off += src_size.value
            if rc == 0:
                break
        return b"".join(chunks)
    finally:
        lib.LZ4F_freeDecompressionContext(ctx)
