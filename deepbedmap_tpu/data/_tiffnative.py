"""ctypes bindings for the native TIFF codec (native/tiffcodec.cc).

Auto-builds the shared object with g++ on first import when missing (quietly
falling back to the pure-Python codec in ``geotiff`` if no toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libtiffcodec.so")
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native", "tiffcodec.cc")


def _ensure_built() -> str:
    if os.path.exists(_SO) and (
        not os.path.exists(_SRC)
        or os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return _SO
    subprocess.run(
        [
            "g++",
            "-O2",
            "-shared",
            "-fPIC",
            "-std=c++17",
            _SRC,
            "-o",
            _SO,
        ],
        check=True,
        capture_output=True,
    )
    return _SO


_lib = ctypes.CDLL(_ensure_built())
_lib.tiff_lzw_encode.restype = ctypes.c_longlong
_lib.tiff_lzw_encode.argtypes = [
    ctypes.c_char_p,
    ctypes.c_longlong,
    ctypes.c_char_p,
    ctypes.c_longlong,
]
_lib.tiff_lzw_decode.restype = ctypes.c_longlong
_lib.tiff_lzw_decode.argtypes = [
    ctypes.c_char_p,
    ctypes.c_longlong,
    ctypes.c_char_p,
    ctypes.c_longlong,
]


_lib.tiff_lzw_encode_blocks.restype = ctypes.c_longlong
_lib.tiff_lzw_encode_blocks.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_longlong),
    ctypes.c_int,
    ctypes.c_char_p,
    ctypes.c_longlong,
    ctypes.POINTER(ctypes.c_longlong),
    ctypes.c_int,
]


def lzw_encode_blocks(blocks, n_threads: int = 0):
    """Compress independent TIFF blocks in parallel (0 = hw threads)."""
    if not blocks:
        return []
    n = len(blocks)
    offsets = (ctypes.c_longlong * (n + 1))()
    total = 0
    for i, b in enumerate(blocks):
        offsets[i] = total
        total += len(b)
    offsets[n] = total
    concat = b"".join(blocks)
    stride = max(len(b) for b in blocks)
    stride = stride + (stride >> 1) + 1024
    out = ctypes.create_string_buffer(stride * n)
    lens = (ctypes.c_longlong * n)()
    rc = _lib.tiff_lzw_encode_blocks(
        concat, offsets, n, out, stride, lens, n_threads
    )
    if rc != 0:  # a block overflowed its stride (incompressible): fall back
        return [lzw_encode(b) for b in blocks]
    raw = out.raw
    return [raw[i * stride : i * stride + lens[i]] for i in range(n)]


def lzw_encode(data: bytes) -> bytes:
    cap = len(data) + (len(data) >> 1) + 1024
    while True:
        out = ctypes.create_string_buffer(cap)
        n = _lib.tiff_lzw_encode(data, len(data), out, cap)
        if n >= 0:
            return out.raw[:n]
        cap *= 2


def lzw_decode(data: bytes) -> bytes:
    cap = max(4 * len(data), 4096)
    while True:
        out = ctypes.create_string_buffer(cap)
        n = _lib.tiff_lzw_decode(data, len(data), out, cap)
        if n == -2:
            raise ValueError("malformed LZW stream")
        if n >= 0:
            return out.raw[:n]
        cap *= 2


_lib.tiff_lzw_decode_blocks.restype = ctypes.c_longlong
_lib.tiff_lzw_decode_blocks.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_longlong),
    ctypes.c_int,
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_longlong),
    ctypes.POINTER(ctypes.c_longlong),
    ctypes.c_int,
]


def lzw_decode_blocks(blocks, out_sizes, n_threads: int = 0) -> bytes:
    """Decompress independent TIFF blocks in parallel into one contiguous
    buffer; ``out_sizes[i]`` is block i's exact decoded byte count (known from
    the strip/tile geometry). Returns the concatenated decoded bytes."""
    if not blocks:
        return b""
    n = len(blocks)
    in_offsets = (ctypes.c_longlong * (n + 1))()
    total_in = 0
    for i, b in enumerate(blocks):
        in_offsets[i] = total_in
        total_in += len(b)
    in_offsets[n] = total_in
    concat = b"".join(blocks)

    out_offsets = (ctypes.c_longlong * (n + 1))()
    total_out = 0
    for i, s in enumerate(out_sizes):
        out_offsets[i] = total_out
        total_out += int(s)
    out_offsets[n] = total_out

    out = ctypes.create_string_buffer(total_out)
    lens = (ctypes.c_longlong * n)()
    rc = _lib.tiff_lzw_decode_blocks(
        concat, in_offsets, n, out, out_offsets, lens, n_threads
    )
    if rc != 0:
        bad = [i for i in range(n) if lens[i] < 0]
        raise ValueError(f"LZW block decode failed for blocks {bad[:5]}")
    return out.raw
