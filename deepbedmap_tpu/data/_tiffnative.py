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
