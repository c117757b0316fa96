"""ctypes loader for the native RLE ops (rle_native.cpp).

Builds with g++ -O3 on first use (cached as rle_native.so next to the
source); every entry point degrades to the pure-numpy implementation in
eval/rle.py when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rle_native.cpp")
_SO = os.path.join(_HERE, "rle_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        so = _build()
        if so is None:
            _failed = True
            return None
        lib = ctypes.CDLL(so)
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        lib.rle_encode.argtypes = [u8p, ctypes.c_int64, u32p]
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [u32p, ctypes.c_int, u8p]
        lib.rle_area.argtypes = [u32p, ctypes.c_int]
        lib.rle_area.restype = ctypes.c_uint64
        lib.rle_intersection.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int]
        lib.rle_intersection.restype = ctypes.c_uint64
        lib.rle_iou_matrix.argtypes = [u32p, i64p, i32p, ctypes.c_int,
                                       u32p, i64p, i32p, ctypes.c_int,
                                       u8p, f64p]
        lib.rle_merge.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int,
                                  ctypes.c_int, u32p]
        lib.rle_merge.restype = ctypes.c_int
        lib.rle_to_bbox.argtypes = [u32p, ctypes.c_int, ctypes.c_int, f64p]
        _lib = lib
        return _lib
