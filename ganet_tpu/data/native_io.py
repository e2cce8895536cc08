"""ctypes bindings for the native C++ decode core (native/ganet_io.cpp).

Replaces the reference's torch DataLoader worker processes (SURVEY.md §3.1
"hot I/O loop, CPU workers") with an in-process C++ thread pool: PFM/PNG
decode, crop, and normalization happen in native code writing directly
into numpy buffers.

The library is built on first use with g++ (libpng/zlib); if the toolchain
is unavailable the callers fall back to the pure-Python readers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

from ganet_tpu.data.dataset import MEAN, STD

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libganet_io.so"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "ganet_io.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-fPIC", "-std=c++17",
                "-shared", "-o", _LIB_PATH, src, "-lpng", "-lz", "-lpthread",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        cpp = ctypes.POINTER(ctypes.c_char_p)
        lib.ganet_decode_sample.restype = ctypes.c_int
        lib.ganet_decode_sample.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, fp, fp, fp, fp, fp,
        ]
        lib.ganet_decode_batch.restype = ctypes.c_int
        lib.ganet_decode_batch.argtypes = [
            ctypes.c_int, cpp, cpp, cpp, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ip, ip, fp, fp, fp, fp, fp, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _as_fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_sample(
    left_path: str,
    right_path: str,
    disp_path: str,
    disp_is_pfm: bool,
    crop_h: int,
    crop_w: int,
    crop_y: int,
    crop_x: int,
):
    """Decode one sample; crop_y = -1 selects test-mode padding.

    Returns dict(left, right, disparity) of float32 arrays, or raises."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native io library unavailable")
    left = np.empty((crop_h, crop_w, 3), np.float32)
    right = np.empty((crop_h, crop_w, 3), np.float32)
    disp = np.empty((crop_h, crop_w), np.float32)
    mean = np.ascontiguousarray(MEAN)
    std = np.ascontiguousarray(STD)
    rc = lib.ganet_decode_sample(
        left_path.encode(), right_path.encode(), disp_path.encode(),
        int(disp_is_pfm), crop_h, crop_w, crop_y, crop_x,
        _as_fp(mean), _as_fp(std), _as_fp(left), _as_fp(right), _as_fp(disp),
    )
    if rc != 0:
        raise IOError(f"native decode failed (code {rc}) for {left_path}")
    return {"left": left, "right": right, "disparity": disp}


def decode_batch(
    lefts: Sequence[str],
    rights: Sequence[str],
    disps: Sequence[str],
    disp_is_pfm: bool,
    crop_h: int,
    crop_w: int,
    crop_ys: Sequence[int],
    crop_xs: Sequence[int],
    num_threads: int = 0,
):
    """Decode a batch on the native thread pool.

    Returns dict(left (N,h,w,3), right, disparity (N,h,w))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native io library unavailable")
    n = len(lefts)
    left = np.empty((n, crop_h, crop_w, 3), np.float32)
    right = np.empty((n, crop_h, crop_w, 3), np.float32)
    disp = np.empty((n, crop_h, crop_w), np.float32)
    enc = lambda seq: (ctypes.c_char_p * n)(*[s.encode() for s in seq])
    ys = np.asarray(crop_ys, np.int32)
    xs = np.asarray(crop_xs, np.int32)
    mean = np.ascontiguousarray(MEAN)
    std = np.ascontiguousarray(STD)
    threads = num_threads or min(n, os.cpu_count() or 1)
    rc = lib.ganet_decode_batch(
        n, enc(lefts), enc(rights), enc(disps), int(disp_is_pfm),
        crop_h, crop_w,
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _as_fp(mean), _as_fp(std), _as_fp(left), _as_fp(right), _as_fp(disp),
        threads,
    )
    if rc != 0:
        raise IOError(f"native batch decode failed (code {rc})")
    return {"left": left, "right": right, "disparity": disp}
