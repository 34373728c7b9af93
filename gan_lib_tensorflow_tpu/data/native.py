"""ctypes binding for the native pipeline kernels (native/libganpipe.so).

Auto-builds with ``make`` on first use if the .so is missing; every entry
point has a numpy fallback so the framework stays pure-Python-capable
(``GANTPU_NO_NATIVE=1`` disables the native path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GANTPU_NO_NATIVE"):
        return None
    so = os.path.join(_NATIVE_DIR, "libganpipe.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64, f32p, u8p = ctypes.c_int64, \
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), \
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.gather_normalize_u8.argtypes = [u8p, i64p, i64, i64, f32p]
    lib.box_downsample_f32.argtypes = [f32p, i64, i64, i64, i64, i64, f32p]
    lib.crop_flip_normalize_u8.argtypes = [u8p, i64, i64, i64, i64, i64, i64,
                                           ctypes.c_int, f32p]
    lib.resize_nearest_u8.argtypes = [u8p, i64, i64, i64, i64, i64, u8p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def gather_normalize(store_u8: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """batch = store_u8[idx] / 127.5 - 1 in one fused pass. store: [N,H,W,C]."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None:
        return (store_u8[idx].astype(np.float32) / 127.5) - 1.0
    n = len(idx)
    out = np.empty((n,) + store_u8.shape[1:], np.float32)
    lib.gather_normalize_u8(store_u8, idx, n, int(np.prod(store_u8.shape[1:])), out)
    return out


def box_downsample(x: np.ndarray, factor: int) -> np.ndarray:
    if factor == 1:
        return x
    lib = _load()
    n, h, w, c = x.shape
    if lib is None:
        return x.reshape(n, h // factor, factor, w // factor, factor, c).mean((2, 4))
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty((n, h // factor, w // factor, c), np.float32)
    lib.box_downsample_f32(x, n, h, w, c, factor, out)
    return out


def crop_flip_normalize(img_u8: np.ndarray, oy: int, ox: int, crop: int,
                        flip: bool, out: np.ndarray = None) -> np.ndarray:
    """Fused window crop + horizontal flip + [-1,1] normalize.

    ``out``: optional preallocated [crop, crop, C] float32 C-contiguous
    destination (e.g. a row of a batch buffer) — batch assemblers pass it to
    skip the per-image allocation AND the np.stack copy, which measured 1.6x
    the crop kernel itself on this host."""
    lib = _load()
    if lib is None:
        win = img_u8[oy:oy + crop, ox:ox + crop]
        if flip:
            win = win[:, ::-1]
        res = (win.astype(np.float32) / 127.5) - 1.0
        if out is None:
            return res
        out[...] = res
        return out
    h, w, c = img_u8.shape
    if out is None:
        out = np.empty((crop, crop, c), np.float32)
    assert out.flags.c_contiguous and out.dtype == np.float32
    lib.crop_flip_normalize_u8(np.ascontiguousarray(img_u8), h, w, c,
                               oy, ox, crop, int(flip), out)
    return out


def resize_nearest(img_u8: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        ys = (np.arange(oh) * img_u8.shape[0] // oh)
        xs = (np.arange(ow) * img_u8.shape[1] // ow)
        return img_u8[ys][:, xs]
    h, w, c = img_u8.shape
    out = np.empty((oh, ow, c), np.uint8)
    lib.resize_nearest_u8(np.ascontiguousarray(img_u8), h, w, c, oh, ow, out)
    return out
