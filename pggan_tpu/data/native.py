"""ctypes binding for the native host-prep library (native/host_prep.cpp).

Loads ``native/build/libpggan_host.so`` if present (``make -C native``); all
entry points have exact numpy fallbacks, so the library is a pure
acceleration of the input pipeline's per-batch hot path (fused
alpha-fade + dynamic-range remap, and the preload pyramid's box
downsample). ``PGGAN_HOST_LIB`` overrides the library path;
``PGGAN_DISABLE_NATIVE=1`` forces the numpy path.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None
_tried = False


def _find_lib():
    env = os.environ.get("PGGAN_HOST_LIB")
    if env:
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(here, "..", "..", "native", "build",
                        "libpggan_host.so")


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("PGGAN_DISABLE_NATIVE") == "1":
        return None
    path = _find_lib()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.box_downsample_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p]
        lib.prep_batch_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_void_p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def box_downsample_u8(img: np.ndarray, factor: int) -> np.ndarray:
    """Block-mean downsample of an HWC uint8 image (native or numpy)."""
    lib = _load()
    h, w, c = img.shape
    if lib is None or img.dtype != np.uint8:
        from pggan_tpu.data.datasets import box_downsample
        return np.uint8(np.clip(np.round(box_downsample(img, factor)), 0, 255))
    img = np.ascontiguousarray(img)
    out = np.empty((h // factor, w // factor, c), np.uint8)
    lib.box_downsample_u8(img.ctypes.data, h, w, c, factor, out.ctypes.data)
    return out


def prep_batch_f32(batch_u8: np.ndarray, alpha: float,
                   range_in=(0, 255), range_out=(-1, 1)) -> np.ndarray:
    """Fused fade + dynamic-range remap of a uint8 NHWC batch -> float32.

    Semantics: reference dataset.py:60-67 (__getitem__): 2x2-box blend at
    ``alpha < 1`` then linear remap ``range_in -> range_out``.
    """
    n, h, w, c = batch_u8.shape
    min_in, max_in = range_in
    min_out, max_out = range_out
    scale = (max_out - min_out) / (max_in - min_in)
    lib = _load()
    if lib is None or batch_u8.dtype != np.uint8:
        from pggan_tpu.data.datasets import _alpha_fade_blend
        x = batch_u8.astype(np.float32)
        if alpha < 1.0:
            x = np.stack([_alpha_fade_blend(v, alpha) for v in x])
        return ((x - min_in) * scale + min_out).astype(np.float32)
    batch_u8 = np.ascontiguousarray(batch_u8)
    out = np.empty((n, h, w, c), np.float32)
    lib.prep_batch_f32(batch_u8.ctypes.data, n, h, w, c,
                       float(alpha), float(min_in), float(scale),
                       float(min_out), out.ctypes.data)
    return out
