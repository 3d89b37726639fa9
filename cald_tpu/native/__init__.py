"""ctypes bindings for the native data-loader core (native/dataloader.cc).

The C calls release the GIL, so the BatchLoader's thread pool gets true
parallel JPEG decode + resize + canvas paste — the cald_tpu counterpart of
torch DataLoader's C++ worker path the reference relies on.

Falls back cleanly: ``available()`` is False when the .so hasn't been built
(``make -C native``), and callers keep using PIL.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libcald_data.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cald_image_size.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_int),
                                        ctypes.POINTER(ctypes.c_int)]
        lib.cald_image_size.restype = ctypes.c_int
        lib.cald_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.cald_decode_resize.restype = ctypes.c_int
        lib.cald_decode.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.c_int, ctypes.c_int]
        lib.cald_decode.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def image_size(path: str) -> tuple[int, int]:
    """(width, height) from the JPEG header only."""
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.cald_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"cald_image_size failed ({rc}) for {path}")
    return w.value, h.value


def decode_resize_into(path: str, canvas: np.ndarray, scale: float) -> tuple[int, int]:
    """Decode `path`, resize by `scale`, paste into the float32 canvas
    (H, W, 3) C-contiguous array. Returns the resized (h, w)."""
    lib = _load()
    assert canvas.dtype == np.float32 and canvas.flags.c_contiguous
    ch, cw = canvas.shape[:2]
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    rc = lib.cald_decode_resize(
        path.encode(), ch, cw, ctypes.c_float(scale),
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(oh), ctypes.byref(ow))
    if rc != 0:
        raise IOError(f"cald_decode_resize failed ({rc}) for {path}")
    return oh.value, ow.value


def decode(path: str) -> np.ndarray:
    """Full decode to (H, W, 3) uint8 RGB."""
    lib = _load()
    w, h = image_size(path)
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.cald_decode(path.encode(),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         w, h)
    if rc != 0:
        raise IOError(f"cald_decode failed ({rc}) for {path}")
    return out
