"""ctypes bindings for the native (C++) preprocessing/data-loading library.

The reference's host pipeline is Python/PIL (reference demo.py:27-51,
datasets/bedlam.py:192-236); here the decode→resize→pad→normalize path and a
prefetching worker-pool batch loader run natively (native/multihmr_native.cpp)
so the TPU stays fed. Falls back to the PIL/numpy path transparently when the
library has not been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libmultihmr_native.so",
)
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise FileNotFoundError(
            f"{_LIB_PATH} not built — run native/build.sh"
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mh_preprocess_file.restype = ctypes.c_int
    lib.mh_preprocess_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mh_preprocess_pixels.restype = ctypes.c_int
    lib.mh_preprocess_pixels.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.mh_decode_file.restype = ctypes.c_int
    lib.mh_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.mh_loader_create.restype = ctypes.c_void_p
    lib.mh_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.mh_loader_next.restype = ctypes.c_int
    lib.mh_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.mh_loader_total.restype = ctypes.c_int
    lib.mh_loader_total.argtypes = [ctypes.c_void_p]
    lib.mh_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.mh_rasterize.restype = None
    lib.mh_rasterize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def rasterize(
    verts: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    width: int,
    height: int,
    color=(0.65, 0.74, 0.86),
    rgb: Optional[np.ndarray] = None,
    depth: Optional[np.ndarray] = None,
):
    """Native z-buffer rasterization. Returns (rgb [H,W,3] f32, depth [H,W])."""
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    Kf = np.ascontiguousarray(K, np.float32).reshape(9)
    if rgb is None:
        rgb = np.zeros((height, width, 3), np.float32)
    if depth is None:
        depth = np.full((height, width), np.inf, np.float32)
    lib.mh_rasterize(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
        Kf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), width, height,
        float(color[0]), float(color[1]), float(color[2]),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return rgb, depth


def native_available() -> bool:
    try:
        _load()
        return True
    except (FileNotFoundError, OSError):
        return False


def preprocess_file(path: str, img_size: int, imagenet_norm: bool = True) -> np.ndarray:
    """Decode + contain + pad + normalize → float32 [S, S, 3] (NHWC body)."""
    lib = _load()
    out = np.empty((img_size, img_size, 3), np.float32)
    ok = lib.mh_preprocess_file(
        path.encode(), img_size, int(imagenet_norm),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if not ok:
        raise IOError(f"native decode failed for {path}")
    return out


def decode_file(path: str) -> np.ndarray:
    """Decode an image to RGB u8 [H, W, 3]."""
    lib = _load()
    h, w = ctypes.c_int(), ctypes.c_int()
    if not lib.mh_decode_file(path.encode(), ctypes.byref(h), ctypes.byref(w), None, 0):
        raise IOError(f"native decode failed for {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    if not lib.mh_decode_file(
        path.encode(), ctypes.byref(h), ctypes.byref(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes,
    ):
        raise IOError(f"native decode failed for {path}")
    return out


class NativeImageLoader:
    """Prefetching multi-threaded image loader.

    Yields (index, preprocessed [S, S, 3] float32) in completion order.
    Decode failures yield index < 0 (``-(i+1)``) with a zero tensor.
    """

    EXHAUSTED = -(1 << 30)

    def __init__(
        self,
        paths: Sequence[str],
        img_size: int,
        n_threads: int = 0,
        imagenet_norm: bool = True,
        max_queue: int = 8,
    ):
        self._lib = _load()
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self.img_size = img_size
        self._handle = self._lib.mh_loader_create(
            arr, len(self._paths), img_size, n_threads, int(imagenet_norm), max_queue
        )
        self._closed = False

    def __iter__(self):
        out = np.empty((self.img_size, self.img_size, 3), np.float32)
        while True:
            idx = self._lib.mh_loader_next(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if idx == self.EXHAUSTED:
                return
            yield idx, out.copy()

    def __len__(self):
        return self._lib.mh_loader_total(self._handle)

    def close(self):
        if not self._closed:
            self._lib.mh_loader_destroy(self._handle)
            self._closed = True

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
