"""Host-side image preprocessing.

Equivalent of reference demo.py:27-68: aspect-preserving resize
(``ImageOps.contain``), zero-pad to square (``ImageOps.pad``), ImageNet
normalization, and FOV-based intrinsics. The resize runs on the host (PIL if
available, else a bilinear numpy fallback, else the native C++ preprocessor
when built); normalization runs on device as part of the jit program.

Note on layout: the framework consumes NHWC images (TPU-native), not the
reference's NCHW.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from multihmr_tpu.ops.image import IMG_NORM_MEAN, IMG_NORM_STD
from multihmr_tpu.ops.camera import get_focal_length_from_fov

try:  # PIL is optional
    from PIL import Image, ImageOps

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def contain_size(w: int, h: int, target: int) -> Tuple[int, int]:
    """ImageOps.contain semantics: fit inside (target, target) preserving
    aspect ratio (Python round() = half-to-even, like PIL)."""
    if w >= h:
        nw = target
        nh = max(1, int(round(h * target / w)))
    else:
        nh = target
        nw = max(1, int(round(w * target / h)))
    return nw, nh


def _bicubic_kernel(x: np.ndarray) -> np.ndarray:
    # Catmull-Rom (a = -0.5), PIL's "BICUBIC"
    a = -0.5
    x = np.abs(x)
    return np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


def _resample_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] normalized-weight matrix for PIL's separable resample:
    support widens with the downscale factor (area-average-like when
    shrinking), weights normalized per output pixel."""
    scale = in_size / out_size
    fs = max(scale, 1.0)
    support = 2.0 * fs  # bicubic support = 2
    W = np.zeros((out_size, in_size), np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax)
        w = _bicubic_kernel((xs - center + 0.5) / fs)
        s = w.sum()
        W[xx, xmin:xmax] = w / s if s != 0.0 else w
    return W


def _clip8_round(v: np.ndarray) -> np.ndarray:
    # PIL's fixed-point rounding == floor(v + 0.5), clipped to uint8
    return np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)


def resize_pad_numpy(img: np.ndarray, img_size: int) -> np.ndarray:
    """PIL-convention BICUBIC contain + centered zero-pad, pure numpy
    (HWC uint8). Matches ``ImageOps.contain``'s default resample within
    1/255 per channel (separable convolution with a uint8 intermediate,
    like PIL's two-pass 8-bit path) — keeping the no-PIL fallback
    numerically aligned with the primary path and the native C++ twin."""
    h, w = img.shape[:2]
    nw, nh = contain_size(w, h, img_size)
    # horizontal then vertical, rounding to uint8 between passes like PIL
    tmp = _clip8_round(
        np.einsum("ow,hwc->hoc", _resample_matrix(w, nw), img.astype(np.float64))
    )
    resized = _clip8_round(
        np.einsum("oh,hwc->owc", _resample_matrix(h, nh), tmp.astype(np.float64))
    )
    out = np.zeros((img_size, img_size, img.shape[2]), img.dtype)
    # PIL ImageOps.pad centers with round(diff*0.5) (half-to-even) — NOT
    # floor: for diff ≡ 3 (mod 4) the two differ by one row/column
    oy, ox = round((img_size - nh) * 0.5), round((img_size - nw) * 0.5)
    out[oy : oy + nh, ox : ox + nw] = resized
    return out


def open_image(
    path: str, img_size: int, return_pil: bool = False
):
    """Load → contain-resize → pad → normalized NHWC float32 [1,S,S,3]
    (reference demo.py:27-51). Returns (x, original) where original is the
    unresized image (PIL or array) for visualization."""
    if _HAS_PIL:
        img_pil = Image.open(path).convert("RGB")
        original = img_pil.copy()
        img_pil = ImageOps.contain(img_pil, (img_size, img_size))
        img_pil = ImageOps.pad(img_pil, size=(img_size, img_size))
        arr = np.asarray(img_pil)
    else:  # pragma: no cover
        raw = np.asarray(__import__("imageio").imread(path))
        original = raw
        arr = resize_pad_numpy(raw, img_size)
    x = normalize_nhwc(arr)
    return x[None], (original if return_pil else np.asarray(original))


def normalize_nhwc(img: np.ndarray) -> np.ndarray:
    """uint8 HWC → float32 HWC ImageNet-normalized."""
    x = img.astype(np.float32) / 255.0
    return (x - IMG_NORM_MEAN) / IMG_NORM_STD


class PreprocessedImage(NamedTuple):
    x: np.ndarray  # [S, S, 3] normalized float32
    K: np.ndarray  # [3, 3]
    original: "object"  # unresized PIL image (or array without PIL)
    resized: "object"  # contain+pad PIL image at [S, S]


def preprocess_array(
    img_rgb: np.ndarray, img_size: int, fov: float = 60.0
) -> PreprocessedImage:
    """In-memory twin of :func:`open_image` for serving paths: uint8 HWC RGB
    → :class:`PreprocessedImage`. The single place the
    contain+pad+normalize+K recipe lives for array inputs — cli/app and
    serve/server both call this, so the padding/centering semantics cannot
    drift between the demo and the servers."""
    if not _HAS_PIL:  # pragma: no cover
        arr = resize_pad_numpy(np.asarray(img_rgb), img_size)
        return PreprocessedImage(
            normalize_nhwc(arr), get_camera_parameters(img_size, fov=fov)[0],
            np.asarray(img_rgb), arr,
        )
    pil = Image.fromarray(np.asarray(img_rgb)).convert("RGB")
    resized = ImageOps.pad(
        ImageOps.contain(pil, (img_size, img_size)), size=(img_size, img_size)
    )
    x = normalize_nhwc(np.asarray(resized))
    K = get_camera_parameters(img_size, fov=fov)[0]
    return PreprocessedImage(x, K, pil, resized)


def get_camera_parameters(
    img_size: int,
    fov: float = 60,
    p_x: Optional[float] = None,
    p_y: Optional[float] = None,
) -> np.ndarray:
    """K for the padded square image (reference demo.py:53-68). [1,3,3]."""
    K = np.eye(3, dtype=np.float32)
    focal = get_focal_length_from_fov(fov=fov, img_size=img_size)
    K[0, 0] = K[1, 1] = focal
    if p_x is not None and p_y is not None:
        K[0, 2], K[1, 2] = p_x * img_size, p_y * img_size
    else:
        K[0, 2] = K[1, 2] = img_size // 2
    return K[None]


def rescale_K_to_original(K: np.ndarray, orig_w: int, orig_h: int, img_size: int):
    """Update K for rendering at the original resolution
    (reference demo.py:341-344)."""
    K = K.copy()
    ratio = max(orig_w, orig_h) / img_size
    K[0, 0, 2] = orig_w / 2.0
    K[0, 1, 2] = orig_h / 2.0
    K[0, 0, 0] *= ratio
    K[0, 1, 1] *= ratio
    return K
