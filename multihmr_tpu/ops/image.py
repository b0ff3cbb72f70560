"""Image tensor manipulation (normalization and token-grid reshapes).

Equivalents of reference utils/image.py:8-52. The token<->grid reshapes are
pure ``reshape``/``transpose`` so XLA folds them into neighbouring ops (they
compile to layout changes, not copies, on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet statistics (reference utils/image.py:8-9)
IMG_NORM_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMG_NORM_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_rgb(img: jax.Array, imagenet_normalization: bool = True) -> jax.Array:
    """uint8 HWC [0,255] → float32 CHW normalized (reference utils/image.py:12-24)."""
    img = img.astype(jnp.float32) / 255.0
    img = jnp.transpose(img, (2, 0, 1))
    if imagenet_normalization:
        img = (img - IMG_NORM_MEAN.reshape(3, 1, 1)) / IMG_NORM_STD.reshape(3, 1, 1)
    return img


def denormalize_rgb(img, imagenet_normalization: bool = True):
    """float CHW → uint8 HWC (reference utils/image.py:26-37)."""
    img = np.asarray(img)
    if imagenet_normalization:
        img = img * IMG_NORM_STD.reshape(3, 1, 1) + IMG_NORM_MEAN.reshape(3, 1, 1)
    img = np.transpose(img, (1, 2, 0)) * 255.0
    return img.astype(np.uint8)


def unpatch(data: jax.Array, patch_size: int = 14, c: int = 3, img_size: int = 224) -> jax.Array:
    """``[B, N, p*p*c]`` patch tokens → ``[B, c, H, W]`` image
    (reference utils/image.py:39-52). With patch_size=1 this is the
    token-grid reshape used throughout the model."""
    if data.ndim == 2:
        data = jnp.repeat(data[:, :, None], patch_size**2, axis=2)
    B, N, HWC = data.shape
    HW = patch_size**2
    c = HWC // HW
    h = w = int(round(N**0.5))
    p = q = patch_size
    data = data.reshape(B, h, w, p, q, c)
    data = jnp.einsum("nhwpqc->nchpwq", data)
    return data.reshape(B, c, img_size, img_size)


def tokens_to_grid(tokens: jax.Array, grid: int) -> jax.Array:
    """``[B, N, D]`` → ``[B, grid, grid, D]`` (channels-last; the TPU-friendly
    layout this framework uses instead of the reference's NCHW)."""
    B, N, D = tokens.shape
    assert N == grid * grid, (N, grid)
    return tokens.reshape(B, grid, grid, D)


def grid_to_tokens(x: jax.Array) -> jax.Array:
    """``[B, H, W, D]`` → ``[B, H*W, D]``."""
    B, H, W, D = x.shape
    return x.reshape(B, H * W, D)
