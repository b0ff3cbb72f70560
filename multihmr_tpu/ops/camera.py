"""Pinhole camera geometry in pure JAX.

Functional equivalents of reference utils/camera.py:14-91: perspective
(un)projection through intrinsics K, focal-length normalization of inverse
depth (Sec 3.1 of arXiv:1904.02028 as used by the reference), and log-depth
encoding. Everything is shape-polymorphic over leading batch dims and
jit/vmap-safe.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def perspective_projection(x: jax.Array, K: jax.Array) -> jax.Array:
    """Project 3D camera-space points to pixels.

    Reference utils/camera.py:14-27: ``y = K @ (x / z)``, returning the first
    two coordinates.

    Args:
      x: ``(..., N, 3)`` points.
      K: ``(..., 3, 3)`` intrinsics.
    Returns:
      ``(..., N, 2)`` pixel coordinates.
    """
    y = x / x[..., -1:]
    y = jnp.einsum("...ij,...kj->...ki", K, y, precision=jax.lax.Precision.HIGHEST)
    return y[..., :2]


def _inv3x3_intrinsics_general(K: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse (adjugate/determinant).

    Avoids ``jnp.linalg.inv``'s LU path so it fuses into the surrounding
    program and stays exact in fp32 (the reference needed an fp16→fp32
    workaround for ``torch.inverse``, blocks/smpl_layer.py:117-123; here the
    inverse is always computed in fp32).
    """
    K = K.astype(jnp.float32)
    a, b, c = K[..., 0, 0], K[..., 0, 1], K[..., 0, 2]
    d, e, f = K[..., 1, 0], K[..., 1, 1], K[..., 1, 2]
    g, h, i = K[..., 2, 0], K[..., 2, 1], K[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]


def inverse_perspective_projection(
    points: jax.Array, K: jax.Array, distance: jax.Array | None
) -> jax.Array:
    """Un-project pixels to 3D rays/points (reference utils/camera.py:30-48).

    Args:
      points: ``(..., N, 2)`` pixel coordinates.
      K: ``(..., 3, 3)`` intrinsics.
      distance: ``(..., N, 1)`` distance along the ray, or None for unit-z rays.
    Returns:
      ``(..., N, 3)`` 3D points (``K^-1 @ [u, v, 1] * distance``).
    """
    ones = jnp.ones_like(points[..., :1])
    homog = jnp.concatenate([points, ones], axis=-1)
    Kinv = _inv3x3_intrinsics_general(K).astype(points.dtype)
    rays = jnp.einsum(
        "...ij,...kj->...ki", Kinv, homog, precision=jax.lax.Precision.HIGHEST
    )
    if distance is None:
        return rays
    return rays * distance


def get_focal_length_from_fov(fov: float = 60, img_size: int = 512):
    """Focal length for a given full-image field of view in degrees
    (reference utils/camera.py:50-60)."""
    return img_size / (2 * math.tan(math.radians(fov) / 2))


def focal_length_normalization(x, f, fovn: int = 60, img_size: int = 448):
    """``E = (fn/f) * E'`` where E is inverse depth (reference utils/camera.py:62-69)."""
    fn = get_focal_length_from_fov(fov=fovn, img_size=img_size)
    return x * (fn / f)


def undo_focal_length_normalization(y, f, fovn: int = 60, img_size: int = 448):
    """Inverse of :func:`focal_length_normalization` (reference utils/camera.py:71-77)."""
    fn = get_focal_length_from_fov(fov=fovn, img_size=img_size)
    return y * (f / fn)


EPS_LOG = 1e-10


def log_depth(x, eps: float = EPS_LOG):
    """Depth → log space (reference utils/camera.py:80-85)."""
    return jnp.log(x + eps)


def undo_log_depth(y, eps: float = EPS_LOG):
    """Inverse of :func:`log_depth` (reference utils/camera.py:87-91)."""
    return jnp.exp(y) - eps


def intrinsics_from_fov(fov_degrees, img_size: int, batch_shape=()):
    """Build a pinhole K with principal point at the image center, equivalent
    to the demo-time camera setup (reference demo.py:53-68)."""
    focal = get_focal_length_from_fov(fov=fov_degrees, img_size=img_size)
    K = jnp.array(
        [
            [focal, 0.0, img_size / 2.0],
            [0.0, focal, img_size / 2.0],
            [0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )
    return jnp.broadcast_to(K, tuple(batch_shape) + (3, 3))
