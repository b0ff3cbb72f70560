"""Fourier features for camera-ray embedding.

Equivalent of reference blocks/camera_embed.py:19-57: encode each patch
center's viewing ray (xyz, unit-z) with linearly spaced frequency bands
[1, max_resolution/2], producing ``[identity(3), sin(pi f x), cos(pi f x)]``
channels. With the defaults (16 bands, 3 dims) that is 99 channels.

No parameters — pure function, computed once per (K, grid) inside jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fourier_channels(n: int = 3, num_bands: int = 16) -> int:
    """Output channel count (reference camera_embed.py:19-29)."""
    return n + 2 * n * num_bands


def fourier_ray_features(
    pos: jax.Array, num_bands: int = 16, max_resolution: int = 64
) -> jax.Array:
    """Fourier-encode positions.

    Matches reference camera_embed.py:39-57 including channel ordering:
    per position the band products are laid out dim-major
    ``[x*f1..x*fB, y*f1..y*fB, z*f1..z*fB]``, then
    ``concat([pos, sin(pi*feat), cos(pi*feat)])``.

    Args:
      pos: ``(..., N, D)`` positions (D=3 rays).
    Returns:
      ``(..., N, D + 2*D*num_bands)`` features.
    """
    d = pos.shape[-1]
    freq_bands = jnp.linspace(1.0, max_resolution / 2.0, num_bands, dtype=pos.dtype)
    # (..., N, D, num_bands) -> (..., N, D*num_bands), dim-major
    feat = pos[..., None] * freq_bands
    feat = feat.reshape(pos.shape[:-1] + (d * num_bands,))
    return jnp.concatenate(
        [pos, jnp.sin(math.pi * feat), jnp.cos(math.pi * feat)], axis=-1
    )
