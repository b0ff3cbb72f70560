"""Static-shape person detection.

The reference detects people with a clamped sigmoid heatmap, CenterNet-style
max-pool NMS, and ``torch.where(scores >= thresh)`` (reference
model.py:612-643,133-158) — producing a *data-dependent* number of detections
that then drives ragged gathers and re-batching (utils/tensor_manip.py).

On TPU everything under jit must have static shapes, so this module
re-designs detection as **fixed-capacity top-K with a validity mask**:

  * the heatmap math (clamped sigmoid + max-pool NMS) is numerically
    identical to the reference;
  * instead of `where`, we take the top ``max_people`` scores per image and
    mark entries below the threshold invalid;
  * valid detections are re-ordered to the reference's row-major
    (row, col) traversal order so downstream outputs align 1:1 with the
    reference's person list;
  * all downstream gathers become ``take_along_axis`` over ``[B, K]``
    index tensors, and the reference's ragged ``rebatch``/``pad_to_max``
    machinery (utils/tensor_manip.py:7-45) disappears entirely — the
    batch is *already* ``[B, K]`` padded with masks.

This is exactly one XLA program for any number of people up to the capacity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def clamped_sigmoid(x: jax.Array) -> jax.Array:
    """Sigmoid clamped to [1e-4, 1 - 1e-4] (reference model.py:641-643)."""
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1.0 - 1e-4)


def nms_maxpool(heat: jax.Array, kernel: int = 3) -> jax.Array:
    """CenterNet max-pool NMS (reference model.py:620-638).

    ``heat`` is ``[B, H, W]``. Keeps scores equal to their local max in a
    ``kernel x kernel`` window (stride 1, torch max_pool2d padding semantics:
    -inf padding; even kernels use the reference's enlarged padding and crop).
    """
    if kernel <= 1:
        return heat
    pad = (kernel - 1) // 2 if kernel not in (2, 4) else (1 if kernel == 2 else 2)
    neg_inf = jnp.array(-jnp.inf, heat.dtype)
    hmax = jax.lax.reduce_window(
        heat,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel),
        window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad)),
    )
    # Even kernels over-produce; the reference crops back to the input size.
    hmax = hmax[:, : heat.shape[1], : heat.shape[2]]
    keep = (hmax == heat).astype(heat.dtype)
    return heat * keep


class Detections(NamedTuple):
    """Fixed-capacity detection set for a batch.

    All arrays have leading shape ``[B, K]`` (K = capacity). Invalid slots
    have ``valid == 0`` and point at cell (0, 0) with score 0; every consumer
    must (and does) mask with ``valid``.
    """

    rows: jax.Array  # [B, K] int32 patch row
    cols: jax.Array  # [B, K] int32 patch col
    scores: jax.Array  # [B, K] detection score in [0, 1]
    valid: jax.Array  # [B, K] float32 {0., 1.}

    @property
    def count(self) -> jax.Array:  # [B] number of valid detections
        return jnp.sum(self.valid, axis=-1).astype(jnp.int32)


def topk_detect(
    scores: jax.Array, det_thresh: float, max_people: int
) -> Detections:
    """Select up to ``max_people`` detections per image from ``[B, H, W]`` scores.

    Equivalent (up to capacity) of ``torch.where(scores >= det_thresh)``
    (reference model.py:612-617) but with static output shapes. Valid
    detections are ordered row-major (the order `where` yields), invalid
    slots are pushed to the end.
    """
    B, H, W = scores.shape
    flat = scores.reshape(B, H * W)
    k = min(max_people, H * W)
    top_scores, top_idx = jax.lax.top_k(flat, k)  # [B, k] score-descending
    valid = (top_scores >= det_thresh).astype(jnp.float32)
    # Re-order to row-major (flat index ascending), invalid slots last.
    order_key = jnp.where(valid > 0, top_idx, H * W + jnp.arange(k)[None, :])
    order = jnp.argsort(order_key, axis=-1)
    top_idx = jnp.take_along_axis(top_idx, order, axis=-1)
    top_scores = jnp.take_along_axis(top_scores, order, axis=-1)
    valid = jnp.take_along_axis(valid, order, axis=-1)
    rows = (top_idx // W).astype(jnp.int32) * valid.astype(jnp.int32)
    cols = (top_idx % W).astype(jnp.int32) * valid.astype(jnp.int32)
    if k < max_people:
        pad = max_people - k
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
        cols = jnp.pad(cols, ((0, 0), (0, pad)))
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    return Detections(rows=rows, cols=cols, scores=top_scores * valid, valid=valid)


def gather_grid(x: jax.Array, det: Detections) -> jax.Array:
    """Gather per-detection features from a ``[B, H, W, D]`` grid → ``[B, K, D]``.

    Static-shape replacement for the reference's
    ``z[idx[0], idx[3], :, idx[1], idx[2]]`` ragged gather (model.py:255).
    """
    B, H, W, D = x.shape
    flat = x.reshape(B, H * W, D)
    idx = (det.rows * W + det.cols).astype(jnp.int32)  # [B, K]
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return out * det.valid[..., None]


def scatter_add_grid(x: jax.Array, det: Detections, values: jax.Array) -> jax.Array:
    """Add ``values [B, K, D]`` into grid cells at the detected locations.

    Static-shape replacement for the reference's in-place
    ``xx[idx_det_0, :, idx_det[1], idx_det[2]] += values_xy``
    (model.py:515-517). Invalid slots contribute zero (their value is
    masked), so the scatter is always K writes per image regardless of the
    true person count.
    """
    B, H, W, D = x.shape
    flat = x.reshape(B, H * W, D)
    idx = (det.rows * W + det.cols).astype(jnp.int32)
    contrib = values * det.valid[..., None]
    flat = jax.vmap(lambda f, i, c: f.at[i].add(c))(flat, idx, contrib)
    return flat.reshape(B, H, W, D)
