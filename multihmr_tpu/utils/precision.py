"""Inference-time parameter precision.

The ViT computes in bf16 (``Dense(dtype=bfloat16)``) but flax stores params
in fp32, so XLA inserts fp32→bf16 converts of every stacked kernel on EVERY
jitted call — ~2.5 ms/forward for ViT-L-896 (profiled: ``convert.21/25/27``
over the scanned qkv/fc1/fc2 stacks, outside the layer loop but inside the
program). Casting the backbone's matmul weights to bf16 ONCE at load time
removes those converts and halves their HBM footprint.

Training keeps fp32 master weights (the Trainer never uses this); numerics:
the reference runs fp16 autocast (reference demo.py:117), so bf16-stored
weights are strictly more precise than the reference's own inference path.

LayerNorm scales/biases stay fp32: they participate in the fp32 normalization
(``LayerNorm(dtype=float32)``) and cost nothing to keep exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FP32_KEEP = ("norm", "norm1", "norm2")  # LayerNorm modules stay fp32


def _cast_tree(tree, path=()):
    if isinstance(tree, dict):
        return {
            k: (tree[k] if k in _FP32_KEEP else _cast_tree(tree[k], path + (k,)))
            for k in tree
        }
    if hasattr(tree, "dtype") and tree.dtype == jnp.float32:
        return tree.astype(jnp.bfloat16)
    return tree


def cast_backbone_bf16(params):
    """Cast the ViT backbone's weights (except LayerNorms) to bf16.

    ``params`` is the full flax variables dict ``{"params": {...}}``; only
    the ``backbone`` subtree is touched — geometry/HPH heads stay fp32 per
    the model's precision policy (models/multihmr.py docstring).
    """
    p = dict(params)
    inner = dict(p["params"])
    if "backbone" in inner:
        inner["backbone"] = _cast_tree(inner["backbone"])
    elif "encoder" in inner and "backbone" in inner["encoder"]:
        # Anny layout: the ViT lives under encoder.backbone
        # (models/multihmr_anny.py AnnyEncoder)
        enc = dict(inner["encoder"])
        enc["backbone"] = _cast_tree(enc["backbone"])
        inner["encoder"] = enc
    p["params"] = inner
    return jax.tree_util.tree_map(lambda x: x, p)  # fresh pytree
