"""Device-mesh sharding for Multi-HMR.

The reference is single-GPU (``CUDA_VISIBLE_DEVICES=1 python3.9 train.py``,
reference README.md:203; no torch.distributed anywhere — SURVEY §2.3). This
module is the TPU-native scaling layer that replaces nothing and adds what
the reference never had:

  * **data parallelism** over a ``data`` mesh axis: batched-folder inference
    and training shard the batch; XLA inserts gradient ``psum`` over ICI
    automatically under jit;
  * **tensor parallelism** over a ``model`` axis for ViT-L at high
    resolutions: attention qkv / MLP fc1 shard their output features,
    proj / fc2 shard input features (Megatron-style pairing), so each block
    needs exactly one all-reduce per branch and activations stay sharded
    through the pointwise ops.

Everything is expressed as ``NamedSharding(mesh, PartitionSpec(...))`` on
the parameter pytree + batch inputs; no hand-written collectives. The same
code runs on one chip (trivial mesh) and on a pod slice.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a 2D (data, model) mesh. ``model_parallel=1`` → pure DP."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=tuple(axis_names))


# Megatron-style ViT tensor-parallel rules, matched against flax param paths
# like "backbone/blocks/block/attn/qkv/kernel". The spec is given for the
# trailing (non-stacked) dims; a leading scan/depth axis is padded with None.
_TP_RULES = [
    (re.compile(r"backbone/.*attn/qkv/kernel$"), P(None, "model")),
    (re.compile(r"backbone/.*attn/qkv/bias$"), P("model")),
    (re.compile(r"backbone/.*attn/proj/kernel$"), P("model", None)),
    (re.compile(r"backbone/.*mlp/fc1/kernel$"), P(None, "model")),
    (re.compile(r"backbone/.*mlp/fc1/bias$"), P("model")),
    (re.compile(r"backbone/.*mlp/fc2/kernel$"), P("model", None)),
]


def _spec_for(path: str, leaf) -> P:
    for rule, spec in _TP_RULES:
        if rule.search(path):
            extra = getattr(leaf, "ndim", len(spec)) - len(spec)
            if extra > 0:  # stacked scan axis in front
                return P(*([None] * extra + list(spec)))
            return spec
    return P()  # replicated


def param_shardings(mesh: Mesh, params, fsdp: bool = False,
                    fsdp_min_size: int = 1 << 16):
    """NamedSharding pytree for a MultiHMR param tree (TP on the ViT,
    everything else replicated).

    ``fsdp=True`` additionally shards every large parameter over the
    ``data`` axis (ZeRO/FSDP-style): the largest dimension not already
    TP-sharded and divisible by the data-axis size gets ``"data"``. Under
    jit this is ALL the machinery fully-sharded training needs — XLA's SPMD
    pass all-gathers weights at their use site and reduce-scatters the
    gradients, and because the optimizer state is initialized and updated
    under the same shardings, params + both Adam moments sit sharded at
    rest (per-device memory drops ~data_size-fold for the ViT). Leaves
    smaller than ``fsdp_min_size`` elements stay as the base spec — the
    collectives would cost more than the bytes saved.
    """
    data_size = mesh.shape.get("data", 1)

    def assign(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = _spec_for(path_str, leaf)
        if fsdp and data_size > 1 and getattr(leaf, "size", 0) >= fsdp_min_size:
            dims = list(spec) + [None] * (leaf.ndim - len(spec))
            best = None
            for d in range(leaf.ndim):
                if dims[d] is None and leaf.shape[d] % data_size == 0:
                    if best is None or leaf.shape[d] > leaf.shape[best]:
                        best = d
            if best is not None:
                dims[best] = "data"
                spec = P(*dims)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def constrain_batch(x, mesh: Optional[Mesh]):
    """``with_sharding_constraint`` to batch-on-'data', all other dims
    replicated; no-op without a mesh.

    Used at the ViT→HPH boundary: without it, SPMD propagation can carry the
    ViT's model-axis feature sharding into the head's small [B, K, C]
    tensors, then flip them back to batch sharding via an involuntary full
    rematerialization (replicate + repartition) — a real reshard on
    hardware. Pinning the boundary makes the transition explicit and local.
    """
    if mesh is None:
        return x
    spec = P(*(("data",) + (None,) * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def batch_sharding(mesh: Mesh, pytree=None):
    """Shard the leading batch axis over 'data'."""
    s = NamedSharding(mesh, P("data"))
    if pytree is None:
        return s
    return jax.tree_util.tree_map(lambda _: s, pytree)


def replicated(mesh: Mesh, pytree=None):
    s = NamedSharding(mesh, P())
    if pytree is None:
        return s
    return jax.tree_util.tree_map(lambda _: s, pytree)


def shard_params(mesh: Mesh, params, fsdp: bool = False,
                 fsdp_min_size: int = 1 << 16):
    """Place a parameter pytree onto the mesh with TP/replication layout
    (plus ZeRO/FSDP data-axis sharding of leaves ≥ ``fsdp_min_size``
    elements when ``fsdp``)."""
    return jax.device_put(
        params,
        param_shardings(mesh, params, fsdp=fsdp, fsdp_min_size=fsdp_min_size),
    )


def opt_state_shardings(mesh: Mesh, optimizer, params, psh):
    """Sharding pytree for ``optimizer.init(params)`` matching ``psh`` (the
    params' sharding tree): params-shaped subtrees (Adam mu/nu, momentum,
    …) get the params' shardings, everything else (step counts, empty
    states) is replicated.

    Needed because ``optimizer.init`` builds its state with ``zeros_like``
    — a constant with NO data dependency on the params, so jit's sharding
    propagation has nothing to propagate and the state lands replicated (or
    single-device), silently forfeiting the ZeRO memory win. Use as::

        opt_state = jax.jit(
            optimizer.init,
            out_shardings=opt_state_shardings(mesh, optimizer, params, psh),
        )(params)
    """
    ptreedef = jax.tree_util.tree_structure(params)
    shapes = jax.eval_shape(optimizer.init, params)
    rep = NamedSharding(mesh, P())

    def is_params_shaped(node):
        return jax.tree_util.tree_structure(node) == ptreedef

    return jax.tree_util.tree_map(
        lambda n: psh if is_params_shaped(n)
        else jax.tree_util.tree_map(lambda _: rep, n),
        shapes,
        is_leaf=is_params_shaped,
    )
