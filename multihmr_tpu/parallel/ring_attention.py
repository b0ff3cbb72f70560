"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference handles its longest sequence (8,464 ViT tokens at 1288²) on a
single GPU with vanilla attention (SURVEY §5 "long-context: absent"). This
module is the TPU-native scaling path beyond one chip: the sequence is
sharded over a mesh axis, each device holds its q/k/v shard, and kv shards
rotate around the ring via ``ppermute`` while every device accumulates its
queries' online softmax — exact attention, N²/P work per device, ICI-only
communication (the shard_map + collective formulation of ring attention;
cf. Liu et al., "Ring Attention with Blockwise Transformers").

Per-step local attention runs through the same Pallas flash kernel used on
one chip, so the single-chip and multi-chip code paths share numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax ≥ 0.9 top-level API; fall back to the experimental path
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from multihmr_tpu.ops.attention import multi_head_attention


def _local_attn_stats(q, k, v, scale):
    """Attention over a kv shard returning (unnormalized_out, row_max,
    row_sumexp) for online combination across shards."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    m = jnp.max(s, axis=-1)  # [B,H,Nq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v).astype(jnp.float32)
    return o, m, l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    scale: float | None = None,
) -> jax.Array:
    """Exact attention with q/k/v sequence-sharded over ``axis``.

    Args:
      q, k, v: ``[B, H, N, D]`` with N divisible by the axis size; arrays may
        be sharded ``P(None, None, axis, None)`` (they will be constrained).
    Returns:
      ``[B, H, N, D]`` attention output, same sharding.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_shards = mesh.shape[axis]
    spec = P(None, None, axis, None)

    def ring_fn(q, k, v):
        # q,k,v: local shards [B, H, N/P, D]
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        o, m, l = _local_attn_stats(q, k, v, scale)

        def step(carry, _):
            o, m, l, k_cur, v_cur = carry
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            o2, m2, l2 = _local_attn_stats(q, k_nxt, v_nxt, scale)
            m_new = jnp.maximum(m, m2)
            c1 = jnp.exp(m - m_new)
            c2 = jnp.exp(m2 - m_new)
            o = o * c1[..., None] + o2 * c2[..., None]
            l = l * c1 + l2 * c2
            return (o, m_new, l, k_nxt, v_nxt), None

        (o, m, l, _, _), _ = jax.lax.scan(
            step, (o, m, l, k, v), None, length=n_shards - 1
        )
        return (o / l[..., None]).astype(q.dtype)

    fn = shard_map(
        ring_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def head_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    scale: float | None = None,
) -> jax.Array:
    """Tensor-parallel attention: heads sharded over ``axis``.

    Attention is embarrassingly parallel over heads, but the Pallas flash
    kernel is a custom call XLA cannot auto-partition under pjit — this
    shard_map wrapper runs the kernel per head-shard with zero
    communication, keeping the Megatron TP layout (qkv output-sharded →
    heads sharded → proj input-sharded) on the fast path.
    """
    spec = P(None, axis, None, None)

    def local(q, k, v):
        return multi_head_attention(q, k, v, scale=scale)

    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
