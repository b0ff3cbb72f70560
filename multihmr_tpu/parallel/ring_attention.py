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

from multihmr_tpu.ops.attention import (
    attention_merged,
    attention_t,
    multi_head_attention,
)


def _local_attn_stats(q, k, v, scale, col_base=None, kv_len=None):
    """Attention over a kv shard returning (unnormalized_out, row_max,
    row_sumexp) for online combination across shards. ``col_base``/``kv_len``
    mask padded trailing keys: global column ``col_base + j`` ≥ ``kv_len`` is
    excluded (logit → -1e30; a fully-masked shard contributes 0 because its
    row max -1e30 zeroes its correction factor in the online combine)."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    if kv_len is not None:
        col = col_base + jnp.arange(k.shape[2])
        s = jnp.where((col < kv_len)[None, None, None, :], s, -1e30)
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
    kv_len: int | None = None,
    batch_axis: str | None = None,
) -> jax.Array:
    """Exact attention with q/k/v sequence-sharded over ``axis``.

    Args:
      q, k, v: ``[B, H, N, D]`` with N divisible by the axis size; arrays may
        be sharded ``P(batch_axis, None, axis, None)`` (they will be
        constrained).
      kv_len: if set, keys at global positions ≥ kv_len are masked (the
        sequence was padded up to a multiple of the axis size).
      batch_axis: optional mesh axis the batch dim is sharded over (keeps
        data-parallel activations sharded instead of all-gathering them).
    Returns:
      ``[B, H, N, D]`` attention output, same sharding.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_shards = mesh.shape[axis]
    spec = P(batch_axis, None, axis, None)
    shard_len = q.shape[2] // n_shards

    def ring_fn(q, k, v):
        # q,k,v: local shards [B, H, N/P, D]
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        base = idx * shard_len  # global column of this kv shard's first key

        o, m, l = _local_attn_stats(q, k, v, scale, base, kv_len)

        def step(carry, _):
            o, m, l, k_cur, v_cur, base = carry
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            base = jax.lax.ppermute(base, axis, perm)
            o2, m2, l2 = _local_attn_stats(q, k_nxt, v_nxt, scale, base, kv_len)
            m_new = jnp.maximum(m, m2)
            c1 = jnp.exp(m - m_new)
            c2 = jnp.exp(m2 - m_new)
            o = o * c1[..., None] + o2 * c2[..., None]
            l = l * c1 + l2 * c2
            return (o, m_new, l, k_nxt, v_nxt, base), None

        (o, m, l, _, _, _), _ = jax.lax.scan(
            step, (o, m, l, k, v, jnp.asarray(base)), None, length=n_shards - 1
        )
        return (o / l[..., None]).astype(q.dtype)

    fn = shard_map(
        ring_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    scale: float | None = None,
    batch_axis: str | None = None,
) -> jax.Array:
    """Ring attention for arbitrary N: pads the sequence up to a multiple of
    the axis size (padded keys masked inside the ring, padded query rows
    sliced off), so ViT token counts like 1+g² work directly."""
    n_shards = mesh.shape[axis]
    N = q.shape[-2]
    Np = -(-N // n_shards) * n_shards
    if Np != N:
        pad = [(0, 0), (0, 0), (0, Np - N), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = ring_attention(
        q, k, v, mesh, axis=axis, scale=scale,
        kv_len=N if Np != N else None, batch_axis=batch_axis,
    )
    return out[:, :, :N] if Np != N else out


def head_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    scale: float | None = None,
    batch_axis: str | None = None,
) -> jax.Array:
    """Tensor-parallel attention: heads sharded over ``axis``.

    Attention is embarrassingly parallel over heads, but the Pallas flash
    kernel is a custom call XLA cannot auto-partition under pjit — this
    shard_map wrapper runs the kernel per head-shard with zero
    communication, keeping the Megatron TP layout (qkv output-sharded →
    heads sharded → proj input-sharded) on the fast path. ``batch_axis``
    additionally shards the batch dim (data parallelism) so DP activations
    are not gathered at the shard_map boundary.
    """
    spec = P(batch_axis, axis, None, None)

    def local(q, k, v):
        return multi_head_attention(q, k, v, scale=scale)

    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)


def mesh_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh | None,
    mode: str = "heads",
    axis: str = "model",
    scale: float | None = None,
) -> jax.Array:
    """Mesh-aware attention dispatch for the model hot path.

    * no mesh, or a trivial ``axis`` → single-device :func:`multi_head_attention`
      (Pallas flash on TPU, XLA elsewhere);
    * ``mode="heads"`` → Megatron tensor parallelism (heads over ``axis``);
    * ``mode="ring"`` → exact ring attention (sequence over ``axis``).

    The batch dim rides a ``data`` mesh axis when present and divisible, so
    DP × TP layouts pass through without resharding.
    """
    if mesh is None or axis not in mesh.shape or mesh.shape[axis] <= 1:
        return multi_head_attention(q, k, v, scale=scale)
    batch_axis = None
    if "data" in mesh.shape and mesh.shape["data"] > 1 \
            and q.shape[0] % mesh.shape["data"] == 0:
        batch_axis = "data"
    if mode == "ring":
        return sequence_parallel_attention(
            q, k, v, mesh, axis=axis, scale=scale, batch_axis=batch_axis
        )
    assert mode == "heads", mode
    n = mesh.shape[axis]
    assert q.shape[1] % n == 0, (
        f"num_heads={q.shape[1]} not divisible by mesh axis {axis!r}={n}"
    )
    return head_parallel_attention(
        q, k, v, mesh, axis=axis, scale=scale, batch_axis=batch_axis
    )


def mesh_attention_merged(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh | None,
    mode: str = "heads",
    axis: str = "model",
    scale: float | None = None,
) -> jax.Array:
    """:func:`mesh_attention` returning heads-merged ``[B, N, H·Dh]``.

    This is the model hot-path entry: the flash kernel's native transposed
    output merges into ``[B, N, H·Dh]`` with the single transpose the model
    pays anyway. Under Megatron TP the merged activation is head-chunked
    along its LAST dim, so the shard_map out_spec shards that dim over
    ``axis`` — exactly the layout the row-parallel output projection wants.
    """
    B, H, N, Dh = q.shape
    if mesh is None or axis not in mesh.shape or mesh.shape[axis] <= 1:
        return attention_merged(q, k, v, scale=scale)
    batch_axis = None
    if "data" in mesh.shape and mesh.shape["data"] > 1 \
            and q.shape[0] % mesh.shape["data"] == 0:
        batch_axis = "data"
    if mode == "ring":
        out = sequence_parallel_attention(
            q, k, v, mesh, axis=axis, scale=scale, batch_axis=batch_axis
        )
        return out.transpose(0, 2, 1, 3).reshape(B, N, H * Dh)
    assert mode == "heads", mode
    n = mesh.shape[axis]
    assert H % n == 0, (
        f"num_heads={H} not divisible by mesh axis {axis!r}={n}"
    )
    spec = P(batch_axis, axis, None, None)

    def local(q, k, v):
        return attention_merged(q, k, v, scale=scale)

    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=P(batch_axis, None, axis),
    )(q, k, v)


def mesh_attention_t(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh | None,
    mode: str = "heads",
    axis: str = "model",
    scale: float | None = None,
    kv_len: int | None = None,
) -> jax.Array:
    """Mesh-aware TRANSPOSED-stream attention: ``[B, H, Dh, N]`` in/out.

    The transposed-stream ViT (models/vit.py) hot path: single-chip goes
    straight to the transposed Pallas kernel; Megatron TP shard_maps it over
    head shards (heads = dim 1, same spec position as the standard layout);
    ring/sequence-parallel transposes at the boundary (multi-chip SP already
    pays ppermute — the one transpose is noise there).
    """
    if mesh is None or axis not in mesh.shape or mesh.shape[axis] <= 1:
        return attention_t(q, k, v, scale=scale, kv_len=kv_len)
    batch_axis = None
    if "data" in mesh.shape and mesh.shape["data"] > 1 \
            and q.shape[0] % mesh.shape["data"] == 0:
        batch_axis = "data"
    if mode == "ring":
        assert kv_len is None, "pre-padded stream not used with ring SP"
        std = lambda t: t.transpose(0, 1, 3, 2)
        out = sequence_parallel_attention(
            std(q), std(k), std(v), mesh, axis=axis, scale=scale,
            batch_axis=batch_axis,
        )
        return out.transpose(0, 1, 3, 2)
    assert mode == "heads", mode
    n = mesh.shape[axis]
    assert q.shape[1] % n == 0, (
        f"num_heads={q.shape[1]} not divisible by mesh axis {axis!r}={n}"
    )
    spec = P(batch_axis, axis, None, None)

    def local(q, k, v):
        return attention_t(q, k, v, scale=scale, kv_len=kv_len)

    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
