"""Attention ops: XLA reference implementation + Pallas TPU flash attention.

The ViT hot loop is full (non-causal) self-attention over 2,304–8,464 patch
tokens (reference SURVEY §2.2-A); the reference runs cuda/xformers attention
inside hub-loaded DINOv2. Here:

  * :func:`mha_reference` — plain jnp attention (CPU tests, tiny shapes,
    autodiff-anywhere fallback) with fp32 softmax.
  * :func:`flash_attention` — Pallas blockwise flash attention (online
    softmax, fp32 accumulators, bf16 MXU matmuls), tiled for VMEM.
  * :func:`multi_head_attention` — dispatcher: Pallas on TPU for big
    sequences, XLA elsewhere.

Layout convention: ``[B, H, N, Dh]`` (batch, heads, sequence, head dim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mha_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None
) -> jax.Array:
    """Plain attention with fp32 softmax. ``[B, H, N, Dh]`` in/out."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, v)


_NEG = -1e30  # finite "masked" logit: exp(_NEG - m) underflows to 0


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale, kv_steps, bkv, kv_len,
):
    """One (batch*head, q-block) program; grid dim 2 walks the kv blocks.

    Online-softmax accumulation in fp32 scratch; the final kv step writes the
    normalized output. Shapes per block: q [1, Bq, D], k/v [1, Bk, D].
    ``kv_len`` masks padded trailing keys (sequence padded up to a
    lane-aligned length).
    """
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [Bq, D]
    k = k_ref[0]  # [Bk, D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bq, Bk] fp32
    s = s * scale
    if kv_len % bkv != 0:  # only the tail block can contain padding
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_i * bkv
        s = jnp.where(col < kv_len, s, _NEG)

    m_prev = m_ref[:, 0]  # [Bq]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    correction = jnp.exp(m_prev - m_cur)  # [Bq]
    p = jnp.exp(s - m_cur[:, None])  # [Bq, Bk] fp32
    l_ref[:, 0] = l_ref[:, 0] * correction + jnp.sum(p, axis=-1)
    m_ref[:, 0] = m_cur
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, D]
    acc_ref[:] = acc_ref[:] * correction[:, None] + pv

    @pl.when(kv_i == kv_steps - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, 0][:, None]).astype(o_ref.dtype)
        # log-sum-exp per query row — the backward kernels reconstruct the
        # probabilities from it without re-running the online softmax
        lse_ref[0, :, 0] = m_ref[:, 0] + jnp.log(l_ref[:, 0])


def _choose_blocks(N, block_q, block_kv, pad_to):
    """(Np, bq, bkv) block/padding choice shared by forward and backward."""
    if pad_to is not None:  # explicit tuning override
        assert pad_to >= N and pad_to % block_q == 0 and pad_to % block_kv == 0
        return pad_to, block_q, block_kv
    Np, blk = _pad_and_block(N, max(block_q, block_kv))
    bq = blk
    bkv = blk
    for b in range(blk, min(Np, 2560) + 1, 8):
        if Np % b == 0:
            bkv = b
    return Np, bq, bkv


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_kv", "scale", "interpret", "pad_to"),
)
def _flash_fwd_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
    pad_to: int | None = None,
):
    """Pallas TPU flash attention, ``[B, H, N, Dh]`` → (out, lse ``[B,H,N]``).

    N must be divisible by the block sizes (callers pad; ViT grids 2304/4096/
    8464 divide 256/512 after padding 8464→8704 if needed). Head dim should
    be 64 (DINOv2 S/B/L) — any multiple of 128 lane packing works.
    """
    B, H, N, D = q.shape
    if scale is None:
        scale = D ** -0.5
    # Pad the sequence so it divides into large MXU-friendly blocks (ViT
    # sequences are 1+grid^2 = 577/2305/4097/8465 — never aligned, and e.g.
    # 2305→2432=2^7·19 would force degenerate 128-blocks). Choose the
    # SMALLEST lane-aligned padded length admitting a ≥256 block: attention
    # FLOPs scale with Np², so 4097→4224 (+6%, 384-blocks) beats 4097→4608
    # (+26%, 512-blocks). Large kv blocks amortize per-step softmax/
    # correction overhead (swept on v5e: bq=384/bkv=2112 at Np=4224 is ~2x
    # square blocks); cap 2560 keeps the fp32 [bq, bkv] logits tile within
    # VMEM. kv is a SUBLANE dim (blocks are [1, bkv, D]) → multiples of 8
    # suffice. Padded keys are masked inside the kernel, padded query rows
    # are sliced off afterwards.
    Np, bq, bkv = _choose_blocks(N, block_q, block_kv, pad_to)
    if Np != N:
        pad = [(0, 0), (0, 0), (0, Np - N), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    kv_steps = Np // bkv

    qf = q.reshape(B * H, Np, D)
    kf = k.reshape(B * H, Np, D)
    vf = v.reshape(B * H, Np, D)

    grid = (B * H, Np // bq, kv_steps)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_steps=kv_steps, bkv=bkv, kv_len=N
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            # [BH, Np, 1] layout: a bare (1, bq) block violates the TPU
            # (8, 128)-alignment rule on the trailing dims
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Np, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(B, H, Np, D)
    lse = lse.reshape(B, H, Np)
    if Np != N:
        out, lse = out[:, :, :N], lse[:, :, :N]
    return out, lse


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
    pad_to: int | None = None,
) -> jax.Array:
    """Pallas TPU flash attention, ``[B, H, N, Dh]`` → ``[B, H, N, Dh]``."""
    return _flash_fwd_impl(
        q, k, v, scale=scale, block_q=block_q, block_kv=block_kv,
        interpret=interpret, pad_to=pad_to,
    )[0]


def _pad_and_block(n: int, target: int) -> tuple[int, int]:
    """(padded_length, block): smallest 128-multiple ≥ n that has a divisor
    block with 256 ≤ block ≤ target and block % 128 == 0. Minimizes the Np²
    attention-FLOP overhead while keeping MXU-sized tiles."""
    if n <= 256:
        return ((n + 127) // 128) * 128 or 128, min(((n + 127) // 128) * 128, 256)
    np_cap = ((n + target - 1) // target) * target  # always valid fallback
    cand = ((n + 127) // 128) * 128
    while cand <= np_cap:
        for b in range(min(target, cand), 255, -128):
            if b % 128 == 0 and cand % b == 0:
                return cand, b
        cand += 128
    return np_cap, target


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref, acc_ref,
    *, scale, kv_steps, bkv, kv_len,
):
    """dQ: one (batch*head, q-block) program; grid dim 2 walks kv blocks.

    p = exp(q·kᵀ·scale − lse); dp = dO·vᵀ; ds = p·(dp − D); dq += ds·k·scale
    where D = rowsum(dO ⊙ O) is precomputed on the host side of the call.
    """
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [Bq, D]
    k = k_ref[0]  # [Bk, D]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)  # [Bq, D]
    lse = lse_ref[0, :, 0]  # [Bq]
    dd = dd_ref[0, :, 0]  # [Bq]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse[:, None])  # [Bq, Bk] fp32
    if kv_len % bkv != 0:  # zero padded keys (only the tail block has them)
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + kv_i * bkv
        p = jnp.where(col < kv_len, p, 0.0)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Bk]
    ds = p * (dp - dd[:, None]) * scale
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_i == kv_steps - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, q_steps, bkv, kv_len,
):
    """dK/dV: one (batch*head, kv-block) program; grid dim 2 walks q blocks.

    dv += pᵀ·dO; ds = p·(dp − D); dk += dsᵀ·q·scale. Padded q rows need no
    mask: their dO is zero so both contributions vanish.
    """
    q_i = pl.program_id(2)

    @pl.when(q_i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # [Bq, D]
    k = k_ref[0]  # [Bk, D]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, 0]
    dd = dd_ref[0, :, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse[:, None])  # [Bq, Bk]
    kv_j = pl.program_id(1)
    if kv_len % bkv != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + kv_j * bkv
        p = jnp.where(col < kv_len, p, 0.0)
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bk, D]
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - dd[:, None]) * scale).astype(q.dtype)
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(q_i == q_steps - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_kv", "interpret", "pad_to")
)
def _flash_bwd_impl(
    q, k, v, o, lse, do, scale=None, block_q=512, block_kv=512,
    interpret=False, pad_to=None,
):
    """Flash-attention backward: O(N·block) memory, no [N, N] materialization
    (the round-1 XLA backward allocated the full fp32 probability matrix —
    ~0.3 GB per head-slice at 1288², killing large-resolution training)."""
    B, H, N, D = q.shape
    if scale is None:
        scale = D ** -0.5
    Np, bq, bkv = _choose_blocks(N, block_q, block_kv, pad_to)
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [B,H,N]
    if Np != N:
        pad4 = [(0, 0), (0, 0), (0, Np - N), (0, 0)]
        pad3 = [(0, 0), (0, 0), (0, Np - N)]
        q, k, v, do = (jnp.pad(t, pad4) for t in (q, k, v, do))
        lse, dd = jnp.pad(lse, pad3), jnp.pad(dd, pad3)
    kv_steps = Np // bkv
    q_steps = Np // bq

    flat4 = lambda t: t.reshape(B * H, Np, D)
    flat3 = lambda t: t.reshape(B * H, Np, 1)
    qf, kf, vf, dof = flat4(q), flat4(k), flat4(v), flat4(do)
    lsef, ddf = flat3(lse), flat3(dd)

    q_spec = pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0))
    r_spec = pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0))
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, kv_steps=kv_steps, bkv=bkv, kv_len=N
        ),
        grid=(B * H, Np // bq, kv_steps),
        in_specs=[
            q_spec,
            pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
            q_spec, r_spec, r_spec,
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, ddf)

    kv_spec = pl.BlockSpec((1, bkv, D), lambda b, j, i: (b, j, 0))
    qw_spec = pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0))
    rw_spec = pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, q_steps=q_steps, bkv=bkv, kv_len=N
        ),
        grid=(B * H, kv_steps, q_steps),
        in_specs=[qw_spec, kv_spec, kv_spec, qw_spec, rw_spec, rw_spec],
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Np, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Np, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv, D), jnp.float32),
            pltpu.VMEM((bkv, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, ddf)

    unflat = lambda t: t.reshape(B, H, Np, D)[:, :, :N]
    return unflat(dq), unflat(dk), unflat(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_trainable(q, k, v, scale=None, interpret=False):
    """Differentiable flash attention: Pallas kernels in BOTH directions.

    ``pallas_call`` has no automatic VJP; the forward saves (q, k, v, o,
    lse) and the backward reconstructs probabilities blockwise from the
    log-sum-exp — O(N·block) memory instead of the O(N²) matrix, which is
    what makes 1288² (8,704-token) training fit on one chip.
    """
    return flash_attention(q, k, v, scale=scale, interpret=interpret)


def _fa_fwd(q, k, v, scale, interpret):
    out, lse = _flash_fwd_impl(q, k, v, scale=scale, interpret=interpret)
    return out, (q, k, v, out, lse)


def _fa_bwd(scale, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, scale=scale, interpret=interpret)


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)


def _on_tpu() -> bool:
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        return False
    return platform in ("tpu", "axon")


def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None,
    use_flash: bool | None = None,
) -> jax.Array:
    """Dispatch to the Pallas kernel on TPU for long sequences, XLA otherwise."""
    N = q.shape[-2]
    if use_flash is None:
        use_flash = _on_tpu() and N >= 1024
    if use_flash:
        return flash_attention_trainable(q, k, v, scale)
    return mha_reference(q, k, v, scale=scale)
