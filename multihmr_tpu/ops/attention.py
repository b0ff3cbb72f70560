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
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, kv_steps, bkv, kv_len
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


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_kv", "scale", "interpret", "pad_to"),
)
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
    """Pallas TPU flash attention, ``[B, H, N, Dh]`` → ``[B, H, N, Dh]``.

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
    # (+26%, 512-blocks). Padded keys are masked inside the kernel, padded
    # query rows are sliced off afterwards.
    if pad_to is not None:  # explicit tuning override
        assert pad_to >= N and pad_to % block_q == 0 and pad_to % block_kv == 0
        Np, bq, bkv = pad_to, block_q, block_kv
    else:
        Np, blk = _pad_and_block(N, max(block_q, block_kv))
        bq = blk
        # large kv blocks amortize per-step softmax/correction overhead
        # (swept on v5e: bq=384/bkv=2112 at Np=4224 is ~2x square blocks;
        # bkv=2560 full-kv wins at Np=2560); cap 2560 keeps the fp32
        # [bq, bkv] logits tile within VMEM.
        # kv is a SUBLANE dim (blocks are [1, bkv, D]) → multiples of 8
        # suffice, so e.g. 2112 | 4224 is admissible.
        bkv = blk
        for b in range(blk, min(Np, 2560) + 1, 8):
            if Np % b == 0:
                bkv = b
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
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_steps=kv_steps, bkv=bkv, kv_len=N
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
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
    return out[:, :, :N] if Np != N else out


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_trainable(q, k, v, scale=None):
    """Differentiable wrapper: Pallas kernel forward, analytic XLA backward.

    ``pallas_call`` has no automatic VJP, so training paths route through
    this wrapper: the backward pass recomputes probabilities (fp32 softmax)
    and applies the closed-form softmax-attention gradients —
    flash-style memory in fwd, standard O(N²) recompute in bwd (which is
    where XLA would be anyway without a bwd kernel).
    """
    return flash_attention(q, k, v, scale=scale)


def _fa_fwd(q, k, v, scale):
    return flash_attention(q, k, v, scale=scale), (q, k, v)


def _fa_bwd(scale, res, g):
    q, k, v = res
    sc = q.shape[-1] ** -0.5 if scale is None else scale
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * sc
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, g32)
    dp = jnp.einsum("bhnd,bhmd->bhnm", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32)) * sc
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32)) * sc
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


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
