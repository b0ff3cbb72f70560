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
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453
# Safety margin added to the sub-block-0 softmax offset (exp2-units): shifts
# every p down by 2^-64 uniformly (cancelled exactly by /Σp and invisible in
# the lse identity m + log2(l)) so a row whose true max sits in a LATER
# sub-block overflows only past a ~178-unit gap instead of ~115. See the
# comment at the m_step computation in _fwd_kernel.
_SUB0_MARGIN = 64.0


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *scratch,
    kv_steps, bkv, nsub, kv_len, padded,
):
    """One (batch*head, q-block) program; grid dim 2 walks the kv steps.

    TRANSPOSED-score formulation, tuned on v5e (≈1.0 ms vs 1.47 ms for the
    naive-layout online-softmax kernel at the 896_L shape [16,4224,64]):

      * scores are computed as ``s_t = k·qᵀ [bkv, bq]`` and the PV matmul as
        ``vᵀ·pᵀ`` via ``dot_general(v, p_t)`` → ``[D, bq]``. With head dim 64
        the naive PV ``[bq,bkv]×[bkv,64]`` leaves half the MXU output lanes
        idle (measured 64 TFLOP/s); transposed, the output lane dim is bq
        (128-aligned) and the contraction is bkv — full rate (measured 86).
        The output leaves the kernel as ``[BH, D, Np]``; the model needs
        ``[B, N, H·D]`` and pays one XLA transpose either way, so the layout
        is free downstream.
      * softmax runs in exp2 space with ``scale·log2(e)`` pre-folded into q
        by the caller — exp2 is the VPU-native transcendental and the
        per-tile ``s*scale`` multiply disappears.
      * each kv step is split into ``nsub`` sub-blocks (~544 rows): the max
        is reduced per-sub then combined, giving the VLIW scheduler
        independent MXU(QK)/VPU(softmax)/MXU(PV) chains to overlap (swept:
        nsub≈bkv/544 is ~15% faster than monolithic).
      * the softmax denominator ``l = Σp`` comes out of the PV matmul FOR
        FREE: v is augmented with a lane of ones, so the MXU — whose 128
        output sublanes the D=64 PV matmul half-fills anyway — emits
        ``[pv; l]`` in one pass. The separate VPU sum-reduction (and its
        bf16→fp32 recast) over every score element disappears.
      * when ``kv_steps == 1`` (whole kv fits one step, the common ViT case)
        the online-correction state and its scratch RMW vanish entirely —
        the step max is already global.

    lse (natural log, for the backward kernels) = (m + log2 l)·ln2.
    """
    kv_i = pl.program_id(2)
    q = q_ref[0]  # [bq, D], pre-scaled by scale·log2(e)
    bsub = bkv // nsub
    # Only sub-blocks overlapping [kv_len, Np) can contain padded keys, and
    # only in the LAST kv step; the mask pass is skipped everywhere else.
    # (For earlier kv steps the predicate is all-true — padding < bq ≤ bkv.)
    tail_local = kv_len - (kv_steps - 1) * bkv

    sts = []
    for t in range(nsub):
        k = k_ref[0, t * bsub:(t + 1) * bsub]  # [bsub, D]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bsub, bq]
        if padded and (t + 1) * bsub > tail_local:
            row = (jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
                   + kv_i * bkv + t * bsub)
            st = jnp.where(row < kv_len, st, _NEG)
        sts.append(st)

    # Softmax offset from sub-block 0 ONLY (not the global max). Softmax is
    # shift-invariant, so ANY offset within ~115 exp2-units ABOVE the true
    # row max yields the exact result (fp32 p = 2^gap stays finite and the
    # Σp accumulator below 2^127; the final /Σp cancels the offset
    # bit-exactly). Sub-block 0's per-row max over bsub ≥ 128 real keys is
    # within a few units of the global max for any real attention
    # distribution. The +_SUB0_MARGIN (a scalar add on one [bq] vector per
    # step — zero per-element cost) widens that overflow headroom to ~178
    # exp2-units ≈ 123 nats of logit gap, covering even the extreme-norm
    # outlier/sink tokens DINOv2 backbones are known to develop; the price
    # is that keys > ~69 units below sub-0's max flush to zero in the bf16
    # p, where their true softmax weight ≤ 2^-69 is far below fp32
    # resolution anyway. The win vs the global max: that was a full VPU
    # pass over every score element AND a barrier (no exp2/PV could start
    # until all QK matmuls finished); with sub-0 only, sub-blocks t ≥ 1
    # pipeline QK(t)→exp2(t)→PV(t) freely.
    # Measured (v5e, 896 shape, nsub=11): 0.77 → 0.64-0.72 ms/layer.
    m_step = jnp.max(sts[0], axis=0) + _SUB0_MARGIN  # [bq]

    D = q.shape[1]

    def _accumulate(m_cur):
        # acc rows [0, D) = p·v, row D = Σp (the ones-lane trick — see
        # kernel docstring); rows (D, D+8) are duplicate Σp, tile padding.
        acc = None
        ones = jnp.ones((bsub, 8), v_ref.dtype)
        for t, st in enumerate(sts):
            p = jnp.exp2(st - m_cur[None, :]).astype(v_ref.dtype)
            v = v_ref[0, t * bsub:(t + 1) * bsub]
            vaug = jnp.concatenate([v, ones], axis=1)  # [bsub, D+8]
            pv = jax.lax.dot_general(
                vaug, p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [D+8, bq]
            acc = pv if acc is None else acc + pv
        return acc

    if kv_steps == 1:
        acc = _accumulate(m_step)
        l = acc[D]
        o_ref[0] = (acc[:D] / l[None, :]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_step + jnp.log2(l)) * _LN2
    else:
        acc_ref, m_ref = scratch

        @pl.when(kv_i == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        m_prev = m_ref[0]
        m_cur = jnp.maximum(m_prev, m_step)
        corr = jnp.exp2(m_prev - m_cur)
        acc = _accumulate(m_cur)
        m_ref[0] = m_cur
        # the correction rescales the Σp row right along with the pv rows
        acc_ref[:] = acc_ref[:] * corr[None, :] + acc

        @pl.when(kv_i == kv_steps - 1)
        def _finalize():
            l = acc_ref[D]
            o_ref[0] = (acc_ref[:D] / l[None, :]).astype(o_ref.dtype)
            lse_ref[0, 0] = (m_ref[0] + jnp.log2(l)) * _LN2


def _choose_blocks(N, block_q, block_kv, pad_to):
    """(Np, bq, bkv) block/padding choice for the BACKWARD kernels."""
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


# fp32 VMEM budget for one kv step's score tiles: bq·bkv·4 bytes. 6.5 MB
# keeps the whole working set (scores + k/v blocks + double-buffered DMA)
# inside the 16 MB scoped-vmem limit with headroom. (Raising the scoped
# limit via LIBTPU_INIT_ARGS measurably SLOWS the kernel — don't.)
_STEP_BYTES = 6_500_000
_BSUB_TARGET = 544  # swept on v5e: ~544-row sub-blocks overlap MXU/VPU best
# Budgets for the mono-kv upgrade. Two checks must BOTH hold:
#  - the full [bq, Np] fp32 score tile (all sub-block tiles live at once)
#    under _MONO_SCORE_BYTES — 9.0 MB admits the chip-validated bf16
#    8704×256 case (8.91 MB, ran on v5e) and nothing meaningfully larger;
#  - the whole working set — score tile PLUS the [D, Np] k/v stream
#    blocks, which are DTYPE-sized and double-buffered by the DMA
#    pipeline — under _MONO_TOTAL_BYTES. At bf16 this never binds (the
#    score check is tighter), so every chip-validated bf16 decision is
#    unchanged; at fp32 compute (the precision-fallback mode) the k/v
#    bytes double and 8704×256 exceeds scoped VMEM (16.04 MB measured vs
#    the 16 MB limit on v5e), so fp32 must take the multi-step walk.
_MONO_SCORE_BYTES = 9_000_000
_MONO_TOTAL_BYTES = 14_000_000


def _mono_kv_upgrade(Np, bq, bkv, nsub, sub_align, esize=2, head_dim=64):
    """Single-kv-step rewrite of a multi-step choice, when it fits VMEM.

    Measured on v5e at the 1288² ViT shape (Np=8704, tools/sweep_tiling.py):
    the default 4-step walk (bq=512, bkv=2176) runs 3.219 ms/layer; one
    monolithic kv step with 512-row sub-blocks at a halved q-block
    (bq=256, bkv=8704, nsub=17) runs **2.746 ms** (96 → 113 padded
    TFLOP/s). The multi-step walk pays a [D+8, bq] accumulator rescale and
    running-max correction per step and forfeits cross-sub MXU/VPU overlap
    at the step boundaries; a fitting mono step pays only a narrower
    q-block. Fires ONLY when the incoming choice is multi-step and a
    bq ∈ {bq, bq/2, bq/4} keeps the score tiles (4·bq·Np bytes) under
    _MONO_SCORE_BYTES AND the whole working set — scores plus the
    double-buffered dtype-sized k/v stream (2·2·esize·D·Np) — under
    _MONO_TOTAL_BYTES. 672²/896² tilings are untouched, and fp32 compute
    (``esize=4``, the precision-fallback mode) stays on the multi-step
    walk at 8704 tokens instead of exceeding scoped VMEM by 42 KB. The
    sub-block count may exceed the multi-step path's n ≤ 16 cap (n = 17
    here): the kernel unrolls sub-blocks statically, so any divisor works.
    """
    if Np == bkv:
        return Np, bq, bkv, nsub
    kv_bytes = 2 * 2 * esize * head_dim * Np
    for bq2 in (bq, bq // 2, bq // 4):
        if (bq2 < 256 or bq2 % 128 or Np % bq2
                or 4 * bq2 * Np > _MONO_SCORE_BYTES
                or 4 * bq2 * Np + kv_bytes > _MONO_TOTAL_BYTES):
            continue
        cands = [n for n in range(1, Np // sub_align + 1)
                 if Np % (sub_align * n) == 0]
        n = min(cands, key=lambda c: abs(Np // c - _BSUB_TARGET))
        if Np // n <= 2 * _BSUB_TARGET:  # no absurdly fat sub-blocks
            return Np, bq2, Np, n
    return Np, bq, bkv, nsub


def _choose_fwd_blocks(N, block_q=None, block_kv=None, pad_to=None,
                       sub_align=8, esize=2, head_dim=64):
    """(Np, bq, bkv, nsub) for the forward kernel.

    Np: smallest lane-aligned padded length with a ≥256 q-block (attention
    FLOPs scale with Np², so 4097→4224/384 beats 4097→4608/512); bkv: the
    largest divisor of Np whose score tile fits _STEP_BYTES — ViT shapes
    (Np ≤ 4224) run in ONE kv step, 8465→8704 runs in four; nsub splits the
    step into ~544-row sub-blocks for MXU/VPU overlap. ``sub_align``: the
    sub-block size granularity — 8 when kv is a sublane dim (standard
    layout), 128 when kv is a lane dim (transposed stream: lane slices must
    be tile-aligned).
    """
    if pad_to is not None:
        assert block_q and block_kv, "pad_to requires explicit blocks"
        assert pad_to >= N and pad_to % block_q == 0 and pad_to % block_kv == 0
        Np, bq = pad_to, block_q
    else:
        Np, bq = _pad_and_block(N, block_q or 512)
    cap = max(_STEP_BYTES // (4 * bq), sub_align)
    if block_kv:
        cap = min(cap, block_kv)
    # Fallbacks (bq, Np) are always 128-multiples via _pad_and_block, so they
    # satisfy any sub_align; the divisor search must too — when kv is a LANE
    # dim (sub_align=128) a non-128-multiple bkv would mis-tile the lane
    # slices (e.g. Np=4992 has divisor 2496, valid only for sublane kv).
    bkv = bq if Np % bq == 0 else Np
    for b in range(sub_align, min(Np, cap) + 1, sub_align):
        if Np % b == 0:
            bkv = b
    nsub = 1
    best = abs(bkv - _BSUB_TARGET)
    # n ≤ 16: bkv = 128·17 (the 1288² shape) would need n = 17 to split,
    # but measured identical monolithic (multi-kv-step grids already
    # overlap via cross-step DMA pipelining) — not worth the special case.
    for n in range(2, 17):
        if bkv % (sub_align * n) == 0 and abs(bkv // n - _BSUB_TARGET) < best:
            nsub, best = n, abs(bkv // n - _BSUB_TARGET)
    # explicit overrides are respected — incl. block_q (a pinned q-block is
    # a tuning/VMEM request; the upgrade halves it, so it must not fire)
    if pad_to is None and not block_kv and block_q is None:
        Np, bq, bkv, nsub = _mono_kv_upgrade(
            Np, bq, bkv, nsub, sub_align, esize=esize, head_dim=head_dim)
    return Np, bq, bkv, nsub


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_kv", "scale", "interpret", "pad_to"),
)
def _flash_fwd_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool = False,
    pad_to: int | None = None,
):
    """Pallas TPU flash attention.

    ``[B, H, N, Dh]`` → (out_t ``[B, H, Dh, N]`` TRANSPOSED, lse ``[B,H,N]``).
    See :func:`_fwd_kernel` for why the output layout is transposed. Callers
    wanting ``[B, H, N, Dh]`` transpose once (:func:`flash_attention`); the
    model consumes the transposed layout directly and pays nothing.
    """
    B, H, N, D = q.shape
    if scale is None:
        scale = D ** -0.5
    Np, bq, bkv, nsub = _choose_fwd_blocks(N, block_q, block_kv, pad_to,
                                           esize=q.dtype.itemsize, head_dim=D)
    # Fold scale + the exp→exp2 base change into q: one [N, D] multiply
    # instead of a per-score-tile [Np, Np] multiply inside the kernel.
    q = q * jnp.asarray(scale * _LOG2E, q.dtype)
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
            _fwd_kernel, kv_steps=kv_steps, bkv=bkv, nsub=nsub, kv_len=N,
            padded=Np != N,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, D, Np), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Np), jnp.float32),
        ],
        scratch_shapes=[] if kv_steps == 1 else [
            pltpu.VMEM((D + 8, bq), jnp.float32),  # [pv; Σp] accumulator
            pltpu.VMEM((1, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(B, H, D, Np)
    lse = lse.reshape(B, H, Np)
    if Np != N:
        out, lse = out[:, :, :, :N], lse[:, :, :N]
    return out, lse


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool = False,
    pad_to: int | None = None,
    transposed_out: bool = False,
) -> jax.Array:
    """Pallas TPU flash attention, ``[B, H, N, Dh]`` in.

    Returns ``[B, H, N, Dh]``, or the kernel-native ``[B, H, Dh, N]`` when
    ``transposed_out`` (free for callers that reshape to ``[B, N, H·Dh]``
    anyway — see :func:`attention_merged`).
    """
    out_t, _ = _flash_fwd_impl(
        q, k, v, scale=scale, block_q=block_q, block_kv=block_kv,
        interpret=interpret, pad_to=pad_to,
    )
    return out_t if transposed_out else out_t.transpose(0, 1, 3, 2)


# ---------------------------------------------------------------------------
# Transposed-stream entry: q/k/v arrive channels-major [B, H, Dh, N].
#
# With the ViT residual stream kept as [B, D, N] (see models/vit.py
# "transposed stream"), the qkv projection's output slices reshape to
# [B, H, Dh, N] for FREE (minor dim untouched) and that IS the kernel's
# native operand layout: k_t·qᵀ contracts the Dh sublanes directly and the
# output needs no transform. It also fixes a 2× HBM tax: [.., N, 64] arrays
# tile as (8,128) with half the lanes empty, while [.., 64, N] tiles are
# fully packed.
# ---------------------------------------------------------------------------


def _fwd_kernel_t(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *scratch,
    kv_steps, bkv, nsub, kv_len, padded,
):
    """Transposed-operand twin of :func:`_fwd_kernel`: q [1, Dh, bq],
    k/v [1, Dh, bkv], out [1, Dh, bq]. kv sub-blocks are LANE slices of k/v
    (must be 128-aligned — _choose_fwd_blocks(sub_align=128)); the score
    tile s_t [bsub, bq] and all softmax math are identical."""
    kv_i = pl.program_id(2)
    q = q_ref[0]  # [Dh, bq], pre-scaled by scale·log2(e)
    bsub = bkv // nsub
    tail_local = kv_len - (kv_steps - 1) * bkv

    sts = []
    for t in range(nsub):
        k = k_ref[0][:, t * bsub:(t + 1) * bsub]  # [Dh, bsub]
        st = jax.lax.dot_general(
            k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bsub, bq]
        if padded and (t + 1) * bsub > tail_local:
            row = (jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
                   + kv_i * bkv + t * bsub)
            st = jnp.where(row < kv_len, st, _NEG)
        sts.append(st)

    # Sub-block-0 softmax offset — see the matching comment in _fwd_kernel:
    # exact by shift-invariance, removes the QK→softmax barrier and
    # (nsub-1)/nsub of the max pass; +_SUB0_MARGIN buys ~178 exp2-units of
    # outlier-logit headroom at zero per-element cost.
    m_step = jnp.max(sts[0], axis=0) + _SUB0_MARGIN

    Dh = q.shape[0]

    def _accumulate(m_cur):
        # acc rows [0, Dh) = p·v, row Dh = Σp from the ones-sublane trick
        # (see _fwd_kernel docstring) — rows (Dh, Dh+8) duplicate Σp.
        acc = None
        ones = jnp.ones((8, bsub), v_ref.dtype)
        for t, st in enumerate(sts):
            p = jnp.exp2(st - m_cur[None, :]).astype(v_ref.dtype)
            v = v_ref[0][:, t * bsub:(t + 1) * bsub]  # [Dh, bsub]
            vaug = jnp.concatenate([v, ones], axis=0)  # [Dh+8, bsub]
            pv = jax.lax.dot_general(
                vaug, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Dh+8, bq]
            acc = pv if acc is None else acc + pv
        return acc

    if kv_steps == 1:
        acc = _accumulate(m_step)
        l = acc[Dh]
        o_ref[0] = (acc[:Dh] / l[None, :]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_step + jnp.log2(l)) * _LN2
    else:
        acc_ref, m_ref = scratch

        @pl.when(kv_i == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        m_prev = m_ref[0]
        m_cur = jnp.maximum(m_prev, m_step)
        corr = jnp.exp2(m_prev - m_cur)
        acc = _accumulate(m_cur)
        m_ref[0] = m_cur
        acc_ref[:] = acc_ref[:] * corr[None, :] + acc

        @pl.when(kv_i == kv_steps - 1)
        def _finalize():
            l = acc_ref[Dh]
            o_ref[0] = (acc_ref[:Dh] / l[None, :]).astype(o_ref.dtype)
            lse_ref[0, 0] = (m_ref[0] + jnp.log2(l)) * _LN2


def transposed_padded_len(n: int) -> int:
    """The padded length the transposed flash kernel runs at for a true
    sequence length ``n``. A channels-major caller that keeps its residual
    stream pre-padded to this length (with ``kv_len=n`` threaded through
    :func:`attention_t`) makes the per-layer pad/slice around the kernel
    vanish entirely — at batch > 1 XLA materializes those as separate HBM
    passes (~3 ms/img at 896_L batch 4, profiled on v5e)."""
    return _choose_fwd_blocks(n, sub_align=128)[0]


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "kv_len"))
def _flash_fwd_impl_t(q, k, v, scale=None, interpret=False, kv_len=None):
    """``[B, H, Dh, N]`` in → (out_t ``[B, H, Dh, N]``, lse ``[B, H, N]``).

    ``kv_len``: the TRUE sequence length when the inputs arrive already
    padded to :func:`transposed_padded_len` (a pre-padded residual stream).
    Positions ≥ kv_len are masked out of the softmax inside the kernel, so
    their content is arbitrary (residual-stream junk, not zeros); the
    outputs keep the padded length. Default (None): inputs are unpadded and
    this function pads/slices internally as before.
    """
    B, H, D, N = q.shape
    if scale is None:
        scale = D ** -0.5
    prepadded = kv_len is not None and kv_len != N
    if kv_len is None:
        kv_len = N
    Np, bq, bkv, nsub = _choose_fwd_blocks(kv_len, sub_align=128,
                                           esize=q.dtype.itemsize, head_dim=D)
    if prepadded:
        assert N == Np, (N, Np, kv_len)
    q = q * jnp.asarray(scale * _LOG2E, q.dtype)
    if Np != N:
        pad = [(0, 0), (0, 0), (0, 0), (0, Np - N)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    kv_steps = Np // bkv

    qf = q.reshape(B * H, D, Np)
    kf = k.reshape(B * H, D, Np)
    vf = v.reshape(B * H, D, Np)

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_t, kv_steps=kv_steps, bkv=bkv, nsub=nsub,
            kv_len=kv_len, padded=Np != kv_len,
        ),
        grid=(B * H, Np // bq, kv_steps),
        in_specs=[
            pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, D, bkv), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, D, bkv), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, D, Np), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Np), jnp.float32),
        ],
        scratch_shapes=[] if kv_steps == 1 else [
            pltpu.VMEM((D + 8, bq), jnp.float32),  # [pv; Σp] accumulator
            pltpu.VMEM((1, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(B, H, D, Np)
    lse = lse.reshape(B, H, Np)
    if Np != N:  # only when THIS function padded (pre-padded stays padded)
        out, lse = out[:, :, :, :N], lse[:, :, :N]
    return out, lse


def mha_reference_t(q, k, v, scale=None, kv_len=None):
    """Plain attention in the transposed layout, ``[B, H, Dh, N]`` in/out.

    ``kv_len``: mask key positions ≥ kv_len (pre-padded stream — same
    semantics as the Pallas kernels, so CPU tests exercise identical math).
    """
    if scale is None:
        scale = q.shape[-2] ** -0.5
    logits = jnp.einsum("bhdn,bhdm->bhnm", q, k) * scale
    if kv_len is not None and kv_len != q.shape[-1]:
        key_pos = jnp.arange(q.shape[-1])
        logits = jnp.where(key_pos[None, None, None, :] < kv_len, logits, -jnp.inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhdm->bhdn", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_t(q, k, v, scale=None, interpret=False, kv_len=None):
    """Differentiable transposed-stream flash attention, ``[B,H,Dh,N]``
    in/out. Backward reuses the standard blockwise kernels on transposed
    views (the extra transposes cost only during training)."""
    return _flash_fwd_impl_t(
        q, k, v, scale=scale, interpret=interpret, kv_len=kv_len
    )[0]


def _fat_fwd(q, k, v, scale, interpret, kv_len):
    out_t, lse = _flash_fwd_impl_t(
        q, k, v, scale=scale, interpret=interpret, kv_len=kv_len
    )
    return out_t, (q, k, v, out_t, lse)


def _fat_bwd(scale, interpret, kv_len, res, g):
    # residuals and cotangent are already channels-major — straight into the
    # transposed backward kernels, zero boundary transposes
    q, k, v, out_t, lse = res
    return _flash_bwd_impl_t(
        q, k, v, out_t, lse, g, scale=scale, interpret=interpret, kv_len=kv_len
    )


flash_attention_t.defvjp(_fat_fwd, _fat_bwd)


def attention_t(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None,
    use_flash: bool | None = None, kv_len: int | None = None,
) -> jax.Array:
    """Transposed-stream dispatch: Pallas on TPU for long sequences, XLA
    einsum elsewhere. ``[B, H, Dh, N]`` in/out. ``kv_len``: true sequence
    length for a pre-padded stream (see :func:`transposed_padded_len`)."""
    N = q.shape[-1]
    if use_flash is None:
        use_flash = _on_tpu() and N >= 1024
    if use_flash:
        return flash_attention_t(q, k, v, scale, False, kv_len)
    return mha_reference_t(q, k, v, scale=scale, kv_len=kv_len)


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


def _bwd_dq_kernel_t(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref, acc_ref,
    *, scale, kv_steps, bkv, kv_len, mask_kv,
):
    """dQ, channels-major: one (batch*head, q-block) program walking kv.

    All operands [1, Dh, blk]. p = exp2(kᵀ·q₂ − lse₂) with q₂ = q·scale·
    log2(e), lse₂ = lse·log2(e) precomputed host-side; dp = vᵀ·dO;
    ds = p∘(dp − D)·scale; dq_t += k·ds — contraction over the kv extent
    with bq on the output lanes → FULL MXU rate (the round-1 standard-layout
    dq matmul idled half the output lanes on D=64). Only the s/dp matmuls
    keep the inherent D=64 contraction floor.

    Zero-padded kv positions need no mask here (their ds·k and dp
    contributions vanish identically); a PRE-padded stream's kv junk is not
    zero, so ``mask_kv`` switches on an explicit row mask for it.
    """
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]    # [Dh, bq] — pre-scaled by scale·log2(e)
    k = k_ref[0]    # [Dh, bkv]
    v = v_ref[0]
    do = do_ref[0]  # [Dh, bq] — bf16 stays bf16: the operands are already
    # bf16-quantized, so a bf16×bf16 MXU matmul with fp32 accumulation is
    # bit-identical to upcasting (products of two 8-bit mantissas are exact
    # in fp32) and avoids the multi-pass fp32 MXU decomposition.
    lse = lse_ref[0, 0]  # [bq], log2 units
    dd = dd_ref[0, 0]    # [bq]

    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bkv, bq]
    p = jnp.exp2(s - lse[None, :])
    if mask_kv:
        row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) + kv_i * bkv
        p = jnp.where(row < kv_len, p, 0.0)
    dp = jax.lax.dot_general(
        v, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bkv, bq]
    ds = (p * (dp - dd[None, :])).astype(k.dtype)
    acc_ref[:] += jax.lax.dot_general(
        k, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Dh, bq]

    @pl.when(kv_i == kv_steps - 1)
    def _finalize():
        # ·scale folded out of the per-tile ds into this one [Dh, bq] pass
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_t(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, q_steps, bkv, kv_len, mask_kv,
):
    """dK/dV, channels-major: one (batch*head, kv-block) program walking q.

    dv_t += dO·pᵀ and dk_t += q₂·dsᵀ/log2(e) — both contract over the
    q extent with bkv on the output lanes → FULL MXU rate (the standard
    layout paid the D=64 output-lane tax on both). Padded q columns need no
    mask (their dO is zero); padded kv rows of p are masked so dk/dv's
    padded rows stay finite before being sliced off.
    """
    q_i = pl.program_id(2)

    @pl.when(q_i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]    # [Dh, bq] — pre-scaled
    k = k_ref[0]    # [Dh, bkv]
    v = v_ref[0]
    do = do_ref[0]  # bf16 stays bf16 — see _bwd_dq_kernel_t
    lse = lse_ref[0, 0]
    dd = dd_ref[0, 0]

    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bkv, bq]
    p = jnp.exp2(s - lse[None, :])
    kv_j = pl.program_id(1)
    # mask_kv: PRE-padded stream (kv junk is non-zero) — always mask; plain
    # zero-padding only needs it when a block straddles the boundary
    if mask_kv or kv_len % bkv != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) + kv_j * bkv
        p = jnp.where(row < kv_len, p, 0.0)
    dv_acc[:] += jax.lax.dot_general(
        do, p.astype(do_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Dh, bkv]
    dp = jax.lax.dot_general(
        v, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bkv, bq]
    ds = (p * (dp - dd[None, :])).astype(q.dtype)
    dk_acc[:] += jax.lax.dot_general(
        q, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Dh, bkv]

    @pl.when(q_i == q_steps - 1)
    def _finalize():
        # ·1/log2(e) folded out of the per-tile ds into this one pass
        dk_ref[0] = (dk_acc[:] * (1.0 / _LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel_t(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
    dk_ref, dv_ref, dqp_ref, dk_acc, dv_acc,
    *, q_steps, bkv, kv_len, mask_kv,
):
    """Fused dK/dV/dQ-partials, channels-major, one (batch*head, kv-block)
    program walking q.

    The two-pass backward (``_bwd_dq_kernel_t`` + ``_bwd_dkv_kernel_t``)
    recomputes the two D=64-contraction matmuls — s = kᵀ·q₂ and dp = vᵀ·dO,
    the HALF-MXU-rate ones — in BOTH passes: 7 block matmuls where the math
    needs 5. This kernel computes them once and emits, besides the dk/dv
    accumulators, this kv-block's dq CONTRIBUTION ``k·ds`` for every
    q block: partials land in a ``[B·H, kv_steps, Dh, Np]`` fp32 output
    (each (j, i) grid cell writes its own block exactly once — no output
    revisiting) and are summed outside. Measured v5e, ViT-L: the partial
    sum's extra HBM traffic is far below the two deleted matmuls.

    Masking note: padded-kv rows of p are zeroed here whenever a block
    straddles kv_len (superset of what dq needs — zero-padded kv already
    contributes nothing to dq through k=0, pre-padded junk must be masked).
    """
    q_i = pl.program_id(2)

    @pl.when(q_i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]    # [Dh, bq] — pre-scaled by scale·log2(e)
    k = k_ref[0]    # [Dh, bkv]
    v = v_ref[0]
    do = do_ref[0]  # bf16 stays bf16 — see _bwd_dq_kernel_t
    lse = lse_ref[0, 0]
    dd = dd_ref[0, 0]

    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bkv, bq]
    p = jnp.exp2(s - lse[None, :])
    kv_j = pl.program_id(1)
    if mask_kv or kv_len % bkv != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) + kv_j * bkv
        p = jnp.where(row < kv_len, p, 0.0)
    dv_acc[:] += jax.lax.dot_general(
        do, p.astype(do_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Dh, bkv]
    dp = jax.lax.dot_general(
        v, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bkv, bq]
    ds = (p * (dp - dd[None, :])).astype(q.dtype)
    dk_acc[:] += jax.lax.dot_general(
        q, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Dh, bkv]
    # this kv block's dq contribution — full MXU rate (bkv-deep contraction)
    dqp_ref[0, 0] = jax.lax.dot_general(
        k, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Dh, bq]

    @pl.when(q_i == q_steps - 1)
    def _finalize():
        # ·1/log2(e) folded out of the per-tile ds into this one pass
        dk_ref[0] = (dk_acc[:] * (1.0 / _LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _choose_bwd_blocks(N, block_q=None, block_kv=None):
    """(Np, bq, bkv) for the transposed backward: bkv rides the LANE dim of
    the k/v/do blocks so it must be a multiple of 128; bounded by the fp32
    [bkv, bq] tile budget (three such tiles live per step).

    ``block_q``/``block_kv`` pin the blocks (tools/sweep_bwd_tiling.py's
    search surface) — each must be a 128-multiple dividing the padded
    length; the VMEM budget then falls on the caller.
    """
    Np, bq = _pad_and_block(N, 512)
    if block_q is not None:
        assert block_q % 128 == 0 and Np % block_q == 0, (N, Np, block_q)
        bq = block_q
    if block_kv is not None:
        assert block_kv % 128 == 0 and Np % block_kv == 0, (N, Np, block_kv)
        return Np, bq, block_kv
    cap = max(_STEP_BYTES // (4 * bq), 128)
    bkv = bq if Np % bq == 0 else Np
    for b in range(128, min(Np, cap) + 1, 128):
        if Np % b == 0:
            bkv = b
    return Np, bq, bkv


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "kv_len", "fused",
                              "block_q", "block_kv")
)
def _flash_bwd_impl_t(q, k, v, o, lse, do, scale=None, interpret=False,
                      kv_len=None, fused=True, block_q=None, block_kv=None):
    """Flash-attention backward, channels-major ``[B, H, Dh, N]`` in/out.

    O(N·block) memory, no [N, N] materialization (the round-1 XLA backward
    allocated the full fp32 probability matrix — ~0.3 GB per head-slice at
    1288², killing large-resolution training). This is the native layout for
    the transposed-stream ViT: residuals arrive channels-major and gradients
    leave channels-major with ZERO boundary transposes.

    ``kv_len``: true length for PRE-padded inputs (see _flash_fwd_impl_t).
    The kv junk beyond it is non-zero, so both kernels mask those rows;
    gradients keep the padded length, with exact zeros in the pad lanes
    (the invariant that keeps upstream weight gradients junk-free).

    ``fused`` (default): ONE kernel walk computes dk/dv AND per-kv-block dq
    partials, deleting the two-pass structure's duplicated s/dp matmuls
    (the half-MXU-rate D=64 contractions — 7 block matmuls → 5); partials
    are fp32-summed outside. ``fused=False`` keeps the separate
    dq + dkv passes (lower HBM watermark: no ``kv_steps × dq`` partial
    buffer) as the fallback for memory-bound shapes.
    """
    B, H, D, N = q.shape
    if scale is None:
        scale = D ** -0.5
    prepadded = kv_len is not None and kv_len != N
    if kv_len is None:
        kv_len = N
    Np, bq, bkv = _choose_bwd_blocks(kv_len, block_q=block_q,
                                     block_kv=block_kv)
    if prepadded:
        assert N == Np, (N, Np, kv_len)
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=2)  # [B,H,N]
    # exp2-space probability reconstruction: q and lse move to log2 units
    # once here, per-tile multiplies vanish (see the kernels' docstrings).
    q = q * jnp.asarray(scale * _LOG2E, q.dtype)
    lse = lse * _LOG2E
    if Np != N:
        pad4 = [(0, 0), (0, 0), (0, 0), (0, Np - N)]
        pad3 = [(0, 0), (0, 0), (0, Np - N)]
        q, k, v, do = (jnp.pad(t, pad4) for t in (q, k, v, do))
        lse, dd = jnp.pad(lse, pad3), jnp.pad(dd, pad3)
    kv_steps = Np // bkv
    q_steps = Np // bq

    flat = lambda t: t.reshape(B * H, D, Np)
    qf, kf, vf, dof = flat(q), flat(k), flat(v), flat(do)
    lsef = lse.reshape(B * H, 1, Np)
    ddf = dd.reshape(B * H, 1, Np)

    kvw_spec = pl.BlockSpec((1, D, bkv), lambda b, j, i: (b, 0, j))
    qw_spec = pl.BlockSpec((1, D, bq), lambda b, j, i: (b, 0, i))
    rw_spec = pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i))

    if fused:
        dqp_spec = pl.BlockSpec((1, 1, D, bq), lambda b, j, i: (b, j, 0, i))
        dk, dv, dqp = pl.pallas_call(
            functools.partial(
                _bwd_fused_kernel_t, q_steps=q_steps, bkv=bkv,
                kv_len=kv_len, mask_kv=prepadded,
            ),
            grid=(B * H, kv_steps, q_steps),
            in_specs=[qw_spec, kvw_spec, kvw_spec, qw_spec, rw_spec, rw_spec],
            out_specs=[kvw_spec, kvw_spec, dqp_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B * H, D, Np), k.dtype),
                jax.ShapeDtypeStruct((B * H, D, Np), v.dtype),
                jax.ShapeDtypeStruct((B * H, kv_steps, D, Np), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((D, bkv), jnp.float32),
                pltpu.VMEM((D, bkv), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(qf, kf, vf, dof, lsef, ddf)
        dq = (dqp.sum(axis=1) * scale).astype(q.dtype)
    else:
        q_spec = pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, i))
        kv_spec = pl.BlockSpec((1, D, bkv), lambda b, i, j: (b, 0, j))
        r_spec = pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i))
        dq = pl.pallas_call(
            functools.partial(
                _bwd_dq_kernel_t, scale=scale, kv_steps=kv_steps, bkv=bkv,
                kv_len=kv_len, mask_kv=prepadded,
            ),
            grid=(B * H, Np // bq, kv_steps),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, r_spec, r_spec],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct((B * H, D, Np), q.dtype),
            scratch_shapes=[pltpu.VMEM((D, bq), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(qf, kf, vf, dof, lsef, ddf)

        dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_dkv_kernel_t, q_steps=q_steps, bkv=bkv,
                kv_len=kv_len, mask_kv=prepadded,
            ),
            grid=(B * H, kv_steps, q_steps),
            in_specs=[qw_spec, kvw_spec, kvw_spec, qw_spec, rw_spec, rw_spec],
            out_specs=[kvw_spec, kvw_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B * H, D, Np), k.dtype),
                jax.ShapeDtypeStruct((B * H, D, Np), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((D, bkv), jnp.float32),
                pltpu.VMEM((D, bkv), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(qf, kf, vf, dof, lsef, ddf)

    unflat = lambda t: t.reshape(B, H, D, Np)[:, :, :, :N]
    return unflat(dq), unflat(dk), unflat(dv)


def _flash_bwd_impl(
    q, k, v, o, lse, do, scale=None, block_q=None, block_kv=None,
    interpret=False, pad_to=None,
):
    """Standard-layout ``[B, H, N, Dh]`` backward: transposes into the
    channels-major kernels and back. The transposes cost ~0.1 ms each at
    ViT-L-896 and buy full-MXU-rate dq/dk/dv matmuls (net win); the
    transposed-stream training path (``flash_attention_t``) skips them
    entirely. ``block_q``/``block_kv``/``pad_to`` are accepted for
    signature compatibility and ignored — _choose_bwd_blocks picks the
    lane-aligned tiling."""
    del block_q, block_kv, pad_to
    t = lambda x: x.transpose(0, 1, 3, 2)
    dq, dk, dv = _flash_bwd_impl_t(
        t(q), t(k), t(v), t(o), lse, t(do), scale=scale, interpret=interpret
    )
    return t(dq), t(dk), t(dv)


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
    out_t, lse = _flash_fwd_impl(q, k, v, scale=scale, interpret=interpret)
    out = out_t.transpose(0, 1, 3, 2)
    return out, (q, k, v, out, lse)


def _fa_bwd(scale, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, scale=scale, interpret=interpret)


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_merged(q, k, v, scale=None, interpret=False):
    """Differentiable flash attention returning heads-merged ``[B, N, H·Dh]``.

    The kernel emits ``[B, H, Dh, N]`` natively (see :func:`_fwd_kernel`), so
    merging heads costs the SAME single XLA transpose the standard-layout
    path pays in the model (``[B,H,N,Dh]→[B,N,H,Dh]``) — this variant just
    skips the intermediate round-trip. Backward = the same Pallas blockwise
    kernels, with the cotangent transposed back once.
    """
    out_t, _ = _flash_fwd_impl(q, k, v, scale=scale, interpret=interpret)
    B, H, Dh, N = out_t.shape
    return out_t.transpose(0, 3, 1, 2).reshape(B, N, H * Dh)


def _fam_fwd(q, k, v, scale, interpret):
    out_t, lse = _flash_fwd_impl(q, k, v, scale=scale, interpret=interpret)
    B, H, Dh, N = out_t.shape
    merged = out_t.transpose(0, 3, 1, 2).reshape(B, N, H * Dh)
    return merged, (q, k, v, out_t, lse)


def _fam_bwd(scale, interpret, res, g):
    q, k, v, out_t, lse = res
    B, H, Dh, N = out_t.shape
    o = out_t.transpose(0, 1, 3, 2)  # [B, H, N, Dh]
    do = g.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    return _flash_bwd_impl(q, k, v, o, lse, do, scale=scale, interpret=interpret)


flash_attention_merged.defvjp(_fam_fwd, _fam_bwd)


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


def attention_merged(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None,
    use_flash: bool | None = None,
) -> jax.Array:
    """Like :func:`multi_head_attention` but returns heads-merged
    ``[B, N, H·Dh]`` — the layout the output projection consumes. On the
    flash path this rides the kernel's native transposed output, saving the
    ``[B,H,N,Dh]`` round-trip."""
    B, H, N, Dh = q.shape
    if use_flash is None:
        use_flash = _on_tpu() and N >= 1024
    if use_flash:
        return flash_attention_merged(q, k, v, scale)
    out = mha_reference(q, k, v, scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(B, N, H * Dh)
