"""Flash attention kernel vs plain attention (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multihmr_tpu.ops.attention import flash_attention, mha_reference, _pad_and_block


def test_pad_and_block():
    # (padded length, block) — Np must be divisible by the block
    for n in (577, 2305, 4097, 8465, 4096, 2304):
        np_, blk = _pad_and_block(n, 512)
        assert np_ >= n and np_ % blk == 0 and blk % 128 == 0
        assert np_ - n < max(512, blk)  # bounded padding
    assert _pad_and_block(4096, 512) == (4096, 512)
    assert _pad_and_block(4097, 512) == (4224, 384)


@pytest.mark.parametrize("N", [256, 320, 257])  # aligned, aligned, ragged(cls)
def test_flash_matches_reference(N, rng):
    B, H, D = 1, 2, 64
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)) for _ in range(3)
    ]
    out_f = flash_attention(q, k, v, block_q=128, block_kv=128, interpret=True)
    out_r = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), atol=2e-5)


def test_mha_reference_matches_naive(rng):
    B, H, N, D = 2, 3, 17, 8
    q, k, v = [rng.normal(size=(B, H, N, D)).astype(np.float32) for _ in range(3)]
    out = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    logits = np.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(D)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bhnm,bhmd->bhnd", probs, v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_choose_fwd_blocks():
    from multihmr_tpu.ops.attention import _choose_fwd_blocks

    from multihmr_tpu.ops.attention import _MONO_SCORE_BYTES

    for n in (577, 2305, 4097, 8465, 4096, 2304, 65, 129):
        Np, bq, bkv, nsub = _choose_fwd_blocks(n)
        assert Np >= n and Np % bq == 0 and Np % bkv == 0
        assert bkv % nsub == 0 and (bkv // nsub) % 8 == 0
        # either the per-step budget (multi-step walk) or the mono-kv
        # upgrade's whole-score-tile budget must hold
        assert bq * bkv * 4 <= max(6_500_000, _MONO_SCORE_BYTES) or bkv == bq
    # the flagship 896_L shape: one kv step, ~544-row sub-blocks
    Np, bq, bkv, nsub = _choose_fwd_blocks(4097)
    assert (Np, bq, bkv) == (4224, 384, 4224) and bkv // nsub == 528
    # 1288_L: the mono-kv upgrade (measured 3.219 -> 2.746 ms/layer on v5e,
    # tools/sweep_tiling.py) halves bq to fit ONE kv step with ~544-row subs
    assert _choose_fwd_blocks(8465) == (8704, 256, 8704, 16)
    assert _choose_fwd_blocks(8465, sub_align=128) == (8704, 256, 8704, 17)
    # a length whose mono score tile exceeds the budget stays multi-step
    Np, bq, bkv, nsub = _choose_fwd_blocks(9300, sub_align=128)
    assert Np // bkv > 1 and bq * Np * 4 > _MONO_SCORE_BYTES
    # fp32 compute (esize=4, the precision-fallback mode): the k/v stream
    # bytes double, so the 8704-token mono tiling no longer fits scoped
    # VMEM (measured 16.04 MB vs the 16 MB limit on v5e) — the chooser
    # must fall back to the multi-step walk; bf16 (default) keeps mono
    assert _choose_fwd_blocks(8465, esize=4)[:3] == (8704, 512, 2176)
    Np, bq, bkv, nsub = _choose_fwd_blocks(8465, sub_align=128, esize=4)
    assert (Np, bq, bkv) == (8704, 512, 2176) and bkv % 128 == 0
    # fp32 at the 896_L shape is single-step regardless (no mono upgrade
    # involved) — unchanged by esize
    assert _choose_fwd_blocks(4097, esize=4)[:3] == (4224, 384, 4224)
    # an EXPLICIT block_q pins the q-block: the mono-kv upgrade must not
    # silently halve it (tuning sweeps / VMEM-bounding callers rely on this)
    Np, bq, bkv, nsub = _choose_fwd_blocks(8465, block_q=512)
    assert bq == 512 and Np // bkv > 1
    # transposed stream (kv is a LANE dim): every block must be 128-aligned,
    # including off-ViT lengths like 4866 (Np=4992 has the 8-aligned divisor
    # 2496 that would mis-tile lane slices)
    for n in (577, 2305, 4097, 8465, 4866, 4993, 65, 129):
        Np, bq, bkv, nsub = _choose_fwd_blocks(n, sub_align=128)
        assert Np % bq == 0 and Np % bkv == 0
        assert bkv % 128 == 0 and (bkv % nsub == 0 and (bkv // nsub) % 128 == 0)
    # shipped ViT shapes must be unchanged by the alignment fix
    assert _choose_fwd_blocks(4097, sub_align=128)[:3] == (4224, 384, 4224)
    assert _choose_fwd_blocks(8465, sub_align=128)[2] % 128 == 0


@pytest.mark.parametrize("N", [256, 257, 1200])  # 1200: multi-kv-step path
def test_flash_merged_matches_reference(N, rng):
    """Heads-merged output (kernel-native transposed layout) vs reference."""
    from multihmr_tpu.ops.attention import flash_attention_merged

    B, H, D = 1, 2, 32
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    out_m = flash_attention_merged(q, k, v, None, True)
    ref = mha_reference(q, k, v).transpose(0, 2, 1, 3).reshape(B, N, H * D)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref), atol=2e-5)


def test_flash_transposed_out_layout(rng):
    B, H, N, D = 1, 2, 200, 16
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    out_t = flash_attention(q, k, v, interpret=True, transposed_out=True)
    out = flash_attention(q, k, v, interpret=True)
    assert out_t.shape == (B, H, D, N)
    np.testing.assert_allclose(
        np.asarray(out_t.transpose(0, 1, 3, 2)), np.asarray(out), atol=0
    )


@pytest.mark.parametrize("N", [256, 257, 1200])
def test_flash_t_matches_reference(N, rng):
    """Transposed-stream kernel ([B,H,Dh,N] operands) vs plain attention."""
    from multihmr_tpu.ops.attention import flash_attention_t

    B, H, D = 1, 2, 64
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    t = lambda x: x.transpose(0, 1, 3, 2)
    out_t = flash_attention_t(t(q), t(k), t(v), None, True)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(t(out_t)), np.asarray(ref), atol=2e-5
    )


def test_mha_reference_t_matches_standard(rng):
    from multihmr_tpu.ops.attention import mha_reference_t

    B, H, N, D = 2, 3, 33, 16
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    t = lambda x: x.transpose(0, 1, 3, 2)
    out_t = mha_reference_t(t(q), t(k), t(v))
    np.testing.assert_allclose(
        np.asarray(t(out_t)), np.asarray(mha_reference(q, k, v)), atol=1e-5
    )


def test_flash_t_multistep_matches_reference(rng, monkeypatch):
    """Transposed kernel on a kv_steps>1 tiling (the online-correction
    branch). Since the round-4 mono-kv upgrade, every shape that fits the
    score-tile budget runs ONE kv step — so the multi-step branch is pinned
    here by forcing the pre-upgrade tiling (4608, 512, 2304, 4) at N=4481,
    exactly what the production 1288_L path used to run (4 kv steps). The
    branch still matters: lengths past ~9k tokens (e.g. a 1680² config)
    exceed the budget and fall back to it — see test_choose_fwd_blocks."""
    from multihmr_tpu.ops import attention as att

    monkeypatch.setattr(
        att, "_choose_fwd_blocks",
        lambda *a, **kw: (4608, 512, 2304, 4),
    )
    B, H, N, D = 1, 2, 4481, 64
    q, k, v = [
        jnp.asarray((0.3 * rng.normal(size=(B, H, N, D))).astype(np.float32))
        for _ in range(3)
    ]
    t = lambda x: x.transpose(0, 1, 3, 2)
    out_t = att._flash_fwd_impl_t.__wrapped__(t(q), t(k), t(v), None, True)[0]
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(t(out_t)), np.asarray(ref), atol=2e-5)


def test_flash_t_mono_upgrade_matches_reference(rng):
    """The mono-kv upgrade's tiling class (halved q-block, bkv = Np, odd
    sub-block count) vs plain attention. N=4481 upgrades to
    (4608, 256, 4608, 9) — same code shape as the production 1288_L tiling
    (8704, 256, 8704, 17) that measured 2.746 ms/layer on v5e."""
    from multihmr_tpu.ops.attention import _choose_fwd_blocks, flash_attention_t

    assert _choose_fwd_blocks(4481, sub_align=128) == (4608, 256, 4608, 9)
    B, H, N, D = 1, 2, 4481, 64
    q, k, v = [
        jnp.asarray((0.3 * rng.normal(size=(B, H, N, D))).astype(np.float32))
        for _ in range(3)
    ]
    t = lambda x: x.transpose(0, 1, 3, 2)
    out_t = flash_attention_t(t(q), t(k), t(v), None, True)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(t(out_t)), np.asarray(ref), atol=2e-5)


def test_outlier_in_later_kv_step(rng, monkeypatch):
    """An extreme outlier key in a LATER KV STEP must not overflow the
    sub-block-0 softmax offset — the cross-step analogue of
    test_sub0_offset_outlier_headroom. The pre-upgrade multi-step tiling
    (4608, 512, 2304, 4) is forced (see
    test_flash_t_multistep_matches_reference); the outlier sits at key 4000
    (step 1, sub-block 4) with a logit ~150 exp2-units above every
    sub-block-0 max — inside the +_SUB0_MARGIN headroom (~178 units) that
    both the online-correction multi-step path and any fixed-offset variant
    (see DESIGN.md §3d) must provide."""
    from multihmr_tpu.ops import attention as att

    monkeypatch.setattr(
        att, "_choose_fwd_blocks",
        lambda *a, **kw: (4608, 512, 2304, 4),
    )
    B, H, N, D = 1, 1, 4481, 64
    c = 28.85  # c*c/sqrt(64) ≈ 104 nats ≈ 150 exp2-units
    q = np.zeros((B, H, N, D), np.float32)
    q[..., 0] = c
    k = (0.02 * rng.normal(size=(B, H, N, D))).astype(np.float32)
    k[0, 0, 4000] = 0.0
    k[0, 0, 4000, 0] = c
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)

    t = lambda x: x.transpose(0, 1, 3, 2)
    # __wrapped__ (unjitted): the patched tiling must not enter the jit cache
    out_t = att._flash_fwd_impl_t.__wrapped__(t(q), t(k), t(v), None, True)[0]
    ref = mha_reference(q, k, v)  # global-max softmax: immune by design
    assert np.isfinite(np.asarray(out_t)).all(), "multi-step sub-0 offset overflowed"
    np.testing.assert_allclose(np.asarray(t(out_t)), np.asarray(ref), atol=2e-5)


def test_sub0_offset_outlier_headroom(rng):
    """An extreme outlier key in a LATER sub-block must not overflow the
    sub-block-0 softmax offset. N=1024 runs as ONE kv step with nsub=2
    (bsub=512); the outlier sits at index 600 (sub-block 1) with a logit
    ~104 nats (~150 exp2-units) above sub-block 0's max — past the ~115-unit
    naked-offset overflow bound, inside the +_SUB0_MARGIN headroom (~178).
    DINOv2 backbones are known to develop extreme-norm sink tokens; without
    the margin this produces p=inf → inf/inf NaN outputs."""
    from multihmr_tpu.ops.attention import flash_attention_t

    B, H, N, D = 1, 1, 1024, 64
    c = 28.85  # c*c/sqrt(64) ≈ 104 nats ≈ 150 exp2-units
    q = np.zeros((B, H, N, D), np.float32)
    q[..., 0] = c
    k = (0.02 * rng.normal(size=(B, H, N, D))).astype(np.float32)
    k[0, 0, 600] = 0.0
    k[0, 0, 600, 0] = c
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)

    out_f = flash_attention(q, k, v, interpret=True)
    ref = mha_reference(q, k, v)  # global-max softmax: immune by design
    assert np.isfinite(np.asarray(out_f)).all(), "sub-0 offset overflowed"
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref), atol=2e-5)

    t = lambda x: x.transpose(0, 1, 3, 2)
    out_t = flash_attention_t(t(q), t(k), t(v), None, True)
    assert np.isfinite(np.asarray(out_t)).all()
    np.testing.assert_allclose(np.asarray(t(out_t)), np.asarray(ref), atol=2e-5)
