"""Custom-VJP correctness: gradients of the flash wrapper (Pallas forward
AND Pallas blockwise backward, run in interpret mode on CPU) must match
jax.grad through plain attention — including padded-tail masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihmr_tpu.ops import attention as A


@pytest.mark.parametrize("N", [160, 256])  # 160 pads to 256 → masked tail
def test_flash_vjp_matches_reference_grad(rng, N):
    B, H, D = 1, 2, 32
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)) for _ in range(3)
    ]

    def loss_flash(q, k, v):
        return jnp.sum(jnp.tanh(A.flash_attention_trainable(q, k, v, None, True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(A.mha_reference(q, k, v)))

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_vjp_explicit_scale_and_value(rng):
    """Forward value AND grads with a non-default scale."""
    B, H, N, D = 1, 1, 192, 16
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)) for _ in range(3)
    ]
    scale = 0.17
    out = A.flash_attention_trainable(q, k, v, scale, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(A.mha_reference(q, k, v, scale=scale)), atol=2e-5
    )

    def loss_flash(q, k, v):
        return jnp.sum(A.flash_attention_trainable(q, k, v, scale, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A.mha_reference(q, k, v, scale=scale) ** 2)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_fwd_lse(rng):
    """The saved log-sum-exp must equal the reference logsumexp rows."""
    B, H, N, D = 2, 2, 128, 16
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)) for _ in range(3)
    ]
    out, lse = A._flash_fwd_impl(q, k, v, interpret=True)
    s = np.einsum("bhnd,bhmd->bhnm", np.asarray(q), np.asarray(k)) * D ** -0.5
    want = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(np.asarray(lse), want, atol=2e-5)


@pytest.mark.parametrize("N", [160, 1200])  # padded tail; multi-kv-step
def test_flash_merged_vjp_matches_reference_grad(rng, N):
    """Gradients through the heads-merged flash path (custom VJP with the
    cotangent transposed back into the blockwise backward kernels)."""
    B, H, D = 1, 2, 32
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]

    def loss_flash(q, k, v):
        return jnp.sum(jnp.tanh(A.flash_attention_merged(q, k, v, None, True)))

    def loss_ref(q, k, v):
        out = A.mha_reference(q, k, v)
        merged = out.transpose(0, 2, 1, 3).reshape(B, N, H * D)
        return jnp.sum(jnp.tanh(merged))

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("N", [160, 1200])
def test_flash_t_vjp_matches_reference_grad(rng, N):
    """Transposed-stream custom VJP (standard backward kernels on transposed
    views) vs jax.grad through plain attention."""
    B, H, D = 1, 2, 32
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    t = lambda x: x.transpose(0, 1, 3, 2)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.tanh(A.flash_attention_t(t(q), t(k), t(v), None, True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(t(A.mha_reference(q, k, v))))

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_t_prepadded_kv_len_fwd_bwd():
    """Pre-padded transposed kernels (interpret mode): junk beyond kv_len
    must not affect outputs or gradients of the real tokens, and the pad
    lanes of all three gradients must be EXACTLY zero (the invariant that
    keeps upstream weight grads junk-free in the pre-padded stream)."""
    import multihmr_tpu.ops.attention as A

    rng = np.random.default_rng(7)
    B, H, D, n = 1, 2, 32, 300
    Np = A.transposed_padded_len(n)
    assert Np > n
    mk = lambda: rng.normal(size=(B, H, D, Np)).astype(np.float32)
    qp, kp, vp = (jnp.asarray(t) for t in (mk(), mk(), mk()))  # junk pads
    q, k, v = qp[..., :n], kp[..., :n], vp[..., :n]

    # forward: padded-with-junk + kv_len == unpadded on the real lanes
    out_pad = A.flash_attention_t(qp, kp, vp, None, True, n)
    out_ref = A.flash_attention_t(q, k, v, None, True)
    np.testing.assert_allclose(
        np.asarray(out_pad[..., :n]), np.asarray(out_ref), atol=2e-5
    )

    # backward: cotangent zero on pad lanes (as the sliced stream produces)
    gpad = jnp.asarray(
        np.concatenate([rng.normal(size=(B, H, D, n)).astype(np.float32),
                        np.zeros((B, H, D, Np - n), np.float32)], -1)
    )

    def f_pad(q, k, v):
        return jnp.vdot(A.flash_attention_t(q, k, v, None, True, n), gpad)

    def f_ref(q, k, v):
        return jnp.vdot(A.flash_attention_t(q, k, v, None, True), gpad[..., :n])

    dq_p, dk_p, dv_p = jax.grad(f_pad, argnums=(0, 1, 2))(qp, kp, vp)
    dq_r, dk_r, dv_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for g_pad_full, g_ref, name in (
        (dq_p, dq_r, "dq"), (dk_p, dk_r, "dk"), (dv_p, dv_r, "dv")
    ):
        np.testing.assert_allclose(
            np.asarray(g_pad_full[..., :n]), np.asarray(g_ref), atol=2e-5,
            err_msg=name,
        )
        np.testing.assert_array_equal(
            np.asarray(g_pad_full[..., n:]),
            np.zeros((B, H, D, Np - n), np.float32), err_msg=f"{name} pad lanes",
        )


@pytest.mark.parametrize("N", [160, 1200])
def test_bwd_fused_matches_two_pass(rng, N):
    """The fused backward (dk/dv + dq-partials in one kernel walk) must
    reproduce the two-pass backward's gradients to fp32 summation noise:
    same math, the only difference is where the per-kv-block dq
    contributions are accumulated (fp32 partial buffer vs VMEM scratch)."""
    B, H, D = 1, 2, 32
    t = lambda x: x.transpose(0, 1, 3, 2)
    q, k, v = [
        t(jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)))
        for _ in range(3)
    ]
    o, lse = A._flash_fwd_impl_t(q, k, v, interpret=True)
    do = t(jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)))
    g_fused = A._flash_bwd_impl_t(q, k, v, o, lse, do, interpret=True,
                                  fused=True)
    g_two = A._flash_bwd_impl_t(q, k, v, o, lse, do, interpret=True,
                                fused=False)
    for a, b, name in zip(g_fused, g_two, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name
        )


def test_bwd_block_overrides_match_default(rng):
    """Pinned (block_q, block_kv) tilings — the sweep surface of
    tools/sweep_bwd_tiling.py — must be pure performance knobs: identical
    gradients to the default chooser for every legal tiling."""
    B, H, D, N = 1, 2, 32, 512
    q, k, v, do = [
        jnp.asarray(rng.normal(size=(B, H, D, N)).astype(np.float32))
        for _ in range(4)
    ]
    o, lse = A._flash_fwd_impl_t(q, k, v, interpret=True)
    base = A._flash_bwd_impl_t(q, k, v, o, lse, do, interpret=True)
    for bq, bkv in [(128, 512), (256, 256), (512, 128)]:
        alt = A._flash_bwd_impl_t(q, k, v, o, lse, do, interpret=True,
                                  block_q=bq, block_kv=bkv)
        for a, b, name in zip(base, alt, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5,
                err_msg=f"{name} @ bq={bq} bkv={bkv}",
            )
