"""Custom-VJP correctness: gradients of the flash wrapper must match
jax.grad through plain attention."""

import numpy as np
import jax
import jax.numpy as jnp

from multihmr_tpu.ops import attention as A


def test_flash_vjp_matches_reference_grad(rng, monkeypatch):
    # route the wrapper's forward through the interpretable kernel on CPU
    orig = A.flash_attention
    monkeypatch.setattr(
        A, "flash_attention",
        lambda q, k, v, scale=None, **kw: orig(
            q, k, v, scale=scale, block_q=128, block_kv=128, interpret=True
        ),
    )
    B, H, N, D = 1, 2, 160, 32
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)) for _ in range(3)
    ]

    def loss_flash(q, k, v):
        return jnp.sum(jnp.tanh(A.flash_attention_trainable(q, k, v, None)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(A.mha_reference(q, k, v)))

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
