"""Fused channels-major LayerNorm: Pallas kernel (interpret mode) vs the
unfused fp32-stats reference, forward and gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihmr_tpu.ops import norm as N


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("n", [256, 333])
def test_pallas_ln_matches_reference(rng, n):
    x = jnp.asarray(rng.normal(size=(2, 64, n)) * 3 + 1, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    got = N._ln_fwd_pallas(x, scale, bias, 1e-6, jnp.float32, interpret=True)
    want = N._ln_reference(x, scale, bias, 1e-6, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_pallas_ln_bf16_output(rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 128)), jnp.bfloat16)
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)
    got = N._ln_fwd_pallas(x, scale, bias, 1e-6, jnp.bfloat16, interpret=True)
    want = N._ln_reference(x, scale, bias, 1e-6, jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_ln_custom_vjp_matches_autodiff(rng):
    x = jnp.asarray(rng.normal(size=(2, 48, 160)), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.normal(size=(48,)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.normal(size=(48,)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(2, 48, 160)), jnp.float32)

    def f_ref(x, s, b):
        return jnp.vdot(N._ln_reference(x, s, b, 1e-6, jnp.float32), ct)

    def f_fused(x, s, b):
        return jnp.vdot(N.layernorm_cm(x, s, b, 1e-6, jnp.float32), ct)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-5)
