"""Flash attention kernel vs plain attention (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihmr_tpu.ops.attention import flash_attention, mha_reference, _pick_block


def test_pick_block():
    assert _pick_block(2304, 512) in (256, 384, 512 - 512 % 128 or 512)
    assert 2304 % _pick_block(2304, 512) == 0
    assert _pick_block(4096, 512) == 512
    assert _pick_block(4224, 512) in (384, 512)
    assert 4224 % _pick_block(4224, 512) == 0
    assert _pick_block(128, 512) == 128


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
