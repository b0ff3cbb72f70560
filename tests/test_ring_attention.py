"""Ring attention on the virtual 8-device mesh vs single-device attention."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multihmr_tpu.parallel import make_mesh
from multihmr_tpu.parallel.ring_attention import ring_attention
from multihmr_tpu.ops.attention import mha_reference


def test_ring_attention_matches_reference(rng):
    mesh = make_mesh(8, model_parallel=8, axis_names=("data", "model"))
    B, H, N, D = 1, 2, 64, 16  # N divisible by 8 shards
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    spec = NamedSharding(mesh, P(None, None, "model", None))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))
    with mesh:
        out = ring_attention(qs, ks, vs, mesh, axis="model")
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_under_jit(rng):
    mesh = make_mesh(4, model_parallel=4, axis_names=("data", "model"))
    B, H, N, D = 2, 1, 32, 8
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    with mesh:
        f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, axis="model"))
        out = f(q, k, v)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_head_parallel_attention_matches(rng):
    from multihmr_tpu.parallel.ring_attention import head_parallel_attention

    mesh = make_mesh(8, model_parallel=4, axis_names=("data", "model"))
    B, H, N, D = 1, 8, 24, 16  # 8 heads over 4 shards
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    with mesh:
        out = head_parallel_attention(q, k, v, mesh, axis="model")
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
