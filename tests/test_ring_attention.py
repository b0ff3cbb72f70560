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


def test_sequence_parallel_attention_padded(rng):
    """Non-divisible N (ViT's 1+g² tokens): padded keys must be masked out."""
    from multihmr_tpu.parallel.ring_attention import sequence_parallel_attention

    mesh = make_mesh(4, model_parallel=4, axis_names=("data", "model"))
    B, H, N, D = 2, 2, 65, 16  # 65 % 4 != 0 → pads to 68
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    with mesh:
        out = jax.jit(
            lambda q, k, v: sequence_parallel_attention(q, k, v, mesh, axis="model")
        )(q, k, v)
    ref = mha_reference(q, k, v)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sequence_parallel_attention_grad(rng):
    """The ring (ppermute + scan + masking) path must be differentiable —
    it sits inside the ViT during sequence-parallel training."""
    from multihmr_tpu.parallel.ring_attention import sequence_parallel_attention

    mesh = make_mesh(4, model_parallel=4, axis_names=("data", "model"))
    B, H, N, D = 1, 2, 13, 8
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]

    def f_ring(q, k, v):
        with mesh:
            return jnp.sum(sequence_parallel_attention(q, k, v, mesh, axis="model") ** 2)

    def f_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    g_ring = jax.grad(f_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_mesh_attention_dispatch(rng):
    """mesh_attention: trivial mesh → single-device; model>1 → sharded paths."""
    from multihmr_tpu.parallel.ring_attention import mesh_attention

    B, H, N, D = 4, 4, 17, 8
    q, k, v = [
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    ]
    ref = mha_reference(q, k, v)
    # no mesh
    np.testing.assert_allclose(
        np.asarray(mesh_attention(q, k, v, None)), np.asarray(ref), atol=2e-5
    )
    # trivial model axis → single-device path
    mesh1 = make_mesh(8, model_parallel=1)
    np.testing.assert_allclose(
        np.asarray(mesh_attention(q, k, v, mesh1)), np.asarray(ref), atol=2e-5
    )
    # DP×TP: batch over data(4), heads over model(2)
    mesh = make_mesh(8, model_parallel=2)
    with mesh:
        out_h = jax.jit(lambda q, k, v: mesh_attention(q, k, v, mesh, mode="heads"))(q, k, v)
        out_r = jax.jit(lambda q, k, v: mesh_attention(q, k, v, mesh, mode="ring"))(q, k, v)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref), atol=2e-5)
