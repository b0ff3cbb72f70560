"""Transposed-stream ViT ([B, D, N] channels-major blocks) equivalence.

The transposed stream is a pure LAYOUT change: identical parameter tree,
identical math up to fp reassociation. These tests pin that equivalence —
outputs must match the standard stream on the same params.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multihmr_tpu.config import ViTConfig
from multihmr_tpu.models.vit import DINOv2ViT


def _mk(transposed, dtype=jnp.float32):
    cfg = ViTConfig(embed_dim=64, depth=2, num_heads=4)
    return DINOv2ViT(
        cfg, grid_size=4, dtype=dtype, transposed_stream=transposed
    )


def test_transposed_stream_matches_standard():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    std = _mk(False)
    tps = _mk(True)
    params = std.init(jax.random.PRNGKey(0), x)
    # identical parameter trees: the T* modules reuse flax names/shapes
    p2 = tps.init(jax.random.PRNGKey(0), x)
    s1 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), params)
    s2 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p2)
    assert s1 == s2
    out_s = std.apply(params, x)
    out_t = tps.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_t["patch_tokens"]),
        np.asarray(out_s["patch_tokens"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_t["cls_token"]), np.asarray(out_s["cls_token"]), atol=1e-4
    )


def test_transposed_stream_grads_flow():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
    tps = _mk(True)
    params = tps.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(tps.apply(p, x)["patch_tokens"] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_prepadded_stream_matches_standard():
    """grid 35 → 1226 tokens → kernel length 1280 (4.4% ≤ the 5% gate): the
    transposed stream runs PRE-PADDED with junk pad tokens and kv_len
    masking — outputs for the real tokens must still match the standard
    stream exactly (same masked-softmax math)."""
    from multihmr_tpu.ops.attention import transposed_padded_len

    assert transposed_padded_len(35 * 35 + 1) == 1280  # the gate fires
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 490, 490, 3)).astype(np.float32))
    cfg = ViTConfig(embed_dim=32, depth=2, num_heads=2)
    std = DINOv2ViT(cfg, grid_size=35, dtype=jnp.float32, transposed_stream=False)
    tps = DINOv2ViT(cfg, grid_size=35, dtype=jnp.float32, transposed_stream=True)
    params = std.init(jax.random.PRNGKey(0), x)
    out_s = std.apply(params, x)
    out_t = tps.apply(params, x)
    assert out_t["patch_tokens"].shape == out_s["patch_tokens"].shape
    np.testing.assert_allclose(
        np.asarray(out_t["patch_tokens"]),
        np.asarray(out_s["patch_tokens"]), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_t["cls_token"]), np.asarray(out_s["cls_token"]),
        atol=2e-4,
    )


def test_prepadded_stream_grads_match_standard():
    """Weight gradients through the pre-padded stream must equal the
    standard stream's: junk pad tokens must contribute EXACTLY zero (the
    attention backward masks kv junk; everything else is per-token)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 490, 490, 3)).astype(np.float32))
    cfg = ViTConfig(embed_dim=32, depth=2, num_heads=2)
    std = DINOv2ViT(cfg, grid_size=35, dtype=jnp.float32, transposed_stream=False)
    tps = DINOv2ViT(cfg, grid_size=35, dtype=jnp.float32, transposed_stream=True)
    params = std.init(jax.random.PRNGKey(0), x)

    def loss(model):
        return lambda p: jnp.sum(jnp.sin(model.apply(p, x)["patch_tokens"]))

    g_s = jax.grad(loss(std))(params)
    g_t = jax.grad(loss(tps))(params)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_s)
    flat_t, _ = jax.tree_util.tree_flatten_with_path(g_t)
    for (path, a), (_, b) in zip(flat_s, flat_t):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_remat_policies_grads_match():
    """remat is a pure scheduling choice: grads under remat_policy='block'
    (whole-block recompute) and 'mlp' (fc1-hidden-only recompute; the
    backward never re-runs the attention forward) must equal no-remat
    grads. Covers both stream layouts; an unknown policy must raise."""
    import pytest

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    cfg = ViTConfig(embed_dim=64, depth=2, num_heads=4)

    for transposed in (False, True):
        def grads(remat, policy):
            vit = DINOv2ViT(
                cfg, grid_size=4, dtype=jnp.float32,
                transposed_stream=transposed, remat=remat, remat_policy=policy,
            )
            p = vit.init(jax.random.PRNGKey(0), x)
            loss = lambda p: jnp.sum(vit.apply(p, x)["patch_tokens"] ** 2)
            return jax.jit(jax.grad(loss))(p)

        g0 = jax.tree_util.tree_leaves(grads(False, "block"))
        for policy in ("block", "mlp"):
            g = jax.tree_util.tree_leaves(grads(True, policy))
            for a, b in zip(g0, g):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-10,
                    err_msg=f"{policy} transposed={transposed}",
                )

    vit = DINOv2ViT(cfg, grid_size=4, remat=True, remat_policy="typo")
    with pytest.raises(ValueError, match="remat_policy"):
        vit.init(jax.random.PRNGKey(0), x)
