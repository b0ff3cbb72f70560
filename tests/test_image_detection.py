"""Image reshapes, bicubic interpolation, and static-shape detection."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from multihmr_tpu.ops import (
    normalize_rgb,
    denormalize_rgb,
    unpatch,
    tokens_to_grid,
    clamped_sigmoid,
    nms_maxpool,
    topk_detect,
    gather_grid,
    scatter_add_grid,
    get_2d_sincos_pos_embed,
    bicubic_resize_2d,
)
from multihmr_tpu.ops.posenc import interpolate_dinov2_pos_embed


def test_normalize_roundtrip(rng):
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    norm = np.asarray(normalize_rgb(jnp.asarray(img)))
    assert norm.shape == (3, 32, 32)
    back = denormalize_rgb(norm)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


def test_unpatch_matches_torch_einsum(rng):
    # reference utils/image.py:39-52 semantics with patch_size=1
    B, h, D = 2, 6, 5
    z = rng.normal(size=(B, h * h, D)).astype(np.float32)
    ours = np.asarray(unpatch(jnp.asarray(z), patch_size=1, c=D, img_size=h))
    zt = torch.from_numpy(z).reshape(B, h, h, 1, 1, D)
    ref = torch.einsum("nhwpqc->nchpwq", zt).reshape(B, D, h, h).numpy()
    np.testing.assert_allclose(ours, ref)
    # channels-last grid is a plain reshape of tokens
    grid = np.asarray(tokens_to_grid(jnp.asarray(z), h))
    np.testing.assert_allclose(grid, ref.transpose(0, 2, 3, 1))


def test_bicubic_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 37, 37)).astype(np.float32)
    for out, scale in [(48, None), (64, None), (24, None)]:
        ours = bicubic_resize_2d(x, out, out, scale, scale).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x), size=(out, out), mode="bicubic", align_corners=False
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
    # DINOv2-style explicit scale factor with +0.1 offset
    s = (48 + 0.1) / 37
    ours = bicubic_resize_2d(x, 48, 48, s, s).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), scale_factor=(s, s), mode="bicubic", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_interpolate_dinov2_pos_embed_shapes():
    pe = np.random.default_rng(2).normal(size=(1, 1 + 37 * 37, 16)).astype(np.float32)
    out = interpolate_dinov2_pos_embed(pe, 48)
    assert out.shape == (1, 1 + 48 * 48, 16)
    same = interpolate_dinov2_pos_embed(pe, 37)
    np.testing.assert_allclose(same, pe)


def test_2d_sincos_pos_embed_matches_reference_math():
    # independent check of structure: D/2 from h, D/2 from w; sin|cos halves
    emb = get_2d_sincos_pos_embed(8, 4)
    assert emb.shape == (16, 8)
    # position (0,0) has sin=0, cos=1 in every band
    np.testing.assert_allclose(emb[0], [0, 0, 1, 1, 0, 0, 1, 1])


def test_clamped_sigmoid():
    x = jnp.asarray([-100.0, 0.0, 100.0])
    y = np.asarray(clamped_sigmoid(x))
    np.testing.assert_allclose(y, [1e-4, 0.5, 1 - 1e-4], rtol=1e-6)


def test_nms_matches_torch_maxpool(rng):
    heat = rng.uniform(size=(2, 13, 13)).astype(np.float32)
    for kernel in [2, 3, 4, 5]:
        ours = np.asarray(nms_maxpool(jnp.asarray(heat), kernel))
        pad = (kernel - 1) // 2 if kernel not in (2, 4) else (1 if kernel == 2 else 2)
        hmax = F.max_pool2d(torch.from_numpy(heat)[:, None], kernel, stride=1, padding=pad)
        hmax = hmax[:, :, : 13, : 13]
        ref = (heat * (hmax[:, 0].numpy() == heat)).astype(np.float32)
        np.testing.assert_allclose(ours, ref)


def test_topk_detect_matches_torch_where(rng):
    scores = rng.uniform(size=(3, 8, 8)).astype(np.float32)
    thresh, K = 0.9, 16
    det = topk_detect(jnp.asarray(scores), thresh, K)
    for b in range(3):
        r_ref, c_ref = np.where(scores[b] >= thresh)  # row-major like torch.where
        n = len(r_ref)
        assert int(det.count[b]) == n
        np.testing.assert_array_equal(np.asarray(det.rows[b])[:n], r_ref)
        np.testing.assert_array_equal(np.asarray(det.cols[b])[:n], c_ref)
        np.testing.assert_allclose(
            np.asarray(det.scores[b])[:n], scores[b][r_ref, c_ref], rtol=1e-6
        )
        assert np.all(np.asarray(det.valid[b])[n:] == 0)


def test_topk_detect_capacity_overflow(rng):
    scores = np.full((1, 4, 4), 0.9, dtype=np.float32)
    det = topk_detect(jnp.asarray(scores), 0.5, 5)
    assert int(det.count[0]) == 5  # capped at capacity, no crash


def test_gather_scatter_grid(rng):
    B, H, W, D = 2, 6, 6, 3
    x = rng.normal(size=(B, H, W, D)).astype(np.float32)
    scores = np.zeros((B, H, W), dtype=np.float32)
    scores[0, 1, 2] = scores[0, 3, 4] = scores[1, 0, 5] = 0.9
    det = topk_detect(jnp.asarray(scores), 0.5, 4)
    g = np.asarray(gather_grid(jnp.asarray(x), det))
    np.testing.assert_allclose(g[0, 0], x[0, 1, 2])
    np.testing.assert_allclose(g[0, 1], x[0, 3, 4])
    np.testing.assert_allclose(g[1, 0], x[1, 0, 5])
    np.testing.assert_allclose(g[0, 2:], 0)

    vals = rng.normal(size=(B, 4, D)).astype(np.float32)
    y = np.asarray(scatter_add_grid(jnp.asarray(x), det, jnp.asarray(vals)))
    np.testing.assert_allclose(y[0, 1, 2], x[0, 1, 2] + vals[0, 0], rtol=1e-6)
    np.testing.assert_allclose(y[0, 0, 0], x[0, 0, 0])  # invalid slots don't write
